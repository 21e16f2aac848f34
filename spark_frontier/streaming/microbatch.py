"""Structured Streaming crawl path (T8/T9, SURVEY.md §2.4).

Reference: the crawler re-runs every 10 minutes via APScheduler
(/root/reference/src/scheduler/crawl_scheduler.py:57-76) with per-site
``last_crawl_at`` watermarks (repository.py:173-181) dropping already-seen
time ranges.

Spark shape: frontier *candidates* (parsed sitemap url-rows) arrive as a
file stream; each micro-batch runs the dedup → politeness → fetch →
validate → MERGE tail through ``foreachBatch`` (sinks are MERGE-shaped, so
foreachBatch is the correct sink primitive — streaming MERGE is exactly
this pattern on Iceberg too). The watermark on ``lastmod`` drops late
entries older than the configured lateness bound, mirroring F2's cutoff
semantics in event time.

Triggers:
- ``availableNow=True``  → drain-what-exists (tests, catch-up runs)
- ``processingTime='10 minutes'`` → the reference's cycle cadence, live

Spark's checkpointLocation gives exactly-once *source* progress; the sink
is idempotent anyway (MERGE on url_key), so a crash between source
checkpoint and table commit re-processes at most one micro-batch with
identical results — same story as the batch waves.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_frontier.frontier.priority import build_candidates
from spark_frontier.functions.bloom import dedup_unseen
from spark_frontier.pipeline.crawl import (
    build_link_rows,
    fetch_and_validate,
)
from spark_frontier.politeness.backoff import (
    blocked_hosts,
    empty_host_state,
    update_host_state,
)
from spark_frontier.politeness.ratelimit import assign_deadlines
from spark_frontier.storage import SnapStore

# the parsed-entry schema as it lands in the candidate stream directory
CANDIDATE_DDL = (
    "sitemap_url string, loc string, lastmod timestamp, changefreq string, "
    "priority double, news_title string, news_publication_date timestamp, "
    "news_publication_name string, sitemap_pos long, parse_mode string, "
    "site_id string, site_seq int, depth int, path array<long>"
)


def start_stream_crawl(
    spark: SparkSession,
    candidates_dir: str,
    world: dict[str, DataFrame],
    store: SnapStore,
    checkpoint_dir: str,
    batch_ts: datetime,
    lateness: str = "7 days",
    max_per_host: int = 64,
    available_now: bool = True,
    trigger_interval: str = "10 minutes",
):
    """Start the streaming crawl; returns the StreamingQuery."""
    src = (
        spark.readStream.schema(CANDIDATE_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(candidates_dir)
        .withWatermark("lastmod", lateness)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        candidates = build_candidates(batch_df)
        links_tbl = store.table("links")
        seen = links_tbl.read(spark)
        if seen is None:
            seen = spark.createDataFrame([], "url_key long")
        unseen = dedup_unseen(candidates, seen.select("url_key"))
        host_tbl = store.table("host_state")
        hs = host_tbl.read(spark) or empty_host_state(spark)
        unseen = unseen.join(
            F.broadcast(blocked_hosts(hs)), on="host", how="left_anti"
        )
        wave = assign_deadlines(unseen, hs, batch_ts, max_per_host=max_per_host)
        validated = fetch_and_validate(wave, world, batch_ts).localCheckpoint(
            eager=True
        )
        n = validated.count()
        if n == 0:
            return
        link_rows = build_link_rows(validated, batch_ts)
        links_tbl.merge(
            link_rows.filter(F.col("is_valid")),
            ["url_key"],
            summary={"op": "stream_batch", "batch_id": int(batch_id), "rows": n},
        )
        host_tbl.overwrite(
            update_host_state(
                hs, validated.select("host", "politeness_deadline", "http_code"),
                batch_ts,
            ),
            summary={"op": "host_state_stream", "batch_id": int(batch_id)},
        )

    writer = (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
