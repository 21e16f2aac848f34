"""Structured Streaming crawl path (T8/T9, SURVEY.md §2.4) + K5 trigger.

Reference: the crawler re-runs every 10 minutes via APScheduler
(/root/reference/src/scheduler/crawl_scheduler.py:57-76) with per-site
``last_crawl_at`` watermarks (repository.py:173-181) dropping already-seen
time ranges, and every saved article firing a webhook / Redis queue push
(/root/reference/src/pipeline/trigger.py:29-116).

Spark shape: frontier *candidates* (parsed sitemap url-rows) arrive as a
file stream; each micro-batch runs the dedup → politeness → fetch →
validate → append tail through ``foreachBatch`` (the sinks are
table-commit-shaped, so foreachBatch is the correct sink primitive — the
same pattern drives streaming MERGE on Iceberg).

RECENCY: a ``withWatermark`` on the source would be a NO-OP here —
watermarks only drop rows at *stateful* operators, and this query is
stateless foreachBatch. F2's cutoff parity is therefore an EXPLICIT filter
inside the micro-batch (``filter_recent`` — the same operator the batch
cycle uses), against ``batch_ts - days``.

SINK INVARIANT (same as the batch cycle): each micro-batch is exactly
deduped against the committed seen set before fetching, so every valid row
is NEW and the upsert degenerates to an APPEND — no O(table) copy-on-write
MERGE per micro-batch. Crash-replay of a micro-batch re-reads the seen set
(now containing its own earlier commit) and the anti-join removes the
replayed keys: idempotent.

Triggers:
- ``availableNow=True``  → drain-what-exists (tests, catch-up runs)
- ``processingTime='10 minutes'`` → the reference's cycle cadence, live

K5: ``on_saved(saved_rows, batch_id)`` fires after each commit with the
batch's saved (valid) rows collected — the webhook / queue-push seam. The
reference POSTs per article and LPUSHes a Redis queue; a deployment drops
``requests.post`` / ``redis.lpush`` into the callback. Failures in the
hook must not poison the stream (reference logs-and-continues,
trigger.py:60-66), so exceptions are swallowed after counting.
"""

from __future__ import annotations

from datetime import datetime
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_frontier.frontier.priority import build_candidates
from spark_frontier.frontier.recency import filter_recent
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
from spark_frontier.storage.materialize import materialize

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
    days: int = 7,
    max_per_host: int = 64,
    available_now: bool = True,
    trigger_interval: str = "10 minutes",
    on_saved: Callable[[list, int], None] | None = None,
    on_saved_partition: Callable | None = None,
    use_bloom: bool = True,
):
    """Start the streaming crawl; returns the StreamingQuery.

    ``on_saved``: K5 hook — called with (saved_rows, batch_id) after each
    micro-batch commit; saved_rows is the collected list of valid link
    rows (url, url_key, sport_category, caption, published_at). Driver-side
    collect — right for reference-scale webhook batches.

    ``on_saved_partition``: the EXECUTOR-SIDE K5 variant — called once per
    partition with an iterator of the same rows, via ``foreachPartition``,
    so notifications never funnel through a driver collect (the
    training-pipeline micro-batch shape). Exceptions are swallowed per
    partition (trigger.py:60-66 parity: notification failure never fails
    the crawl). Both hooks may be set; each fires after the commit.
    """
    src = (
        spark.readStream.schema(CANDIDATE_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(candidates_dir)
    )
    sites = world["sites"]

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # F2 recency parity — EXPLICIT filter (see module docstring)
        recent = filter_recent(batch_df, sites, days=days, now=batch_ts)
        candidates = build_candidates(recent)
        # ROBOTS GATE — stream==batch parity: the reference checks robots
        # before EVERY article fetch (http_client.py:129-133) regardless of
        # entry point; round 2's streaming path skipped it entirely.
        if "robots_docs" in world:
            from spark_frontier.politeness.robots import (
                build_rules_df_distributed,
                robots_allowed,
            )

            candidates = robots_allowed(
                candidates, build_rules_df_distributed(world["robots_docs"])
            ).filter(F.col("robots_allowed"))
        links_tbl = store.table("links")
        seen = links_tbl.read(spark)
        if seen is None:
            seen = spark.createDataFrame([], "url_key long")
        # BLOOM PARITY with the batch cycle: probe committed segments when
        # their provenance matches the links HEAD (a stale bloom is only
        # skipped, never trusted — the superset invariant must hold);
        # without it every micro-batch pays an O(seen) anti-join shuffle.
        bloom_tbl = store.table("bloom")
        segments = bloom_tbl.read(spark) if use_bloom else None
        n_seg = 0
        if segments is not None:
            meta = bloom_tbl.summary()
            # the probe modulus MUST be the build modulus (a mismatch maps
            # keys to the wrong bitmap → false negatives → duplicate leak),
            # so it rides in the snapshot summary; no/old summary → skip
            if (meta.get("covers_links") != links_tbl.snapshot_id
                    or not meta.get("n_segments")):
                segments = None
            else:
                n_seg = int(meta["n_segments"])
        unseen = dedup_unseen(
            candidates, seen.select("url_key"), segments=segments,
            n_segments=n_seg or 32,
        )
        host_tbl = store.table("host_state")
        hs = host_tbl.read(spark) or empty_host_state(spark)
        unseen = unseen.join(
            F.broadcast(blocked_hosts(hs)), on="host", how="left_anti"
        )
        wave = assign_deadlines(unseen, hs, batch_ts, max_per_host=max_per_host)
        rows_full = build_link_rows(
            fetch_and_validate(wave, world, batch_ts),
            batch_ts,
            sites=sites,
            keep=["politeness_deadline"],
        ).transform(materialize)
        n = rows_full.count()
        if n == 0:
            return
        from spark_frontier.pipeline.crawl import LINK_COLUMNS

        valid_rows = rows_full.filter(F.col("is_valid")).select(*LINK_COLUMNS)
        # dedup-before-fetch ⇒ every valid key is new ⇒ APPEND, not MERGE
        links_tbl.append(
            valid_rows,
            summary={"op": "stream_batch", "batch_id": int(batch_id),
                     "rows": n},
        )
        if use_bloom:
            # keep bloom provenance current so the NEXT micro-batch probes
            # instead of paying the full O(seen) anti-join
            from spark_frontier.functions.bloom import (
                build_bloom_segments,
                merge_bloom_segments,
            )

            if segments is not None:
                m_bits = int(segments.agg(F.max("m_bits")).collect()[0][0])
                merged = merge_bloom_segments(
                    segments,
                    build_bloom_segments(
                        valid_rows.select("url_key"), n_segments=n_seg,
                        m_bits=m_bits,
                    ),
                )
            else:
                import math

                n_seg = 16
                n_seen = links_tbl.read(spark).count()
                per_seg = max(n_seen // n_seg, 1)
                m_bits = max(64, 1 << math.ceil(math.log2(per_seg * 14 * 2)))
                merged = build_bloom_segments(
                    links_tbl.read(spark).select("url_key"),
                    n_segments=n_seg, m_bits=m_bits,
                )
            bloom_tbl.overwrite(
                materialize(merged),
                summary={"op": "bloom_stream", "n_segments": n_seg,
                         "covers_links": links_tbl.snapshot_id},
                small=True,
            )
        host_tbl.overwrite(
            update_host_state(
                hs,
                rows_full.select("host", "politeness_deadline", "http_code"),
                batch_ts,
            ),
            summary={"op": "host_state_stream", "batch_id": int(batch_id)},
            small=True,
        )
        notify_cols = ["url", "url_key", "sport_category", "caption",
                       "published_at"]
        if on_saved_partition is not None:
            # executor-side push: each partition notifies directly (the
            # webhook POST / queue LPUSH happens where the data is); the
            # driver never materializes the batch
            cb = on_saved_partition

            def _push(rows_iter):
                try:
                    cb(rows_iter)
                except Exception:
                    pass  # K5 parity: never fails the crawl

            valid_rows.select(*notify_cols).foreachPartition(_push)
        if on_saved is not None:
            saved = valid_rows.select(*notify_cols).collect()
            if saved:
                try:
                    on_saved(saved, int(batch_id))
                except Exception:
                    # K5 parity: notification failure never fails the crawl
                    # (trigger.py:60-66 logs and continues)
                    pass

    writer = (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
