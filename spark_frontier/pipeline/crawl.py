"""The crawl cycle: EP1 (SURVEY.md §3) as one Spark batch pipeline.

One cycle ≅ one reference ``run_global_crawl_cycle``
(/root/reference/src/scheduler/crawl_scheduler.py:78-225):

    sites → sitemap BFS expansion → recency filter → candidate build
    (canonicalize/hash/reject-filter) → URL-seen dedup (bloom + exact
    anti-join) → blocked-host gate → robots gate → politeness deadlines →
    wave selection → fetch (join) → payload validation → MERGE links,
    MERGE host state, append crawl log, bump sites.last_crawl_at

State lives in a SnapStore (Iceberg in production): ``links`` (the seen
store + payload, reference article_links), ``host_state``, ``bloom``,
``crawl_logs``, ``sites``. Every commit carries funnel counters in its
snapshot summary (diagnose_pipeline.py:38-53 parity), which is the
north_rule's per-batch lineage.

RESUMABILITY: a cycle processes the frontier in WAVES (max_per_host per
host per wave). Each wave ends in atomic commits; a kill between commits
loses at most one uncommitted wave, and re-running the cycle is idempotent
because dedup anti-joins the committed seen-store and MERGE upserts on
url_key. ``test_pipeline_resume.py`` kills after wave 1 and proves the
final links table equals the uninterrupted run's.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_frontier.frontier.priority import build_candidates, salted_repartition
from spark_frontier.frontier.recency import filter_recent
from spark_frontier.fetch.fetcher import attach_payload, hermetic_fetch
from spark_frontier.functions.bloom import build_bloom_segments, dedup_unseen
from spark_frontier.payload.validate import validate_images
from spark_frontier.politeness.backoff import (
    blocked_hosts,
    empty_host_state,
    update_host_state,
)
from spark_frontier.politeness.ratelimit import assign_deadlines, select_batch
from spark_frontier.politeness.robots import build_rules_df, robots_allowed
from spark_frontier.sitemap.expand import expand_sitemap_tree
from spark_frontier.storage import SnapStore

LINK_COLUMNS = [
    "site_id", "url", "canon_url", "url_key", "url_hash", "host", "image_id",
    "caption", "title", "sport_category", "lastmod", "published_at",
    "http_code", "is_valid", "invalid_reason", "psnr_db", "first_seen_at",
]


@dataclass
class CycleReport:
    """Funnel counters — diagnose_pipeline.py:38-53 stage parity."""
    sitemap_entries_total: int = 0
    entries_within_days: int = 0
    new_urls_found: int = 0
    robots_denied: int = 0
    scheduled: int = 0
    fetched: int = 0
    fetch_failed: int = 0
    validation_failed: int = 0
    saved: int = 0
    waves: int = 0
    extra: dict = field(default_factory=dict)

    def as_dict(self) -> dict:
        d = {k: v for k, v in self.__dict__.items() if k != "extra"}
        d.update(self.extra)
        return d


def load_world(spark: SparkSession, world_dir: str) -> dict[str, DataFrame]:
    import os

    out = {}
    for name in ["sites", "images", "sitemap_pages", "web_pages", "robots_docs",
                 "url_seen"]:
        p = os.path.join(world_dir, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = spark.read.parquet(p)
    return out


def seed_seen_store(store: SnapStore, url_seen: DataFrame) -> None:
    """Initialize the links table from a pre-existing seen list (fixture
    F6). Computes engine keys from raw urls."""
    from spark_frontier.functions.urls import canonicalize_url, url_key_canonical

    links = store.table("links")
    if links.exists():
        return
    seeded = (
        url_seen.withColumn("canon_url", canonicalize_url(F.col("url")))
        .withColumn("url_key", url_key_canonical(F.col("canon_url")))
        .withColumn("site_id", F.lit(None).cast("string"))
        .withColumn("image_id", F.lit(None).cast("string"))
        .withColumn("caption", F.lit(None).cast("string"))
        .withColumn("title", F.lit(None).cast("string"))
        .withColumn("sport_category", F.lit(None).cast("string"))
        .withColumn("lastmod", F.lit(None).cast("timestamp"))
        .withColumn("published_at", F.lit(None).cast("timestamp"))
        .withColumn("http_code", F.lit(None).cast("int"))
        .withColumn("is_valid", F.lit(None).cast("boolean"))
        .withColumn("invalid_reason", F.lit(None).cast("string"))
        .withColumn("psnr_db", F.lit(None).cast("double"))
        .select(*LINK_COLUMNS)
    )
    links.overwrite(seeded, summary={"op": "seed_seen"})


def fetch_and_validate(
    wave_batch: DataFrame,
    world: dict[str, DataFrame],
    batch_ts: datetime,
    salt_buckets: int = 4,
) -> DataFrame:
    """Salted fetch + late payload join + image/caption validation — the
    UDF-heavy tail shared by the batch cycle and the streaming path."""
    to_fetch = salted_repartition(wave_batch, salt_buckets)
    fetched = hermetic_fetch(to_fetch, world["web_pages"], batch_ts)
    with_payload = attach_payload(fetched, world["images"])
    return (
        with_payload.withColumn(
            "_v",
            validate_images(
                F.col("image_id"), F.col("bytes"), F.col("w"), F.col("h"),
                F.col("fmt"), F.col("caption"), F.col("ref_caption"),
            ),
        )
        .select(
            "*",
            F.col("_v")["is_valid"].alias("is_valid"),
            F.col("_v")["reason"].alias("invalid_reason"),
            F.col("_v")["psnr_db"].alias("psnr_db"),
        )
        # payload columns end at validation: carrying `bytes` into the
        # post-validate checkpoint would materialize ~GBs for nothing
        .drop("_v", "bytes", "ref_caption", "phash", "w", "h", "fmt")
    )


def build_link_rows(
    validated: DataFrame, batch_ts: datetime, sites: DataFrame | None = None
) -> DataFrame:
    """Link rows for the sink, incl. V6-V9 categorization (the reference
    categorizes every saved article, crawl_scheduler.py:276-294): broadcast
    site_type/sport_focus from sites, then the all-JVM precedence chain
    (forced focus ≻ URL segment ≻ URL pattern ≻ caption score ≻ 'sports')."""
    from spark_frontier.extract.category import with_category

    rows = validated.withColumn("title", F.col("news_title")).withColumn(
        "published_at",
        F.coalesce(F.col("news_publication_date"), F.col("lastmod")),
    )
    if sites is not None:
        rows = rows.join(
            F.broadcast(sites.select("site_id", "site_type", "sport_focus")),
            on="site_id",
            how="left",
        )
    else:
        rows = rows.withColumn(
            "site_type", F.lit(None).cast("string")
        ).withColumn("sport_focus", F.lit(None).cast("string"))
    rows = with_category(
        rows, url="url", title="title", content="caption",
        site_type="site_type", sport_focus="sport_focus",
        out="sport_category",
    )
    return (
        rows.withColumn("first_seen_at", F.lit(batch_ts))
        .withColumn("is_valid", F.coalesce(F.col("is_valid"), F.lit(False)))
        .select(*LINK_COLUMNS)
    )


def run_crawl_cycle(
    spark: SparkSession,
    world: dict[str, DataFrame],
    store: SnapStore,
    batch_ts: datetime,
    days: int = 7,
    max_per_host: int = 64,
    max_waves: int = 100,
    use_bloom: bool = True,
    bloom_segments: int = 16,
    stop_after_wave: int | None = None,
    salt_buckets: int = 4,
    collect_metrics: bool = True,
    fuse_discovery: bool = False,
    bloom_probe: str = "broadcast",
) -> CycleReport:
    """Run one crawl cycle to frontier exhaustion (or stop_after_wave, for
    the resume test). Returns funnel counters.

    ``bloom_probe``: 'broadcast' (default; right while total bitmap size
    fits executor memory) or 'distributed' (cogroup probe, no driver
    collect — the 10^10-key path)."""
    import os as _os
    import time as _time

    _trace = bool(_os.environ.get("SPARK_FRONTIER_TRACE"))
    _t0 = [_time.time()]

    def _tr(tag: str) -> None:
        if _trace:
            now = _time.time()
            print(f"[trace] {tag}: {now - _t0[0]:.2f}s", flush=True)
            _t0[0] = now

    # Track block-manager state: localCheckpoint blocks from THIS cycle are
    # dead weight once the cycle's results are committed to the store, but
    # the ContextCleaner only reclaims them after a (lazy) py4j GC round —
    # a following cycle would otherwise run under needless memory pressure.
    _pre_rdds = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    report = CycleReport()
    try:
        return _run_cycle_inner(
            spark, world, store, batch_ts, days, max_per_host, max_waves,
            use_bloom, bloom_segments, stop_after_wave, salt_buckets,
            collect_metrics, fuse_discovery, bloom_probe, report, _tr,
        )
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            if rid not in _pre_rdds:
                jmap.get(rid).unpersist(False)


def _run_cycle_inner(
    spark, world, store, batch_ts, days, max_per_host, max_waves, use_bloom,
    bloom_segments, stop_after_wave, salt_buckets, collect_metrics,
    fuse_discovery, bloom_probe, report, _tr,
) -> CycleReport:
    sites = world["sites"].filter(F.col("is_active")).orderBy("site_seq")
    seeds = sites.select("site_id", "site_seq", "sitemap_url")

    # --- discovery: sitemap BFS + recency + candidate build -------------
    # expand already localCheckpoints each BFS level; counts on the
    # checkpointed levels are near-free.
    entries = expand_sitemap_tree(seeds, world["sitemap_pages"])
    _tr("expand")

    recent = filter_recent(entries, sites, days=days, now=batch_ts)

    # --- robots gate (broadcast join; zero frontier shuffles) ------------
    robots_rows = [
        (r["host"], r["content"]) for r in world["robots_docs"].collect()
    ] if "robots_docs" in world else []
    rules = build_rules_df(spark, robots_rows)
    with_robots = robots_allowed(build_candidates(recent), rules)
    candidates = with_robots.filter(F.col("robots_allowed"))
    if fuse_discovery:
        # single-wave drain mode (bench): keep discovery LAZY so canonical-
        # ize/robots/recency fuse into the wave job — one pipeline, no
        # materialization barrier. Wave ≥ 2 checkpoints on entry instead.
        candidates_ckpt = False
    else:
        candidates = candidates.localCheckpoint(eager=True)
        candidates_ckpt = True
        report.entries_within_days = candidates.count()
    if collect_metrics:
        report.sitemap_entries_total = entries.count()
        report.robots_denied = with_robots.filter(
            ~F.col("robots_allowed")
        ).count()

    links_tbl = store.table("links")
    host_tbl = store.table("host_state")
    bloom_tbl = store.table("bloom")
    logs_tbl = store.table("crawl_logs")

    # SNAPSHOT-ISOLATED seen set: read ONCE at cycle start (the SnapTable
    # file list is immutable per snapshot). In-cycle additions are covered
    # by the `attempted` set, so the bloom built here stays valid for the
    # whole cycle — no per-wave rebuild.
    #
    # EXACTNESS INVARIANT: bloom ⊇ links keys at all times — a bloom miss
    # bypasses the exact anti-join, so a missing seen key would leak a
    # duplicate into the append-only links table. Enforced by (a) committing
    # each wave's bloom delta BEFORE appending its links rows, and (b)
    # rebuilding from the full seen set whenever segments are absent or
    # outgrown (capacity check below; extra bloom keys are harmless).
    seen = links_tbl.read(spark)
    segments = None
    bloom_m_bits = None
    if seen is None:
        seen = spark.createDataFrame([], "url_key long")
    elif use_bloom:
        segments = bloom_tbl.read(spark)
        if segments is not None:
            cap = segments.agg(
                F.sum("m_bits").alias("mb"), F.sum("n_items").alias("n"),
                F.count_distinct("m_bits").alias("sizes"),
            ).collect()[0]
            if (cap["n"] and cap["n"] * 14 > cap["mb"]) or cap["sizes"] != 1:
                segments = None  # outgrown/non-uniform → full rebuild
        if segments is None:
            # UNIFORM m_bits across segments (2× headroom over the current
            # seen count) so per-wave delta segments can be OR-merged
            import math as _math

            n_seen = seen.count()
            per_seg = max(n_seen // bloom_segments, 1)
            uniform_bits = max(64, 1 << _math.ceil(_math.log2(per_seg * 14 * 2)))
            segments = build_bloom_segments(
                seen.select("url_key"), n_segments=bloom_segments,
                m_bits=uniform_bits,
            ).localCheckpoint(eager=True)
            bloom_tbl.overwrite(segments, summary={"op": "bloom_build"},
                                small=True)
            segments = bloom_tbl.read(spark)
        bloom_m_bits = segments.agg(F.max("m_bits")).collect()[0][0]
    _tr("bloom_init")

    # In-cycle attempted set: the reference iterates its new-URL list ONCE
    # per cycle (crawl_scheduler.py:232-241) — failures are not retried
    # until re-discovered next cycle. Only VALID articles enter the seen
    # store (save_article_link runs after validation, :288-311).
    attempted = spark.createDataFrame([], "url_key long")

    from pyspark.sql import Observation

    wave = 0
    while wave < max_waves:
        wave += 1
        if wave == 2 and not candidates_ckpt:
            candidates = candidates.localCheckpoint(eager=True)
            candidates_ckpt = True
        unseen = dedup_unseen(
            candidates, seen.select("url_key"), segments=segments,
            n_segments=bloom_segments, probe=bloom_probe,
        ).join(attempted, on="url_key", how="left_anti")

        # --- blocked-host gate (F10) -------------------------------------
        hs = host_tbl.read(spark)
        if hs is None:
            hs = empty_host_state(spark)
        obs_unseen = Observation(f"unseen_w{wave}")
        unseen = unseen.observe(obs_unseen, F.count(F.lit(1)).alias("n")).join(
            F.broadcast(blocked_hosts(hs)), on="host", how="left_anti"
        )

        # --- politeness deadlines + wave selection ----------------------
        # Drain mode: the wave IS the politeness window (≤ max_per_host per
        # host, deadlines spaced 1/refill_rate apart). A live deployment
        # would additionally select_batch(scheduled, wave_ts, trigger_s) to
        # honor wall clock; logical time keeps tests deterministic.
        scheduled = assign_deadlines(
            unseen, hs, batch_ts, max_per_host=max_per_host
        )
        wave_batch = scheduled.localCheckpoint(eager=True)
        _tr(f"wave{wave}_ckpt")
        n_wave = wave_batch.count()
        n_unseen = int(obs_unseen.get["n"])  # observed during the same job
        if wave == 1:
            report.new_urls_found = n_unseen
        if n_wave == 0:
            break
        report.scheduled += n_wave
        report.waves = wave
        attempted = attempted.unionByName(
            wave_batch.select("url_key")
        ).localCheckpoint(eager=True)

        # --- fetch (salted for hot hosts) + payload + validation --------
        obs_v = Observation(f"valid_w{wave}")
        validated = fetch_and_validate(
            wave_batch, world, batch_ts, salt_buckets
        ).observe(
            obs_v,
            F.sum(F.when(F.col("http_code") == 200, 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("valid"),
        ).localCheckpoint(eager=True)

        _tr(f"wave{wave}_validate")
        n_ok = int(obs_v.get["ok"] or 0)
        n_valid = int(obs_v.get["valid"] or 0)
        report.fetched += n_ok
        report.fetch_failed += n_wave - n_ok
        report.validation_failed += n_ok - n_valid

        # --- sinks (K1, valid only — reference parity) --------------------
        # The wave was exactly deduped against (seen ∪ attempted), so every
        # valid key here is NEW — the upsert degenerates to an APPEND (no
        # O(table) copy-on-write rewrite; Iceberg MOR equivalent).
        # Bloom delta commits FIRST: on a crash between the two commits the
        # bloom holds keys links doesn't (harmless extra probes), never the
        # reverse (which would leak duplicates past the dedup short-circuit).
        link_rows = build_link_rows(
            validated, batch_ts, sites=world["sites"]
        ).localCheckpoint(eager=True)
        valid_rows = link_rows.filter(F.col("is_valid"))
        if use_bloom and segments is not None:
            from spark_frontier.functions.bloom import merge_bloom_segments

            delta = build_bloom_segments(
                valid_rows.select("url_key"), n_segments=bloom_segments,
                m_bits=int(bloom_m_bits),
            )
            segments = merge_bloom_segments(segments, delta).localCheckpoint(
                eager=True
            )
            bloom_tbl.overwrite(
                segments, summary={"op": "bloom_delta", "wave": wave},
                small=True,
            )
        links_tbl.append(
            valid_rows,
            summary={"op": "wave", "wave": wave, "rows": n_wave,
                     "fetched_ok": n_ok, "valid": n_valid},
        )
        _tr(f"wave{wave}_merge")
        store.table("fetch_log").append(
            link_rows.select("url", "url_key", "host", "http_code", "is_valid",
                             "invalid_reason", "first_seen_at"),
            summary={"op": "fetch_lineage", "wave": wave, "rows": n_wave},
        )
        report.saved += n_valid

        new_state = update_host_state(
            hs, validated.select("host", "politeness_deadline", "http_code"),
            batch_ts,
        )
        host_tbl.overwrite(new_state, summary={"op": "host_state", "wave": wave},
                           small=True)
        _tr(f"wave{wave}_hoststate")

        if stop_after_wave is not None and wave >= stop_after_wave:
            break
        if n_wave == n_unseen:
            break  # frontier fully drained this wave — skip the empty round

    # bloom segments were delta-merged per wave (bloom-before-links order);
    # a full rebuild happens lazily at next cycle start if capacity outgrown

    # --- cycle bookkeeping: log row + last_crawl_at watermark ------------
    log_row = spark.createDataFrame(
        [
            {
                "crawl_type": "cycle",
                "status": "ok",
                "ts": batch_ts,
                **{k: int(v) for k, v in report.as_dict().items()
                   if isinstance(v, (int, float))},
            }
        ]
    )
    logs_tbl.append(log_row, summary=report.as_dict(), small=True)
    _tr("bookkeeping")

    sites_updated = world["sites"].withColumn(
        "last_crawl_at",
        F.when(F.col("is_active"), F.lit(batch_ts)).otherwise(F.col("last_crawl_at")),
    )
    store.table("sites").overwrite(sites_updated, summary={"op": "watermark"},
                                   small=True)
    return report


def retention_cleanup(store: SnapStore, spark: SparkSession,
                      now: datetime, ttl_days: int = 2) -> None:
    """T10 (repository.py:432-450): TTL the seen store. Reference quirk
    preserved: expired URLs become re-crawlable."""
    links = store.table("links")
    if links.exists():
        links.delete_where(
            f"first_seen_at < timestamp'{now.isoformat(sep=' ')}' "
            f"- INTERVAL {ttl_days} DAYS",
            spark,
            summary={"op": "retention", "ttl_days": ttl_days},
        )
        # seen-set changed → bloom must be rebuilt lazily next cycle
        bloom = store.table("bloom")
        if bloom.exists():
            bloom.overwrite(
                build_bloom_segments(
                    links.read(spark).select("url_key"), n_segments=16
                ),
                summary={"op": "bloom_rebuild_after_retention"},
            )
