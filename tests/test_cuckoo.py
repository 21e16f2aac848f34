"""Segmented cuckoo filter: the deletable seen-filter alternative."""

import numpy as np
from pyspark.sql import functions as F

from spark_frontier.functions.bloom import dedup_unseen
from spark_frontier.functions.cuckoo import (
    build_cuckoo_segments,
    cuckoo_contains_udf,
    delete_cuckoo_keys,
    insert_cuckoo_keys,
)


def _keys_df(spark, keys):
    return spark.createDataFrame([(int(k),) for k in keys], "url_key long")


def test_cuckoo_no_false_negatives_and_low_fpr(spark):
    rng = np.random.default_rng(3)
    inserted = rng.choice(2**62, size=2000, replace=False).astype(np.int64)
    segs = build_cuckoo_segments(_keys_df(spark, inserted), n_segments=8)
    probe = cuckoo_contains_udf(spark, segs, 8)

    got = (
        _keys_df(spark, inserted)
        .select(probe(F.col("url_key")).alias("hit"))
        .agg(F.sum(F.col("hit").cast("int")))
        .first()[0]
    )
    assert got == 2000  # ZERO false negatives

    absent = rng.choice(2**62, size=4000, replace=False).astype(np.int64)
    absent = np.setdiff1d(absent, inserted)
    fpr = (
        _keys_df(spark, absent)
        .select(probe(F.col("url_key")).alias("hit"))
        .agg(F.avg(F.col("hit").cast("double")))
        .first()[0]
    )
    assert fpr < 0.02  # 16-bit fingerprints: FPR ~ 2*b/2^16 ≈ 0.012%


def test_cuckoo_delete_then_insert_cycle(spark):
    """Deletion removes exactly the deleted keys (survivors keep their
    zero-false-negative guarantee); a later incremental insert re-admits
    them — the TTL re-admission flow WITHOUT a rebuild."""
    keys = np.arange(1, 1201, dtype=np.int64) * 7919
    segs = build_cuckoo_segments(_keys_df(spark, keys), n_segments=4)
    expired, kept = keys[:400], keys[400:]

    after_del = delete_cuckoo_keys(
        segs, _keys_df(spark, expired), n_segments=4
    )
    probe = cuckoo_contains_udf(spark, after_del, 4)
    n_kept_hit = (
        _keys_df(spark, kept)
        .select(probe(F.col("url_key")).alias("h"))
        .agg(F.sum(F.col("h").cast("int"))).first()[0]
    )
    assert n_kept_hit == len(kept)  # survivors: NO false negatives
    n_exp_hit = (
        _keys_df(spark, expired)
        .select(probe(F.col("url_key")).alias("h"))
        .agg(F.sum(F.col("h").cast("int"))).first()[0]
    )
    assert n_exp_hit <= len(expired) * 0.02  # deleted: gone (mod FPR)

    # re-crawl re-admits: incremental insert, still no rebuild
    after_ins = insert_cuckoo_keys(
        after_del, _keys_df(spark, expired[:100]), n_segments=4
    )
    probe2 = cuckoo_contains_udf(spark, after_ins, 4)
    n_back = (
        _keys_df(spark, expired[:100])
        .select(probe2(F.col("url_key")).alias("h"))
        .agg(F.sum(F.col("h").cast("int"))).first()[0]
    )
    assert n_back == 100


def test_cuckoo_distributed_probe_exact_and_no_driver_collect(
    spark, monkeypatch
):
    """probe='distributed' with the cuckoo layout returns the exact unseen
    set WITHOUT collecting/broadcasting segment tables (round-4 VERDICT
    item 3: at 10^10 keys the cuckoo table is tens of GB — it must never
    ship whole to every executor)."""
    import spark_frontier.functions.cuckoo as cuckoo_mod
    from spark_frontier.functions.cuckoo import probe_distributed

    rng = np.random.default_rng(11)
    seen_keys = set(rng.integers(-(2**62), 2**62, size=4000).tolist())
    frontier_keys = set(rng.integers(-(2**62), 2**62, size=4000).tolist())
    frontier_keys.update(list(seen_keys)[:700])

    seen = _keys_df(spark, sorted(seen_keys))
    frontier = _keys_df(spark, sorted(frontier_keys))
    expected = sorted(frontier_keys - seen_keys)

    segs = build_cuckoo_segments(seen, n_segments=8).localCheckpoint()

    def _no_collect(*a, **k):
        raise AssertionError(
            "distributed cuckoo probe must not collect/broadcast tables"
        )

    monkeypatch.setattr(cuckoo_mod, "cuckoo_contains_udf", _no_collect)
    out = dedup_unseen(
        frontier, seen, segments=segs, n_segments=8, probe="distributed",
        distributed_prober=probe_distributed,
    )
    assert sorted(r["url_key"] for r in out.collect()) == expected


def test_cuckoo_distributed_probe_no_false_negatives(spark):
    """Every inserted key must flag _maybe_seen=True through the cogroup
    probe (a false negative would leak a duplicate URL); keys in segments
    with no table row pass through as definitely-unseen."""
    from spark_frontier.functions.cuckoo import probe_distributed

    keys = np.arange(1, 2001, dtype=np.int64) * 104729
    segs = build_cuckoo_segments(_keys_df(spark, keys), n_segments=8)
    flagged = probe_distributed(
        _keys_df(spark, keys), segs, n_segments=8
    )
    n_hit = flagged.agg(
        F.sum(F.col("_maybe_seen").cast("int"))
    ).first()[0]
    assert n_hit == len(keys)

    # a fresh key space whose segments were never built: stays False
    empty_segs = build_cuckoo_segments(
        _keys_df(spark, keys[:1]), n_segments=8
    ).filter(F.lit(False))
    f2 = probe_distributed(_keys_df(spark, keys), empty_segs, n_segments=8)
    assert f2.agg(F.sum(F.col("_maybe_seen").cast("int"))).first()[0] == 0


def test_cuckoo_probe_feeds_dedup_unseen_exactly(spark):
    """probe_fn=cuckoo in dedup_unseen returns the EXACT anti-join
    result — correctness never depends on the filter."""
    seen_keys = np.arange(100, 600, dtype=np.int64) * 31
    frontier_keys = np.arange(1, 1000, dtype=np.int64) * 31  # overlaps
    seen = _keys_df(spark, seen_keys)
    frontier = _keys_df(spark, frontier_keys).withColumn(
        "payload", F.col("url_key") % 17
    )
    segs = build_cuckoo_segments(seen, n_segments=4)
    probe = cuckoo_contains_udf(spark, segs, 4)
    got = sorted(
        r["url_key"]
        for r in dedup_unseen(
            frontier, seen, segments=segs, n_segments=4, probe_fn=probe
        ).collect()
    )
    want = sorted(
        r["url_key"]
        for r in frontier.join(seen, "url_key", "left_anti").collect()
    )
    assert got == want
