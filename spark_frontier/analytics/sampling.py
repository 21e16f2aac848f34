"""Deterministic corpus sampling / mixing (training-data ops).

A pretraining pipeline's last step before tokenization is the data mix:
per-source (or per-language/quality-bucket) quotas and global sampling
rates, applied REPRODUCIBLY so a rerun — or a different engine — selects
the identical rows. Spark's ``df.sample`` is seed-dependent on
partitioning and not replayable in SQL, so both operators here derive
selection purely from an md5 hash of the row id (DuckDB-replayable via
``dedup.md5_hash60`` semantics):

- ``hash_sample``    rate-based Bernoulli-by-hash — a pure filter, no
                     shuffle, no sort; the 100 TB path for fractional
                     sampling.
- ``stratified_mix`` per-group quotas in hash order — one shuffle on the
                     group key; the "take n_k docs of source k" mixing
                     step. Groups are independent, so skew is bounded by
                     the largest group; for rate quotas prefer
                     ``hash_sample`` per group (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_frontier.analytics.dedup import md5_hash60

HASH_SPACE = 1 << 60  # md5_hash60 is a uniform 60-bit value


def _id_hash(id_col: str) -> F.Column:
    """md5-60 of the stringified id — matches DuckDB
    CAST('0x'||substr(md5(CAST(id AS VARCHAR)),1,15) AS BIGINT)."""
    return md5_hash60(F.col(id_col).cast("string").cast("binary"))


def hash_sample(
    docs: DataFrame, frac: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep rows whose 60-bit id hash lands below ``frac`` of the hash
    space. Exactly reproducible across runs, partitionings, and engines;
    composes with itself (sampling at f1 then f2 == sampling at
    min(f1, f2), since the same hash is compared both times)."""
    return docs.filter(_id_hash(id_col) < int(frac * HASH_SPACE))


def stratified_mix(
    docs: DataFrame, quotas: dict[str, int], group_col: str = "source",
    default_quota: int = 0, id_col: str = "doc_id",
) -> DataFrame:
    """Per-group quota sampling in deterministic hash order: rank rows
    within each group by md5(id) — a reproducible shuffle — and keep the
    first ``quotas[group]`` (groups absent from the dict get
    ``default_quota``). The quota map is inlined as a literal, so the
    whole operator is one window over a single group-key shuffle."""
    lut = []
    for k, v in sorted(quotas.items()):
        lut += [F.lit(k), F.lit(int(v))]
    quota = F.coalesce(
        F.element_at(F.create_map(*lut), F.col(group_col)),
        F.lit(int(default_quota)),
    )
    w = Window.partitionBy(group_col).orderBy(_id_hash(id_col), F.col(id_col))
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )
