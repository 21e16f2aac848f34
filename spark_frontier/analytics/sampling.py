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


def dsir_logweights(
    docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw doc by
    how much more likely its hashed n-gram features are under a TARGET
    domain's bag-of-ngrams model than under the raw corpus's own.

    Features are word unigrams + bigrams hashed into ``n_buckets``
    buckets (the paper's hashed generative model) via the md5-60 hash a
    SQL oracle replays bit-identically. Both models use add-one
    smoothing over the bucket space; the per-doc weight is
    Σ_b count_b(doc) · (ln p_target(b) − ln p_raw(b)).

    Scale shape: both LMs aggregate to ≤ n_buckets rows (broadcast
    side); the corpus pass explodes features map-side, pre-collapses to
    (doc, bucket, count) before its one shuffle, and the scoring join is
    a broadcast. No corpus-sized state anywhere. Returns every raw doc:
    (id_col, n_feats, logweight) — callers threshold or Gumbel-sample;
    docs with zero features score 0."""
    from spark_frontier.analytics.decontam import word_ngrams
    from spark_frontier.analytics.textstats import tokens

    def buckets_of(df: DataFrame) -> DataFrame:
        toks = tokens(F.col(text_col))
        feats = F.concat(
            word_ngrams(F.col("_toks"), 1), word_ngrams(F.col("_toks"), 2)
        )
        return (
            df.select(F.col(id_col), toks.alias("_toks"))
            .select(F.col(id_col), F.explode(feats).alias("feat"))
            .select(
                F.col(id_col),
                (md5_hash60(F.col("feat")) % n_buckets).alias("bucket"),
            )
        )

    def lm_from_counts(counts: DataFrame) -> tuple[DataFrame, float]:
        """ln p(bucket) with add-one smoothing over the bucket space —
        a ≤ n_buckets-row table with the normalizer inlined."""
        total = counts.agg(F.sum("c")).first()[0] or 0
        return counts.select(
            "bucket",
            F.log((F.col("c") + 1).cast("double")
                  / F.lit(float(total + n_buckets))).alias("lp"),
        ), float(total)

    from pyspark.sql import Observation

    from spark_frontier.storage.materialize import materialize

    # ONE corpus pass: the (doc, bucket, count) table is materialized and
    # feeds BOTH the raw LM (sum over docs) and the scoring join — without
    # the cut, the raw-LM normalizer action and the final collection each
    # re-run the corpus explode. The raw normalizer Σn rides the
    # checkpoint job as an Observation (the same integer sum, one fewer
    # driver-blocking job).
    obs = Observation("dsir_raw_total")
    doc_counts = materialize(
        buckets_of(docs).groupBy(id_col, "bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).observe(obs, F.sum("n").alias("t"))
    )
    t_lm, t_total = lm_from_counts(
        buckets_of(target_docs).groupBy("bucket").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    r_counts = doc_counts.groupBy("bucket").agg(F.sum("n").alias("c"))
    try:
        r_total_i = int(obs.get["t"] or 0)
    except Exception:      # empty corpus → the metric never fires
        r_total_i = 0
    r_lm = r_counts.select(
        "bucket",
        F.log((F.col("c") + 1).cast("double")
              / F.lit(float(r_total_i + n_buckets))).alias("lp"),
    )
    r_total = float(r_total_i)
    # unseen-bucket log-probs (the smoothing floor) so the broadcast
    # tables stay sparse: missing bucket => ln(1 / (total + B))
    t_floor = -F.log(F.lit(t_total + n_buckets))
    r_floor = -F.log(F.lit(r_total + n_buckets))
    lam = (
        t_lm.withColumnRenamed("lp", "lp_t")
        .join(r_lm.withColumnRenamed("lp", "lp_r"), "bucket", "full")
        .select(
            "bucket",
            (F.coalesce("lp_t", t_floor) - F.coalesce("lp_r", r_floor))
            .alias("lam"),
        )
    )
    scored = (
        doc_counts.join(F.broadcast(lam), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("n") * F.coalesce("lam", F.lit(0.0))), 6)
            .alias("logweight"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("logweight", F.lit(0.0)).alias("logweight"),
        )
    )


def assign_splits(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic, DISJOINT train/val/test assignment: the 60-bit id
    hash lands in [0, 1); cumulative fraction thresholds partition the
    hash space, so every row gets exactly one split, reruns and other
    engines agree bit-for-bit, and growing the corpus never moves an
    existing document between splits (the property random splits lack).
    The LAST split absorbs the tail of the hash space, so rounding can
    never leave a row unassigned. Pure filter logic — no shuffle, no
    sort; composes with ``hash_sample`` (same hash, so a sampled corpus
    splits consistently with the full one)."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not fractions or any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be non-negative and non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError("fractions sum to more than 1")
    h = _id_hash(id_col)
    names = list(fractions)
    cum = 0.0
    bounds = []
    for name, frac in fractions.items():
        cum += frac
        bounds.append((name, int(cum * HASH_SPACE)))
    # CASE WHEN h < bound_1 THEN s1 WHEN h < bound_2 THEN s2 ... — the
    # first (lowest) matching threshold wins; the otherwise-branch makes
    # the last split the tail absorber
    chain = None
    for name, bound in bounds:
        cond = h < F.lit(bound)
        chain = F.when(cond, F.lit(name)) if chain is None else chain.when(
            cond, F.lit(name)
        )
    chain = chain.otherwise(F.lit(names[-1]))
    return docs.select("*", chain.alias("split"))
