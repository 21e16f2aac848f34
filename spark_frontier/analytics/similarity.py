"""Similarity search over embedding columns (training-data ops).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
approximate path that scales: random-hyperplane signatures bucket the
corpus so a query probes only its bucket (and optionally neighbors).

All dot products/norms are JVM higher-order functions (zip_with +
aggregate) — whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a.cast("array<double>"), F.lit(0.0).cast("double"),
                    lambda acc, v: acc + v * v)
    )


def cosine_topk(
    embeddings: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to ``query``.

    One scan, one narrow projection, a k-row sort (TakeOrderedAndProject —
    no global sort materializes). Scales linearly with corpus size; this is
    the correctness baseline for ANN variants."""
    q = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    qn = float(np.sqrt(np.sum(np.square(query))))
    scored = embeddings.select(
        F.col(id_col),
        (_dot(F.col(vec_col).cast("array<double>"), q)
         / (_norm(F.col(vec_col)) * F.lit(qn))).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def hyperplane_signatures(
    embeddings: DataFrame, n_planes: int = 12, dim: int = 64, seed: int = 42,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit i = sign(v·h_i).
    Planes are a broadcast literal matrix; the signature is computed with
    JVM expressions (one dot per plane)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    sig = F.lit(0).cast("long")
    v = F.col(vec_col).cast("array<double>")
    for i in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(v, h) > 0).cast("long")
        sig = sig + F.shiftleft(bit, i)
    return embeddings.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def _query_probe_buckets(
    query: list[float], n_planes: int, seed: int
) -> list[int]:
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, len(query)))
    qsig = 0
    for i in range(n_planes):
        if float(np.dot(query, planes[i])) > 0:
            qsig |= 1 << i
    # multi-probe: exact bucket + hamming-1 neighbors
    return [qsig] + [qsig ^ (1 << i) for i in range(n_planes)]


def ann_topk_lsh(
    embeddings: DataFrame, query: list[float], k: int = 10, n_planes: int = 12,
    seed: int = 42, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket. Recall is
    tuned by n_planes (fewer planes → bigger buckets → higher recall, more
    work); multi-probe (hamming-1 neighbors) is the standard recall
    booster. This SCAN-TIME variant recomputes signatures per query — demo
    shape; the 100 TB path is ``build_ann_index`` + ``ann_query`` below."""
    probe = _query_probe_buckets(query, n_planes, seed)
    dim = len(query)
    sigs = hyperplane_signatures(embeddings, n_planes=n_planes, dim=dim,
                                 seed=seed, vec_col=vec_col, id_col=id_col)
    cand = sigs.filter(F.col("bucket").isin(probe))
    return cosine_topk(cand, query, k=k, vec_col=vec_col, id_col=id_col)


def build_ann_index(
    embeddings: DataFrame, store, table: str = "ann_index",
    n_planes: int = 12, dim: int = 64, seed: int = 42,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> str:
    """Persist the signature table ONCE (SnapStore; Iceberg in production,
    partitioned by ``bucket`` so a probe is a partition-pruned read, not a
    corpus scan). Returns the committed snapshot id. Rebuild when the
    corpus or the plane family (n_planes/seed) changes — both are recorded
    in the snapshot summary for staleness checks."""
    sigs = hyperplane_signatures(
        embeddings, n_planes=n_planes, dim=dim, seed=seed,
        vec_col=vec_col, id_col=id_col,
    ).repartition("bucket").sortWithinPartitions("bucket")
    return store.table(table).overwrite(
        sigs, summary={"op": "ann_index", "n_planes": n_planes, "seed": seed}
    )


def ann_query(
    spark, store, query: list[float], k: int = 10, table: str = "ann_index",
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Probe the PERSISTED index: read → filter probe buckets (pushed to
    the parquet scan; partition pruning on Iceberg) → exact cosine top-k on
    the candidate slice only. No signature recomputation per query."""
    tbl = store.table(table)
    meta = tbl.summary()
    n_planes, seed = int(meta["n_planes"]), int(meta["seed"])
    probe = _query_probe_buckets(query, n_planes, seed)
    sigs = tbl.read(spark)
    cand = sigs.filter(F.col("bucket").isin(probe))
    return cosine_topk(cand, query, k=k, vec_col=vec_col, id_col=id_col)
