"""Similarity search over embedding columns (training-data ops).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
approximate path that scales: random-hyperplane signatures bucket the
corpus so a query probes only its bucket (and optionally neighbors).

All dot products/norms are JVM higher-order functions (zip_with +
aggregate) — whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-bucketed scale path


def kmeans_fit(
    embeddings: DataFrame, n_centroids: int = 16, n_iter: int = 5,
    seed: int = 42, vec_col: str = "embedding", id_col: str = "vec_id",
):
    """Deterministic Lloyd k-means, DataFrame-native: assignment runs as a
    vectorized pandas UDF over broadcast centroids; the centroid update is
    a posexplode → groupBy(centroid, dim) avg (one shuffle of n·d scalar
    rows, map-side combined); only the (n_centroids × d) centroid matrix
    ever reaches the driver. Init = deterministic hash-order sample of
    the corpus: the n_centroids rows with the smallest md5(id) hex digest
    (md5, not xxhash64, so a SQL oracle — DuckDB has md5 but not
    xxhash64 — can replay the init and unroll the Lloyd iterations; see
    __spark_entry__._q29_oracle). Bit-stable across runs. Returns the
    centroid ndarray."""
    # pandas imported at module level
    from pyspark.sql import functions as F2
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    first = embeddings.select(vec_col).first()
    if first is None:
        raise ValueError("empty corpus")
    dim = len(first[vec_col])
    # deterministic, SQL-replayable init: md5-hex order, id tie-break
    init_rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(
            F.md5(F.col(id_col).cast("string").cast("binary")),
            F.col(id_col),
        )
        .limit(n_centroids)
        .collect()
    )
    centroids = np.array([list(r[vec_col]) for r in init_rows], dtype=np.float64)

    for _ in range(n_iter):
        c = centroids  # rebind for closure capture per iteration

        @pandas_udf(IntegerType())
        def _assign(vecs: pd.Series) -> pd.Series:
            m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
            # nearest by euclidean distance; ties → lowest centroid id
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(d2.argmin(axis=1).astype("int32"))

        assigned = embeddings.select(
            id_col, vec_col, _assign(F.col(vec_col)).alias("centroid")
        )
        sums = (
            assigned.select(
                "centroid", F2.posexplode(F.col(vec_col)).alias("dim", "v")
            )
            .groupBy("centroid", "dim")
            .agg(F2.sum("v").alias("s"), F2.count("*").alias("n"))
            .collect()
        )
        new_c = centroids.copy()
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["centroid"], np.zeros(dim))[r["dim"]] = r["s"]
            cnt[r["centroid"]] = r["n"]
        for k, v in acc.items():
            new_c[k] = v / cnt[k]
        centroids = new_c
    return centroids


def ivf_assignments(
    embeddings: DataFrame, centroids, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid (the IVF posting-list
    key). At 100 TB this table is written partitioned by ``centroid`` so a
    probe reads only n_probe partitions."""
    # pandas imported at module level
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    c = np.asarray(centroids, dtype=np.float64)

    @pandas_udf(IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return embeddings.select(
        id_col, vec_col, _assign(F.col(vec_col)).alias("centroid")
    )


def ivf_topk(
    assignments: DataFrame, centroids, query: list[float], k: int = 10,
    n_probe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: rank centroids by distance to the query (driver-side
    numpy — n_centroids × d floats), scan only the ``n_probe`` nearest
    posting lists, exact cosine top-k on that slice. Recall is tuned by
    n_probe; with partition-pruned posting lists the scan cost is
    |corpus| · n_probe / n_centroids."""
    c = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(((c - q[None, :]) ** 2).sum(axis=1), kind="stable")
    probe = [int(x) for x in order[:n_probe]]
    cand = assignments.filter(F.col("centroid").isin(probe))
    return cosine_topk(cand, query, k=k, vec_col=vec_col, id_col=id_col)


def build_ivf_index(
    embeddings: DataFrame, store, table: str = "ivf_index",
    n_centroids: int = 16, n_iter: int = 5, seed: int = 42,
    vec_col: str = "embedding", id_col: str = "vec_id",
):
    """Persist the IVF index ONCE (SnapStore; Iceberg partitioned-by-
    centroid in production). The centroid matrix rides in the snapshot
    summary so queries need no side-channel."""
    centroids = kmeans_fit(
        embeddings, n_centroids=n_centroids, n_iter=n_iter, seed=seed,
        vec_col=vec_col, id_col=id_col,
    )
    assigned = ivf_assignments(
        embeddings, centroids, vec_col=vec_col, id_col=id_col
    ).repartition("centroid").sortWithinPartitions("centroid")
    store.table(table).overwrite(
        assigned,
        summary={"op": "ivf_index", "n_centroids": n_centroids,
                 "seed": seed,
                 "centroids": [[float(x) for x in row] for row in centroids]},
    )
    return centroids


def ivf_query(
    spark, store, query: list[float], k: int = 10, n_probe: int = 4,
    table: str = "ivf_index", vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the PERSISTED IVF index (partition-pruned read at scale)."""
    tbl = store.table(table)
    centroids = np.array(tbl.summary()["centroids"], dtype=np.float64)
    return ivf_topk(
        tbl.read(spark), centroids, query, k=k, n_probe=n_probe,
        vec_col=vec_col, id_col=id_col,
    )
