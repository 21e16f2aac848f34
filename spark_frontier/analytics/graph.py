"""Link-graph crawl prioritization: PageRank over the discovered page
graph.

Reference parity: the reference crawler orders its frontier purely by
sitemap recency/position (src/crawler/frontier.py); at web scale the
standard upgrade is a link-graph prior (PageRank / OPIC family) feeding
the priority column that ``ratelimit.assign_deadlines`` already consumes.
This module computes that prior as pure DataFrame algebra.

Scale notes (the 10^10-URL design point):
- The rank vector lives in a DataFrame keyed by node — never on the
  driver. Only the scalar vertex count is collected.
- Each iteration is one shuffle join (edges ⋈ ranks on src, pre-joined
  static out-degrees) + one groupBy(dst) partial-agg sum; partitioning
  by node id is stable across iterations so AQE/exchange reuse keeps
  the shuffles aligned.
- Lineage is cut per iteration with an eager localCheckpoint
  (storage/materialize.py) — without it the plan doubles per iteration
  and the job re-executes the whole chain at every action
  (memory: spark-perf-pitfalls).
- Dangling mass (nodes with no out-edges) is dropped, not
  redistributed; the oracle replays the identical recurrence, and for
  crawl prioritization only the ordering matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_frontier.storage.materialize import materialize


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Iterative PageRank over an edge list; returns (node, rank).

    rank_0 = 1/N for every node in src ∪ dst;
    rank_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_k(u) / outdeg(u).
    """
    src = F.col(src_col)
    dst = F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    ).distinct().transform(materialize)
    verts = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(materialize)
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # contribution edges with the static per-src out-degree attached once
    ed = e.join(outdeg, "src").transform(materialize)
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            verts.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .transform(materialize)
        )
    return ranks
