"""Per-cycle fetch-budget apportionment across hosts.

A crawl cycle has a global fetch budget (politeness-bounded worker
seconds); the frontier wants it split across hosts in proportion to a
priority weight (frontier depth mix, PageRank mass, recrawl pressure —
any non-negative integer weight). Largest-remainder (Hamilton)
apportionment is the standard exact answer: every host gets
floor(B·w/W) slots, and the L = B − Σfloor leftover slots go to the L
largest fractional remainders.

Everything stays in INTEGER arithmetic — base = (B·w) div W and
remainder = (B·w) mod W — so the result is bit-exact and replayable by
a SQL oracle with no float-ordering hazards (B·w must fit int64; at a
10^10-URL frontier with per-host counts ~10^7 and budgets ~10^8 that
bound needs decimal(38), a one-line cast, noted here rather than paid
everywhere).

The only global step is ranking remainders. A plain
``row_number() OVER (ORDER BY rem DESC)`` is a single-partition window;
instead the same two-phase scan as ``analytics.packing``:
range-partition by the sort key, count rows per partition (one row per
partition to the driver), fold exclusive prefix counts, then rank
locally in parallel and add the prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_frontier.storage.materialize import materialize


def allocate_budget(
    hosts: DataFrame,
    total_budget: int,
    weight_col: str = "weight",
    host_col: str = "host",
    n_parts: int | None = None,
) -> DataFrame:
    """Hamilton-apportion ``total_budget`` integer fetch slots across
    hosts proportionally to ``weight_col`` (non-negative integers).

    Returns (host, weight, alloc) with Σalloc == total_budget exactly
    (all-zero weights → all-zero allocs). Deterministic: leftover slots
    break remainder ties by host ascending. Per-host politeness caps are
    NOT applied here — they compose downstream (``assign_deadlines``
    max_per_host), because capping inside the apportionment would make
    it iterative without changing what the scheduler admits."""
    if total_budget < 0:
        raise ValueError("total_budget must be non-negative")
    spark = hosts.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism

    h = hosts.select(
        F.col(host_col).alias("host"),
        F.col(weight_col).cast("long").alias("weight"),
    )
    tot = h.agg(F.sum("weight").alias("w"), F.count("*").alias("n")).first()
    w_sum = int(tot["w"] or 0)
    if w_sum == 0 or total_budget == 0:
        return h.withColumn("alloc", F.lit(0).cast("long"))

    b = int(total_budget)
    scaled = h.select(
        "host",
        "weight",
        F.expr(f"(weight * {b}) div {w_sum}").alias("base"),
        F.expr(f"(weight * {b}) % {w_sum}").alias("rem"),
    )
    # two-phase global rank of (rem desc, host asc)
    ranged = materialize(
        scaled.repartitionByRange(
            n_parts, F.col("rem").desc(), F.col("host").asc()
        ).withColumn("_pid", F.spark_partition_id())
    )
    counts = ranged.groupBy("_pid").agg(
        F.count("*").alias("n"), F.sum("base").alias("s")
    ).collect()  # one row per partition; one job for prefix AND leftover
    leftover = b - sum(int(r["s"]) for r in counts)  # < n_hosts

    prefix: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        prefix[int(row["_pid"])] = acc
        acc += int(row["n"])
    pmap = F.create_map(*[F.lit(x) for kv in prefix.items() for x in kv])

    w = Window.partitionBy("_pid").orderBy(
        F.col("rem").desc(), F.col("host").asc()
    )
    rank = F.row_number().over(w) + F.coalesce(
        F.element_at(pmap, F.col("_pid")), F.lit(0)
    )
    return ranged.select(
        "host",
        "weight",
        (
            F.col("base")
            + F.when(rank <= F.lit(leftover), 1).otherwise(0)
        ).cast("long").alias("alloc"),
    )
