"""Sequence packing for LLM pretraining: concat-and-chunk documents into
fixed-capacity token windows.

The standard GPT-style packing contract: documents are concatenated in a
deterministic global order (doc_id) and the token stream is chunked every
``capacity`` tokens; a document may straddle a chunk boundary. The
operator answers, per document, WHERE it lands: its global token offset,
the first and last sequence ids it touches, and how many sequences it
spans — the assignment table a downstream writer joins back to the text
to emit the actual packed batches.

The interesting part at scale is the global prefix sum. A naive
``sum() OVER (ORDER BY doc_id)`` is a single-partition window — one task
owning 100 TB of ordering. Instead the classic two-phase parallel scan:

  1. range-partition the (doc_id, n_tokens) projection by doc_id — text
     never shuffles, only 16 bytes/doc;
  2. per-partition token totals come back to the driver (one row per
     partition — a few KB even at 10^5 partitions) and fold into
     exclusive partition prefixes;
  3. each partition computes its local running sum in parallel (window
     partitioned BY the range-partition id) and adds its broadcast
     prefix.

Every stage is embarrassingly parallel except the O(partitions)
driver fold. The DuckDB oracle replays the same arithmetic as one
ordered-window cumsum (fine at oracle scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_frontier.analytics.textstats import token_count
from spark_frontier.storage.materialize import materialize


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Assign each document its place in the concat-and-chunk token
    stream. Returns one row per input document:

      (doc_id, n_tokens, offset, seq_first, seq_last, n_seqs)

    where ``offset`` is the exclusive prefix sum of token counts in
    doc_id order, ``seq_first``/``seq_last`` the first/last
    ``capacity``-token sequence the document occupies, and ``n_seqs``
    how many it spans (0 for empty documents, which consume no stream
    positions). Tokenization is ``textstats.token_count`` — the same
    rule q16 oracle-checks — unless ``count_col`` names a precomputed
    per-document token count (e.g. ``bpe_encode``'s n_subwords), in
    which case the stream is measured in THOSE units."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    spark = docs.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism

    counts = (
        F.col(count_col) if count_col is not None
        else token_count(F.col(text_col))
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        counts.cast("long").alias("n_tokens"),
    )
    # phase 1: range partition the tiny projection; pin the partition id
    # as data so the totals pass and the cumsum pass cannot disagree
    ranged = materialize(
        d.repartitionByRange(n_parts, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )

    # phase 2: per-partition totals -> exclusive prefixes on the driver
    # (one row per partition; RangePartitioner orders partitions by key
    # range, so prefixes fold in _pid order)
    totals = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    prefix: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        prefix[int(row["_pid"])] = acc
        acc += int(row["t"])
    # empty-input guard: a no-arg create_map() is map<void,void> and
    # fails to RESOLVE against the int _pid key even though no row
    # would ever evaluate it
    pmap = F.create_map(
        *[F.lit(x) for kv in prefix.items() for x in kv]
    ) if prefix else F.create_map(F.lit(0), F.lit(0))

    # phase 3: parallel local cumsum + broadcast prefix
    w = (
        Window.partitionBy("_pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        + F.coalesce(F.element_at(pmap, F.col("_pid")), F.lit(0))
    ).cast("long")

    out = ranged.select("doc_id", "n_tokens", off.alias("offset"))
    seq_first = F.expr(f"offset div {int(capacity)}")
    seq_last = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(offset + n_tokens - 1) div {int(capacity)}"),
    ).otherwise(seq_first)
    return out.select(
        "doc_id",
        "n_tokens",
        "offset",
        seq_first.cast("long").alias("seq_first"),
        seq_last.cast("long").alias("seq_last"),
        F.when(F.col("n_tokens") > 0, seq_last - seq_first + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_seqs"),
    )


def select_token_budget(
    docs: DataFrame,
    token_budget: int,
    quality_col: str = "quality",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int | None = None,
) -> DataFrame:
    """Budget-constrained corpus selection: take the highest-``quality``
    documents, in (quality desc, id asc) order, until the next document
    would exceed ``token_budget`` total tokens — the "best B tokens"
    step that precedes packing when compute, not data, is the limit.

    Greedy-by-rank with a cumulative cutoff is exactly a prefix sum over
    a sort order, so this reuses pack_sequences' two-phase parallel scan
    (range partition by the sort key → O(partitions) driver fold →
    parallel local cumsum) — no single-partition window. A document is
    selected iff the budget still covers it AFTER everything ranked
    above it (documents that individually overflow are skipped only if
    they rank past the cutoff — the contract is prefix-greedy, matching
    the SQL-window twin, not knapsack).

    Returns every input row: (id_col, quality, n_tokens, cum_before,
    selected)."""
    if token_budget < 0:
        raise ValueError("token_budget must be non-negative")
    spark = docs.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(quality_col).cast("double").alias("quality"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    ranged = materialize(
        d.repartitionByRange(
            n_parts, F.col("quality").desc(), F.col("doc_id").asc()
        ).withColumn("_pid", F.spark_partition_id())
    )
    totals = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    prefix: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        prefix[int(row["_pid"])] = acc
        acc += int(row["t"])
    pmap = F.create_map(
        *[F.lit(x) for kv in prefix.items() for x in kv]
    ) if prefix else F.create_map(F.lit(0), F.lit(0))

    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = (
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        + F.coalesce(F.element_at(pmap, F.col("_pid")), F.lit(0))
    ).cast("long")
    return ranged.select(
        "doc_id",
        "quality",
        "n_tokens",
        cum_before.alias("cum_before"),
        (cum_before + F.col("n_tokens") <= F.lit(int(token_budget)))
        .alias("selected"),
    )
