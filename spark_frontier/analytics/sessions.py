"""Gap-based sessionization over an event stream.

Training-data pipelines use this to turn raw interaction/crawl logs into
per-session documents (dialogue windows, browse trails); the crawler
itself uses it to compute per-host visit sessions from crawl_logs. Pure
window algebra: lag → gap flag → running sum = session ordinal; both the
flag and the running sum ride ONE window spec (same partitioning + sort),
so Spark plans a single sort per partition — one shuffle on the user key
total, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col) -> F.Column:
    """Epoch micros; tolerates TIMESTAMP_NTZ sources (parquet default) —
    the session tz is UTC, and every use here is a difference, which is
    tz-invariant anyway."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_s: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """One row per (user, session): session ordinal, event count,
    start/end, duration. A session breaks when consecutive events (per
    user, ordered by ts then the tiebreak id for determinism) are more
    than ``gap_s`` seconds apart."""
    ts = F.col(ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap_us = int(gap_s * 1_000_000)
    new_sess = (
        F.when(F.lag(ts).over(w).isNull(), F.lit(1))
        .when(
            _us(ts) - _us(F.lag(ts).over(w)) > gap_us,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    with_id = events.withColumn(
        "session_seq", F.sum(new_sess).over(w).cast("int")
    )
    return with_id.groupBy(
        F.col(user_col).alias("user_id"), "session_seq"
    ).agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (
            (_us(F.max(ts)) - _us(F.min(ts)))
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
    )
