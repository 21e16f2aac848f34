"""Event-time windowed crawl metrics with watermarked late-data handling.

The reference aggregates per-cycle counters inside its loop
(src/crawler/crawl_scheduler.py counters); the streaming-native shape is
an event-time tumbling-window aggregation: per (window, host) fetch and
failure counts that tolerate out-of-order arrivals up to the watermark
and drop anything later. This is the standard Structured Streaming
watermark + window topology — state is bounded (windows close and evict
once the watermark passes their end), so the operator runs forever at
constant memory per active window × host.

The same function works on a batch DataFrame (``withWatermark`` is a
no-op outside streaming), which is exactly what the parity test uses:
stream output (append mode, only CLOSED windows) must equal the batch
aggregation restricted to rows the watermark admitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_host_metrics(
    events: DataFrame,
    window_dur: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    host_col: str = "host",
    status_col: str = "status",
) -> DataFrame:
    """Per (event-time window, host): fetch count + failure count
    (status ≥ 400). Streaming: append-mode emits a row once the
    watermark closes the window; late rows beyond the watermark are
    dropped by Spark's state store, not by us."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_dur).alias("win"),
            F.col(host_col).alias("host"),
        )
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(
                F.when(F.col(status_col) >= 400, 1).otherwise(0)
            ).alias("n_failures"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n_fetches",
            "n_failures",
        )
    )
