"""Recrawl scheduling: per-URL change-rate estimation → refresh priority.

Reference parity: the reference recrawls purely on sitemap <lastmod>
recency (src/crawler/frontier.py); the web-scale upgrade is the classic
Cho & Garcia-Molina estimator — model page changes as a Poisson process,
estimate each URL's change rate λ from its observation history, and rank
URLs by the probability they have changed since last fetch. That
probability feeds the same priority column the politeness scheduler
(ratelimit.assign_deadlines) already orders on.

Estimator (Cho & Garcia-Molina 2003, "Estimating Frequency of Change"):
    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Δ̄
with n observations, X of them changed, Δ̄ the mean inter-observation
gap; the +0.5 terms are the bias correction that keeps λ̂ finite when
X = n. Staleness priority = P(changed by now) = 1 - exp(-λ̂ · age).

Scale: one groupBy(url) shuffle with map-side partial aggregation —
count/sum/min/max all combine associatively; everything after the agg is
whole-stage-codegen scalar math on one row per URL. No windows, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

US_PER_HOUR = 3_600_000_000.0


def _us(col) -> Column:
    """Epoch micros; tolerates TIMESTAMP_NTZ sources (parquet default).
    Every use below is a difference, which is tz-invariant."""
    return F.unix_micros(col.cast("timestamp"))


def change_rate_priority(
    observations: DataFrame,
    ref_ts,
    url_col: str = "url",
    ts_col: str = "ts",
    changed_col: str = "changed",
    min_obs: int = 5,
) -> DataFrame:
    """(url, n_obs, n_changed, lambda_per_h, priority) per URL with at
    least ``min_obs`` observations spanning a positive time range.

    ``changed_col`` is boolean: did this fetch observe new content
    (fingerprint differs from the previous fetch). ``ref_ts`` is "now"
    for the age computation — pass a literal for reproducible runs.
    """
    ts = F.col(ts_col)
    agg = (
        observations.groupBy(F.col(url_col).alias("url"))
        .agg(
            F.count("*").alias("n_obs"),
            F.sum(F.col(changed_col).cast("long")).alias("n_changed"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
        )
        .filter(
            (F.col("n_obs") >= min_obs)
            & (F.col("last_ts") > F.col("first_ts"))
        )
    )
    span_h: Column = (
        _us(F.col("last_ts")) - _us(F.col("first_ts"))
    ) / F.lit(US_PER_HOUR)
    gap_h = span_h / (F.col("n_obs") - 1)
    lam = (
        -F.log(
            (F.col("n_obs") - F.col("n_changed") + 0.5)
            / (F.col("n_obs") + 0.5)
        )
        / gap_h
    )
    age_h = (
        _us(F.lit(ref_ts)) - _us(F.col("last_ts"))
    ) / F.lit(US_PER_HOUR)
    return agg.select(
        "url",
        "n_obs",
        "n_changed",
        lam.alias("lambda_per_h"),
        (F.lit(1.0) - F.exp(-lam * age_h)).alias("priority"),
    )
