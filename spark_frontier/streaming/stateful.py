"""T2/T3 as a CUSTOM STATEFUL STREAMING operator (applyInPandasWithState).

Reference: /root/reference/src/crawler/backoff.py:51-113 and
rate_limiter.py:97-112 keep per-host throttle state in process RAM,
mutated per response. The batch engine folds the same semantics per cycle
(politeness/backoff.py::update_host_state — a JVM aggregate over the
deadline-ordered code sequence). This module is the third shape: a
Structured Streaming operator that maintains the identical per-host state
ACROSS micro-batches with Spark-managed state (checkpointed, recoverable,
partitioned by host — the canonical `applyInPandasWithState` pattern for
operators Spark lacks natively).

Fold parity with the batch operator (asserted by
tests/test_streaming.py::test_stateful_backoff_matches_batch_fold):

- codes fold in (politeness_deadline, http_code) order within a batch;
  across micro-batches in arrival order (a stream's time order)
- success (2xx/3xx) resets failure codes + counter and unblocks
- failure appends; host blocks when the new code ∈ {403,429} AND ≥5 of
  the last 10 recorded failure codes are blocking codes
- each 429 halves refill_rate (floor 0.1 — the floor is absorbing, so
  per-batch clamping equals whole-history clamping) and re-arms the 60 s
  cooldown

Emits one updated state row per host per micro-batch (Update mode).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from spark_frontier.politeness.backoff import (
    BLOCK_THRESHOLD,
    BLOCKING_CODES,
    WINDOW,
)
from spark_frontier.politeness.ratelimit import (
    DEFAULT_REFILL_RATE,
    MIN_REFILL_RATE,
    RATE_LIMIT_COOLDOWN_S,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("refill_rate", DoubleType()),
        StructField("rate_limit_until", TimestampType()),
        StructField("last_fetch_ts", TimestampType()),
        StructField("consecutive_failures", IntegerType()),
        StructField("recent_codes", ArrayType(IntegerType())),
        StructField("is_blocked", BooleanType()),
    ]
)

# GroupState tuple layout; timestamps as epoch micros (state schemas are
# plain tuples — keep them integer-typed for exact round-trips)
STATE_SCHEMA = StructType(
    [
        StructField("refill_rate", DoubleType()),
        StructField("rate_limit_until_us", LongType()),
        StructField("last_fetch_ts_us", LongType()),
        StructField("consecutive_failures", IntegerType()),
        StructField("recent_codes", ArrayType(IntegerType())),
        StructField("is_blocked", BooleanType()),
    ]
)

_EPOCH = datetime(1970, 1, 1)


def _us(dt) -> int | None:
    if dt is None or pd.isna(dt):
        return None
    return int((dt - _EPOCH) / timedelta(microseconds=1))


def _from_us(us) -> datetime | None:
    if us is None:
        return None
    return _EPOCH + timedelta(microseconds=int(us))


def host_backoff_fold(batch_ts: datetime):
    """Build the per-group fold for ``applyInPandasWithState``.

    ``batch_ts`` is the cycle's logical time (used only for the 429
    cooldown horizon — parity with the batch operator's parameter).
    """

    def _fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            (rate, rl_us, lf_us, cf, codes, blocked) = state.get
            codes = list(codes)
        else:
            rate, rl_us, lf_us = None, None, None
            cf, codes, blocked = 0, [], False

        n_429 = 0
        max_deadline_us = lf_us
        for pdf in pdfs:
            pdf = pdf.sort_values(["politeness_deadline", "http_code"])
            for dl, code in zip(pdf["politeness_deadline"], pdf["http_code"]):
                code = int(code)
                if 200 <= code < 400:
                    codes, cf, blocked = [], 0, False
                else:
                    codes = (codes + [code])[-WINDOW:]
                    cf += 1
                    if code in BLOCKING_CODES and (
                        sum(c in BLOCKING_CODES for c in codes)
                        >= BLOCK_THRESHOLD
                    ):
                        blocked = True
                if code == 429:
                    n_429 += 1
                us = _us(dl)
                if us is not None and (max_deadline_us is None
                                       or us > max_deadline_us):
                    max_deadline_us = us

        if n_429 > 0:
            base = rate if rate is not None else DEFAULT_REFILL_RATE
            rate = max(MIN_REFILL_RATE, base * (0.5 ** n_429))
            rl_us = _us(batch_ts + timedelta(seconds=RATE_LIMIT_COOLDOWN_S))

        state.update((rate, rl_us, max_deadline_us, cf, codes, blocked))
        yield pd.DataFrame(
            {
                "host": [host],
                "refill_rate": [
                    rate if rate is not None else DEFAULT_REFILL_RATE
                ],
                "rate_limit_until": [_from_us(rl_us)],
                "last_fetch_ts": [_from_us(max_deadline_us)],
                "consecutive_failures": [cf],
                "recent_codes": [codes],
                "is_blocked": [blocked],
            }
        )

    return _fold


def stateful_host_backoff(
    results_stream: DataFrame, batch_ts: datetime
) -> DataFrame:
    """Streaming per-host throttle state: groupBy(host) →
    applyInPandasWithState. ``results_stream`` is a STREAMING DataFrame of
    (host string, politeness_deadline timestamp, http_code int). Returns
    the update-mode stream of state rows; state is Spark-managed
    (host-partitioned, checkpointed with the query)."""
    return results_stream.groupBy("host").applyInPandasWithState(
        host_backoff_fold(batch_ts),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
