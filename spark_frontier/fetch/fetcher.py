"""Batch fetch operator (S3/S4/T5, SURVEY.md §2.1).

Reference: /root/reference/src/crawler/http_client.py:110-203 — per-URL GET
under robots + rate-limit gates with rotating user agents, aiohttp pool of
50 total / 10 per host, special-casing 429/403/≥400.

Two modes, one shape — output columns (http_code, image_id, caption,
fetched_at, ua):

HERMETIC (tests/bench): the web is a TABLE (url → payload); "fetch" is a
JOIN. This keeps the whole pipeline deterministic and lets the benchmark
measure engine overhead rather than network. The join is on the URL (an
equi-join Catalyst shuffles or broadcasts by size — AQE decides).

LIVE: ``live_fetch`` runs an asyncio aiohttp pool inside ``mapInPandas``
per host-partition — ≤10 concurrent per host, mirroring the reference's
TCPConnector limits — honoring each row's ``politeness_deadline`` in wall
clock. Import-gated: aiohttp is absent in this sandbox, so live mode
raises cleanly if unavailable.

UA rotation (http_client.py:42-53): the reference picks a RANDOM agent per
request; for the reproducible-ordering contract (SURVEY §3) we pick
``xxhash64(url) % len(agents)`` — deterministic, still rotating.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

USER_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36",
    "Mozilla/5.0 (Windows NT 10.0; rv:121.0) Gecko/20100101 Firefox/121.0",
]


def ua_column(url_col) -> F.Column:
    agents = F.array(*[F.lit(a) for a in USER_AGENTS])
    return F.element_at(
        agents, (F.pmod(F.xxhash64(url_col), F.lit(len(USER_AGENTS))) + 1).cast("int")
    )


def hermetic_fetch(
    batch: DataFrame,
    web_pages: DataFrame,
    batch_ts: datetime,
    method: str = "GET",
) -> DataFrame:
    """Fetch-as-join. batch must carry (url, host, politeness_deadline).
    web_pages: (url, image_id, caption, http_code). URLs absent from the
    web table behave as connection failures (http_code 0).

    ``method='HEAD'`` (S4, http_client.py:183-203 check_url_availability):
    availability probe — same status code, NO body (payload columns
    nulled), so downstream never joins/validates a payload for it."""
    fetched = (
        # explicit shuffle-hash: the web table is too big to broadcast but
        # AQE's post-filter size estimates sometimes flip it to a driver
        # broadcast (slow + bimodal); a hash join on url is the stable plan
        batch.hint("shuffle_hash").join(web_pages, on="url", how="left")
        .withColumn("http_code", F.coalesce(F.col("http_code"), F.lit(0)).cast("int"))
        .withColumn("fetched_at", F.lit(batch_ts))
        .withColumn("ua", ua_column(F.col("url")))
        .withColumn("method", F.lit(method))
    )
    if method == "HEAD":
        fetched = fetched.withColumn(
            "image_id", F.lit(None).cast("string")
        ).withColumn("caption", F.lit(None).cast("string"))
    return fetched


def head_probe(batch: DataFrame, web_pages: DataFrame,
               batch_ts: datetime) -> DataFrame:
    """S4: availability triple (url, available, http_code)."""
    probed = hermetic_fetch(batch, web_pages, batch_ts, method="HEAD")
    return probed.select(
        "url",
        ((F.col("http_code") >= 200) & (F.col("http_code") < 400)).alias(
            "available"
        ),
        "http_code",
    )


def attach_payload(
    fetched: DataFrame, images: DataFrame, strategy: str = "auto"
) -> DataFrame:
    """Join the binary payload LATE (bytes never ride through earlier
    shuffles — SURVEY §7 'keep bytes out of shuffles'). Only 200-rows get a
    payload. images: the input_hint table.

    SIZE-AWARE join strategy — the payload table carries ``bytes:binary``,
    so force-broadcasting it is a driver-OOM scale trap at the real
    input_hint table size:

    - ``auto`` (default): plain equi-join; Catalyst plans broadcast from
      the parquet scan's size stats only when the table is actually under
      spark.sql.autoBroadcastJoinThreshold, else a shuffle join on
      image_id (AQE may still convert at runtime). At 100 TB the right
      layout is the images table bucketed on image_id so this degenerates
      to a co-located shuffle-free join.
    - ``broadcast`` / ``shuffle``: explicit override for tests/benchmarks.

    ONE left join for all rows (payload columns nulled for non-200) — a
    filter/union split would evaluate the upstream fetch join twice."""
    payload = images.select(
        "image_id", "bytes", "w", "h", "fmt",
        F.col("caption").alias("ref_caption"), "phash",
    )
    if strategy == "broadcast":
        payload = F.broadcast(payload)
    elif strategy == "shuffle":
        payload = payload.hint("shuffle_hash")
    ok_code = F.col("http_code") == 200
    joined = fetched.join(payload, on="image_id", how="left")
    for c in ["bytes", "w", "h", "fmt", "ref_caption", "phash"]:
        joined = joined.withColumn(c, F.when(ok_code, F.col(c)))
    return joined


def live_fetch(
    batch: DataFrame,
    per_host_limit: int = 10,
    total_limit: int = 50,
    timeout_s: float = 15.0,
    session_factory=None,
) -> DataFrame:
    """LIVE network fetch: aiohttp pool inside ``mapInPandas``.

    The batch is repartitioned BY HOST so each partition's pool enforces
    the reference's per-host connection cap locally (TCPConnector
    limit_per_host=10, http_client.py:118-123) and the deadline column is
    honored in wall clock. The pool body itself (``livepool.run_fetch_batch``)
    is pure asyncio and unit-tested with a mocked session; this wrapper
    only adds the Spark plumbing, so a deployment with aiohttp installed
    runs as-is.

    ``session_factory``: async-context-manager factory for the HTTP
    session, executed ON THE WORKERS. Default builds an
    aiohttp.ClientSession (raises if aiohttp is unavailable — this
    sandbox); tests inject a locally-defined fake (pickled by value into
    the workers) so the whole mapInPandas path — itertuples marshaling,
    deadline tz handling, output schema — executes without the network.

    Output: url, host, politeness_deadline passthrough + (http_code int,
    body binary, fetched_at double).
    """
    if session_factory is None:
        try:
            import aiohttp
        except ImportError as e:  # pragma: no cover - sandbox has no aiohttp
            raise NotImplementedError(
                "live fetch requires aiohttp; this environment is "
                "hermetic-only"
            ) from e

        def session_factory():  # pragma: no cover - needs network
            return aiohttp.ClientSession(
                connector=aiohttp.TCPConnector(
                    limit=total_limit, limit_per_host=per_host_limit
                )
            )

    import pandas as pd

    from spark_frontier.fetch.livepool import run_fetch_batch

    _session_factory = session_factory

    out_schema = (
        "url string, host string, politeness_deadline timestamp, "
        "http_code int, body binary, fetched_at double"
    )

    def _fetch(batches):  # pragma: no cover - needs network
        for pdf in batches:
            rows = [
                {
                    "url": r.url,
                    "host": r.host,
                    "politeness_deadline": r.politeness_deadline,
                    "ua": None,
                }
                for r in pdf.itertuples()
            ]
            res = run_fetch_batch(
                rows, _session_factory, per_host_limit=per_host_limit,
                total_limit=total_limit, timeout_s=timeout_s,
            )
            yield pd.DataFrame(
                {
                    "url": pdf["url"].values,
                    "host": pdf["host"].values,
                    "politeness_deadline": pdf["politeness_deadline"].values,
                    "http_code": [x["http_code"] for x in res],
                    "body": [x["body"] for x in res],
                    "fetched_at": [x["fetched_at"] for x in res],
                }
            )

    with_ua = batch.select("url", "host", "politeness_deadline")
    return with_ua.repartition(F.col("host")).mapInPandas(_fetch, out_schema)
