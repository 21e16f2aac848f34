"""VERDICT r3 #6: end-to-end `live_fetch` over the synthetic world with a
FAKE session — the full mapInPandas path (itertuples marshaling, deadline
tz handling, per-host repartition, output schema) executes in CI without
aiohttp or the network, and its verdicts equal `hermetic_fetch`'s."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_frontier.fetch.fetcher import hermetic_fetch, live_fetch
from spark_frontier.pipeline.crawl import load_world
from spark_frontier.pipeline.synth import NOW, gen_world


def test_live_fetch_fake_session_matches_hermetic(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lfworld"))
    gen_world(d, n_sites=4, urlsets_per_site=2, urls_per_urlset=20)
    world = load_world(spark, d)

    # the "web": url -> (code, body) captured into the factory closure;
    # the factory + session classes are defined LOCALLY so cloudpickle
    # ships them by value into the python workers
    pages = {
        r["url"]: (int(r["http_code"]), (r["caption"] or "").encode())
        for r in world["web_pages"].collect()
    }

    class _Resp:
        def __init__(self, status, body):
            self.status = status
            self._body = body

        async def read(self):
            return self._body

    class _FakeSession:
        async def __aenter__(self):
            return self

        async def __aexit__(self, *a):
            return False

        async def get(self, url, headers=None):
            if url not in pages:
                raise ConnectionError(url)
            code, body = pages[url]
            return _Resp(code, body)

    batch = (
        world["web_pages"].select("url")
        .withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
        # one URL the web doesn't know → connection error → code 0
        .unionByName(
            spark.createDataFrame(
                [("https://site0.example.com/missing", "site0.example.com")],
                "url string, host string",
            )
        )
        .withColumn("politeness_deadline", F.lit(NOW))  # past → no sleeps
    )

    live = live_fetch(batch, session_factory=_FakeSession).collect()
    assert len(live) == batch.count()
    got = {r["url"]: r for r in live}

    herm = {
        r["url"]: r
        for r in hermetic_fetch(batch, world["web_pages"], NOW).collect()
    }
    assert set(got) == set(herm)
    for url, h in herm.items():
        g = got[url]
        assert g["http_code"] == h["http_code"], url
        if h["http_code"] == 200:
            assert bytes(g["body"]) == (h["caption"] or "").encode(), url
        assert g["fetched_at"] is not None and g["fetched_at"] > 0
        assert g["politeness_deadline"] is not None  # tz round-trip intact
    assert got["https://site0.example.com/missing"]["http_code"] == 0
