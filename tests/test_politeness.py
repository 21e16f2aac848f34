from datetime import datetime, timedelta

from pyspark.sql import functions as F

from spark_frontier.politeness.backoff import (
    backoff_wait_s,
    blocked_hosts,
    empty_host_state,
    update_host_state,
)
from spark_frontier.politeness.ratelimit import assign_deadlines, select_batch
from spark_frontier.politeness.robots import build_rules_df, robots_allowed

T0 = datetime(2026, 8, 15, 12, 0, 0)


def _candidates(spark, n_per_host=6, hosts=("a.com", "b.com")):
    rows = []
    for h in hosts:
        for i in range(n_per_host):
            rows.append((f"https://{h}/p{i}", h, 0, 0, [0], i))
    return spark.createDataFrame(
        rows,
        "url string, host string, site_seq int, depth int, "
        "path array<long>, sitemap_pos long",
    )


def test_deadline_spacing_default_rate(spark):
    """T1: slots per host spaced 1/refill_rate = 2 s apart (rate_limiter.py:19-21)."""
    out = assign_deadlines(_candidates(spark), None, T0).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for h, rows in by_host.items():
        rows.sort(key=lambda r: r["host_slot"])
        for i in range(1, len(rows)):
            gap = (rows[i]["politeness_deadline"]
                   - rows[i - 1]["politeness_deadline"]).total_seconds()
            assert abs(gap - 2.0) < 1e-6, f"{h} gap {gap}"
    # ordering respects priority (sitemap_pos here)
    for h, rows in by_host.items():
        assert [r["sitemap_pos"] for r in rows] == sorted(
            r["sitemap_pos"] for r in rows
        )


def test_max_per_host_and_selection(spark):
    scheduled = assign_deadlines(_candidates(spark, n_per_host=10), None, T0,
                                 max_per_host=4)
    assert scheduled.groupBy("host").count().agg(F.max("count")).collect()[0][0] == 4
    # select_batch: only deadlines within the window
    first = select_batch(scheduled, T0, budget_s=1.0)
    assert first.groupBy("host").count().agg(F.max("count")).collect()[0][0] == 1


def test_rate_limited_host_pushed_past_cooldown(spark):
    hs = spark.createDataFrame(
        [("a.com", 0.25, T0 + timedelta(seconds=60), T0 - timedelta(seconds=1),
          0, [], False)],
        "host string, refill_rate double, rate_limit_until timestamp, "
        "last_fetch_ts timestamp, consecutive_failures int, "
        "recent_codes array<int>, is_blocked boolean",
    )
    out = assign_deadlines(_candidates(spark, hosts=("a.com",)), hs, T0).collect()
    out.sort(key=lambda r: r["host_slot"])
    # base = rate_limit_until (60 s out); spacing = 1/0.25 = 4 s
    assert (out[0]["politeness_deadline"] - T0).total_seconds() >= 60
    gap = (out[1]["politeness_deadline"] - out[0]["politeness_deadline"]).total_seconds()
    assert abs(gap - 4.0) < 1e-6


def test_backoff_block_rule(spark):
    """T3: ≥5 of {403,429} within last 10 failure codes → blocked
    (backoff.py:81-89); success resets (backoff.py:51-56)."""
    hs = empty_host_state(spark)
    results = spark.createDataFrame(
        [("bad.com", T0 + timedelta(seconds=i), 429) for i in range(5)]
        + [("ok.com", T0, 200)]
        + [("reset.com", T0 + timedelta(seconds=i), c)
           for i, c in enumerate([429, 429, 429, 429, 200, 429])],
        "host string, politeness_deadline timestamp, http_code int",
    )
    new = {r["host"]: r for r in update_host_state(hs, results, T0).collect()}
    assert new["bad.com"]["is_blocked"] is True
    assert new["bad.com"]["consecutive_failures"] == 5
    assert new["ok.com"]["is_blocked"] is False
    # success at slot 5 cleared the window; one 429 after → not blocked
    assert new["reset.com"]["is_blocked"] is False
    assert new["reset.com"]["consecutive_failures"] == 1
    assert new["reset.com"]["recent_codes"] == [429]
    blocked = [r["host"] for r in blocked_hosts(
        update_host_state(hs, results, T0)).collect()]
    assert blocked == ["bad.com"]


def test_429_halves_rate_and_sets_cooldown(spark):
    """T2 (rate_limiter.py:97-112): refill halved (floor 0.1), 60 s cooldown."""
    hs = empty_host_state(spark)
    results = spark.createDataFrame(
        [("h.com", T0, 429)],
        "host string, politeness_deadline timestamp, http_code int",
    )
    row = update_host_state(hs, results, T0).collect()[0]
    assert abs(row["refill_rate"] - 0.25) < 1e-9
    assert (row["rate_limit_until"] - T0).total_seconds() == 60
    # halving floors at 0.1
    hs2 = update_host_state(hs, results, T0)
    for _ in range(5):
        hs2 = update_host_state(hs2, results, T0)
    assert abs(hs2.collect()[0]["refill_rate"] - 0.1) < 1e-9


def test_backoff_wait_formula(spark):
    df = spark.createDataFrame([(1,), (3,)], "n int")
    out = df.select(backoff_wait_s(F.col("n")).alias("w")).collect()
    assert [r["w"] for r in out] == [2.0, 8.0]


ROBOTS_TXT = """User-agent: googlebot
Disallow: /g-only/

User-agent: *
Disallow: /private/
Disallow: /category/
Allow: /
Crawl-delay: 1.5

User-agent: badbot
Disallow: /
"""


def test_robots_first_match_order(spark):
    rules = build_rules_df(spark, [("x.com", ROBOTS_TXT), ("empty.com", None)])
    frontier = spark.createDataFrame(
        [
            ("https://x.com/private/a", "x.com"),
            ("https://x.com/category/b", "x.com"),
            ("https://x.com/article/c", "x.com"),
            ("https://x.com/g-only/d", "x.com"),     # other agent's group → allowed
            ("https://empty.com/anything", "empty.com"),
            ("https://norobots.com/z", "norobots.com"),
        ],
        "url string, host string",
    )
    out = {r["url"]: r["robots_allowed"] for r in robots_allowed(frontier, rules).collect()}
    assert out["https://x.com/private/a"] is False
    assert out["https://x.com/category/b"] is False
    assert out["https://x.com/article/c"] is True
    assert out["https://x.com/g-only/d"] is True
    assert out["https://empty.com/anything"] is True   # no robots → allow-all
    assert out["https://norobots.com/z"] is True
    # crawl-delay extracted (robots_handler.py:62-68)
    crawl = {r["host"]: r["crawl_delay"]
             for r in robots_allowed(frontier, rules).select("host", "crawl_delay")
             .distinct().collect()}
    assert crawl["x.com"] == 1.5


def test_drain_mode_slots_valid_schedule(spark):
    """Uncapped (drain) politeness path: salted interleaved slots are
    DISTINCT per host and deadlines are spaced >= 1/refill_rate apart —
    a valid schedule for any slot permutation (no single-task hot-host
    sort; see ratelimit.py drain path)."""
    from spark_frontier.politeness.ratelimit import assign_deadlines

    rows = []
    for i in range(5000):  # one hot host + two small ones
        host = "hot.com" if i % 10 < 8 else ("a.com" if i % 2 else "b.com")
        rows.append((f"https://{host}/p{i}", host, 0, 0, [0], i))
    df = spark.createDataFrame(
        rows, "url string, host string, site_seq int, depth int, "
              "path array<long>, sitemap_pos long")
    out = assign_deadlines(df, None, T0, max_per_host=10_000_000)
    assert out.count() == 5000  # nothing dropped
    import pyspark.sql.functions as F

    # distinct slots per host
    dup = out.groupBy("host", "host_slot").count().filter("count > 1")
    assert dup.count() == 0
    # per-host deadline spacing >= 1/0.5 = 2 s between CONSECUTIVE slots
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("politeness_deadline")
    gaps = out.withColumn(
        "prev", F.lag("politeness_deadline").over(w)
    ).filter(F.col("prev").isNotNull()).select(
        (F.unix_micros("politeness_deadline") - F.unix_micros("prev")
         ).alias("gap_us")
    )
    assert gaps.filter(F.col("gap_us") < 2_000_000).count() == 0


def test_drain_mode_still_enforces_cap(spark):
    """Drain path (max_per_host > 4096) must STILL cap per-host selection:
    slot <= max_per_host filters to at most the cap even when the host's
    frontier is far larger (round-2 advice: the 'cap >> frontier'
    assumption only holds for the bench)."""
    rows = [(f"https://big.com/p{i}", "big.com", 0, 0, [0], i)
            for i in range(20_000)]
    df = spark.createDataFrame(
        rows, "url string, host string, site_seq int, depth int, "
              "path array<long>, sitemap_pos long")
    out = assign_deadlines(df, None, T0, max_per_host=8192)
    n = out.count()
    assert n <= 8192
    # salted interleaving may leave small gaps below the cap, but the
    # selection must still be near-full (>90% of the cap)
    assert n > 7300
    dup = out.groupBy("host", "host_slot").count().filter("count > 1")
    assert dup.count() == 0


def test_distributed_robots_parse_matches_driver(spark):
    """build_rules_df_distributed (mapInPandas, no driver collect of the
    robots bodies) produces exactly the same rules table as the
    driver-side parse."""
    from spark_frontier.politeness.robots import build_rules_df_distributed

    docs = [("x.com", ROBOTS_TXT), ("empty.com", None),
            ("delay.com", "User-agent: *\nCrawl-delay: 3\n"),
            ("deny.com", "User-agent: *\nDisallow: /\n")]
    local = build_rules_df(spark, docs)
    dist = build_rules_df_distributed(
        spark.createDataFrame(docs, "host string, content string")
    )
    a = sorted(map(tuple, local.collect()))
    b = sorted(map(tuple, dist.collect()))
    assert a == b and len(a) > 0


def test_robots_broadcast_gate_shuffle_path_on_many_hosts(spark):
    """VERDICT r3 #3: above the host cap the rules join must NOT broadcast
    (a 10^6-host rules table is GBs) — plain shuffle join on host, same
    verdicts. Synthetic 10^5-host rules table, JVM-generated."""
    from pyspark.sql import functions as F

    n_hosts = 100_000
    rules = spark.range(n_hosts).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".com"))
        .alias("host"),
        F.lit(0).alias("rule_pos"),
        F.lit("/private").alias("pattern"),
        F.lit(False).alias("allow"),
        F.lit(None).cast("double").alias("crawl_delay"),
    )
    frontier = spark.range(500).select(
        F.concat(F.lit("h"), (F.col("id") * 211).cast("string"),
                 F.lit(".com")).alias("host"),
        F.concat(
            F.lit("https://h"), (F.col("id") * 211).cast("string"),
            F.lit(".com"),
            F.when(F.col("id") % 2 == 0, F.lit("/private/x"))
            .otherwise(F.lit("/public/x")),
        ).alias("url"),
        F.col("id"),
    )

    def _plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString().lower()

    bcast = robots_allowed(frontier, rules, n_hosts=n_hosts)
    assert "broadcast" in _plan(bcast)  # None/small → broadcast default
    shuf = robots_allowed(frontier, rules, n_hosts=n_hosts,
                          broadcast_max_hosts=1000)
    assert "broadcast" not in _plan(shuf)

    got_b = {r["id"]: r["robots_allowed"] for r in bcast.collect()}
    got_s = {r["id"]: r["robots_allowed"] for r in shuf.collect()}
    assert got_b == got_s
    assert got_s[0] is False and got_s[1] is True  # /private blocked


def test_sitemap_urls_from_robots(spark):
    """Sitemap: directive extraction — case-insensitive, indentation and
    tab tolerated, comment lines ignored, multiple directives per host,
    hosts without directives absent."""
    from spark_frontier.politeness.robots import sitemap_urls_from_robots

    rows = [
        ("a.com", "User-agent: *\nDisallow: /x\n"
                  "Sitemap: https://a.com/s1.xml\n"
                  "  sitemap:\thttps://a.com/s2.xml\n"
                  "# Sitemap: https://a.com/commented.xml\n"),
        ("b.com", "SITEMAP: https://b.com/map.xml\nUser-agent: *\n"),
        ("c.com", "User-agent: *\nDisallow: /\n"),
        ("d.com", None),
    ]
    df = spark.createDataFrame(rows, "host string, content string")
    got = {(r["host"], r["sitemap_url"])
           for r in sitemap_urls_from_robots(df).collect()}
    assert got == {
        ("a.com", "https://a.com/s1.xml"),
        ("a.com", "https://a.com/s2.xml"),
        ("b.com", "https://b.com/map.xml"),
    }
