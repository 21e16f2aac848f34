"""robots.txt rules as a broadcast join (T7, SURVEY.md §2.4).

Reference: /root/reference/src/crawler/robots_handler.py:41-140 — fetches
``https://host/robots.txt``, parses with urllib's RobotFileParser, caches
per-domain, allows-all on non-200/fetch error, and extracts ``Crawl-delay``.

Spark shape (north_rule: "robots.txt rule caching materialized as a
broadcast join"): robots documents parse once per host into a small rules
table ``(host, rule_pos, pattern, allow, crawl_delay)``; the frontier
broadcast-joins it and the verdict is computed with JVM-side expressions —
first matching rule in file order wins, which is exactly
``urllib.robotparser`` semantics for the ``*`` agent (prefix match on the
path, rules evaluated in document order, allow-all when no rule matches or
no robots.txt exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

RULES_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("rule_pos", IntegerType()),
        StructField("pattern", StringType()),
        StructField("allow", BooleanType()),
        StructField("crawl_delay", DoubleType()),
    ]
)


def parse_robots_txt(host: str, content: str | None) -> list[dict]:
    """Parse one robots.txt into rule rows for the ``*`` user-agent group.

    Mirrors urllib.robotparser's model: rules apply to the longest matching
    agent group; we keep only the ``*`` group (the reference always checks
    agent "*" — robots_handler.py:116). Missing/unfetchable robots → no
    rows → allow-all at join time (robots_handler.py:73-84).
    """
    rules: list[dict] = []
    if not content:
        return rules
    crawl_delay: float | None = None
    in_star_group = False
    seen_star_rules = False
    pos = 0
    for raw_line in content.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if seen_star_rules:
                in_star_group = False  # a later group starts; * group closed
            else:
                in_star_group = val == "*"
        elif key in ("allow", "disallow") and in_star_group:
            seen_star_rules = True
            allow = key == "allow"
            if val == "" and not allow:
                continue  # empty Disallow = allow everything → no rule
            rules.append(
                {"host": host, "rule_pos": pos, "pattern": val, "allow": allow,
                 "crawl_delay": None}
            )
            pos += 1
        elif key == "crawl-delay" and in_star_group:
            try:
                crawl_delay = float(val)
            except ValueError:
                pass
    if crawl_delay is not None:
        for r in rules:
            r["crawl_delay"] = crawl_delay
        if not rules:
            rules.append({"host": host, "rule_pos": 0, "pattern": "",
                          "allow": True, "crawl_delay": crawl_delay})
    return rules


def build_rules_df(spark, robots_docs: list[tuple[str, str | None]]) -> DataFrame:
    rows = []
    for host, content in robots_docs:
        rows.extend(parse_robots_txt(host, content))
    return spark.createDataFrame(rows, RULES_SCHEMA) if rows else spark.createDataFrame([], RULES_SCHEMA)


def build_rules_df_distributed(robots_docs: DataFrame) -> DataFrame:
    """Parse robots documents ON THE EXECUTORS — the 10^6-host path.

    The round-2 pipeline collected every robots.txt body to the driver and
    parsed them in a Python loop; at the 10^10-URL design point that is GBs
    of text through the driver and minutes of single-threaded parse.
    Parsing is row-local, so ``mapInPandas`` (no shuffle, no groupBy) turns
    the same ``parse_robots_txt`` into a distributed operator; only the
    compact rules rows ever leave the executors (they next feed the
    broadcast collapse in ``robots_allowed``).

    robots_docs: DataFrame with (host string, content string) columns.
    """
    import pandas as pd

    cols = [f.name for f in RULES_SCHEMA.fields]

    def _parse(batches):
        for pdf in batches:
            rows: list[dict] = []
            for host, content in zip(pdf["host"], pdf["content"]):
                rows.extend(
                    parse_robots_txt(host, content if content is not None else None)
                )
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: [] for c in cols})
            )

    return robots_docs.select("host", "content").mapInPandas(
        _parse, RULES_SCHEMA
    )


# Above this many distinct robots hosts the collapsed per-host rules table
# (array-of-structs row per host) can reach GBs; force-broadcasting it to
# every executor per cycle becomes the scale cliff. Hosts is the gate proxy
# because callers know it for free (one metadata count on the docs table)
# while the rules row count would need an extra pass over the parse.
BROADCAST_MAX_HOSTS = 250_000


def robots_allowed(
    frontier: DataFrame,
    rules: DataFrame,
    n_hosts: int | None = None,
    broadcast_max_hosts: int = BROADCAST_MAX_HOSTS,
) -> DataFrame:
    """Annotate frontier with ``robots_allowed`` and ``crawl_delay``.

    Rules collapse to one array-of-structs row per host (ordered by
    rule_pos) and join onto the frontier; the first-match verdict is a JVM
    higher-order ``filter(...)[0]`` over the ordered array —
    urllib.robotparser's first-matching-rule-in-file-order semantics,
    whole-stage-codegen'd, no Python.

    SIZE-GATED broadcast (north_rule's "broadcast join" is the gated
    default): with ``n_hosts`` at or under ``broadcast_max_hosts`` the
    collapsed table broadcasts — zero frontier shuffles. Above it (the
    10^6-10^7-host design point) the join runs as a plain shuffle join on
    ``host``: the frontier is host-keyed for politeness anyway, so the
    extra exchange is cheap, while shipping a multi-GB rules table to
    every executor is not. ``n_hosts=None`` (size unknown) keeps the
    broadcast for backward compatibility with small-world callers.
    """
    host_rules = rules.groupBy("host").agg(
        F.sort_array(
            F.collect_list(F.struct("rule_pos", "pattern", "allow"))
        ).alias("_rules"),
        F.max("crawl_delay").alias("crawl_delay"),
    )
    if n_hosts is None or n_hosts <= broadcast_max_hosts:
        host_rules = F.broadcast(host_rules)
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    first_match = F.get(  # null-safe: no matching rule → NULL → allow
        F.filter(
            F.col("_rules"),
            lambda r: (r["pattern"] == F.lit("")) | path.startswith(r["pattern"]),
        ),
        0,
    )
    return (
        frontier.join(host_rules, on="host", how="left")
        .withColumn(
            "robots_allowed",
            F.coalesce(first_match["allow"], F.lit(True)),
        )
        .drop("_rules")
    )


def sitemap_urls_from_robots(robots_docs: DataFrame) -> DataFrame:
    """Sitemap discovery from robots.txt ``Sitemap:`` directives
    (sitemaps.org protocol; the directive is group-independent and
    case-insensitive). BEYOND the reference — its robots handler only
    answers allow/deny (robots_handler.py) and its sitemap list is
    operator-configured; a from-scratch frontier should bootstrap
    un-configured hosts from the directive the protocol provides.

    One JVM projection (regexp_extract_all with inline (?im) flags —
    no UDF, no shuffle until the distinct), so it rides the same
    robots_docs scan the rules parse already makes. Returns distinct
    (host, sitemap_url) rows, feeding ``sitemap.expand`` as extra
    seeds."""
    pat = r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"
    return (
        robots_docs.select(
            "host",
            F.explode(
                F.regexp_extract_all(F.col("content"), F.lit(pat), 1)
            ).alias("sitemap_url"),
        )
        .distinct()
    )
