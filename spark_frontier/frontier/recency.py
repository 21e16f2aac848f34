"""Recency filtering of frontier candidates (F2-F4, SURVEY.md §2.3).

Reference: /root/reference/src/sitemap/tracker.py:149-237.

Semantics reproduced exactly:
- per-site cutoff = max(now - days, last_crawl_at)        (tracker.py:170-183)
- dated entries kept when coalesce(lastmod,
  news_publication_date) > cutoff                          (tracker.py:191-219)
- unparseable dates behave as "within window" — in our parsed schema an
  unparseable date is NULL, which routes the entry to the undated pool
  (tracker.py:134-135 returns True on parse failure)
- if a site has NO dated entries within the window, keep the LAST 100
  undated entries in sitemap order                         (tracker.py:227-234)

All pure DataFrame logic: the sites dimension is broadcast (it is tiny),
the undated-tail rule is a per-site window over the order-key columns.
The tail window partitions by site — bounded by per-site sitemap size
(≤ ~50k URLs in practice), not frontier size, so it holds at scale.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNDATED_TAIL = 100  # tracker.py:230


def filter_recent(
    entries: DataFrame,
    sites: DataFrame,
    days: int,
    now: datetime,
) -> DataFrame:
    """entries: sitemap url-rows with (site_id, lastmod,
    news_publication_date, depth, path, sitemap_pos, ...).
    sites: (site_id, last_crawl_at, ...) — broadcast dimension.
    """
    window_start = F.lit(now) - F.expr(f"INTERVAL {int(days)} DAYS")
    with_cutoff = entries.join(
        F.broadcast(sites.select("site_id", "last_crawl_at")), on="site_id", how="inner"
    ).withColumn(
        "cutoff",
        F.greatest(window_start, F.coalesce(F.col("last_crawl_at"), window_start)),
    )
    eff_date = F.coalesce(F.col("lastmod"), F.col("news_publication_date"))
    dated = with_cutoff.filter(eff_date.isNotNull())
    undated = with_cutoff.filter(eff_date.isNull())

    dated_kept = dated.filter(eff_date > F.col("cutoff"))

    # sites with zero dated survivors -> last-100 undated tail rule
    sites_with_dated = dated_kept.select("site_id").distinct()
    tail_w = Window.partitionBy("site_id").orderBy(
        F.col("depth").desc(), F.col("path").desc(), F.col("sitemap_pos").desc()
    )
    undated_tail = (
        undated.join(sites_with_dated, on="site_id", how="left_anti")
        .withColumn("_rn", F.row_number().over(tail_w))
        .filter(F.col("_rn") <= UNDATED_TAIL)
        .drop("_rn")
    )
    return dated_kept.unionByName(undated_tail).drop("cutoff", "last_crawl_at")


def is_within_days(date_col, days: int):
    """F3 (tracker.py:123-135): 0 <= (today - d).days <= days; NULL
    (unparseable) counts as within."""
    dd = F.datediff(F.current_date(), F.to_date(date_col))
    return date_col.isNull() | dd.between(0, days)


# F9 — URL reject-pattern filter (validator.py:58-75; config/sites.yaml:15-27)
REJECT_PATTERNS = [
    "/category/", "/tag/", "/tags/", "/live-score/", "/live-scores/",
    "/gallery/", "/galleries/", "/video/", "/videos/", "/author/",
    "/search/", "/page/",
]


def url_pattern_ok(url_col) -> F.Column:
    """True when the lowercased URL contains none of the reject substrings.
    One compiled JVM-side predicate — no Python."""
    import re as _re

    pattern = "|".join(_re.escape(p) for p in REJECT_PATTERNS)
    return ~F.lower(url_col).rlike(pattern)
