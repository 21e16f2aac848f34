"""Spider-trap detection: structural URL heuristics that gate the
frontier before politeness scheduling.

The reference filters only by literal reject substrings
(src/crawler/frontier.py reject patterns → F9); at web scale the
frontier also needs the classic structural trap heuristics — calendar
traps, mirrored/repeated path segments, unbounded depth, query-param
explosions — or a single misconfigured site floods the frontier with
infinite URL families. Everything here is whole-stage-codegen JVM
expression algebra over the url column (split/filter/array ops — no
regex backtracking beyond two anchored patterns, no Python), so the gate
costs one projection on the discovery path (~4 µs/row measured) and is
exactly replayable by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_YEAR_RE = r"^(19|20)[0-9]{2}$"


def _components(url: Column) -> dict[str, Column]:
    """The five structural signals, shared by the flag and filter forms."""
    path = F.substring_index(
        F.regexp_replace(url, r"^https?://[^/]*", ""), "?", 1
    )
    query = F.when(
        url.contains("?"), F.substring_index(url, "?", -1)
    ).otherwise(F.lit(""))
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    return {
        "depth": F.size(segs),
        "n_dup_segs": F.size(segs) - F.size(F.array_distinct(segs)),
        "n_params": F.when(query == "", F.lit(0)).otherwise(
            F.size(F.split(query, "&"))
        ),
        "n_year_segs": F.size(
            F.filter(segs, lambda s: s.rlike(_YEAR_RE))
        ),
        "url_len": F.length(url),
    }


def _verdict(
    c: dict[str, Column],
    max_depth: int,
    max_dup_segs: int,
    max_params: int,
    max_len: int,
) -> Column:
    return (
        (c["depth"] > max_depth)
        | (c["n_dup_segs"] >= max_dup_segs)
        | (c["n_params"] > max_params)
        | (c["n_year_segs"] >= 2)
        | (c["url_len"] > max_len)
    )


def trap_ok(
    url_col,
    max_depth: int = 12,
    max_dup_segs: int = 2,
    max_params: int = 8,
    max_len: int = 512,
) -> Column:
    """True when the URL trips none of the trap heuristics — the filter
    form used on the discovery path (one predicate, no added columns)."""
    url = url_col if isinstance(url_col, Column) else F.col(url_col)
    return ~_verdict(
        _components(url), max_depth, max_dup_segs, max_params, max_len
    )


def trap_flags(
    df: DataFrame,
    url_col: str = "url",
    max_depth: int = 12,
    max_dup_segs: int = 2,
    max_params: int = 8,
    max_len: int = 512,
) -> DataFrame:
    """Adds per-URL trap columns and the combined ``is_trap`` verdict.

    - ``depth``: path segment count (> max_depth → runaway recursion)
    - ``n_dup_segs``: segments minus distinct segments (≥ max_dup_segs →
      mirror/loop traps like /a/b/a/b/a/b)
    - ``n_params``: query parameters (> max_params → faceted-search
      explosion)
    - ``n_year_segs``: 4-digit year segments (≥ 2 → calendar trap)
    - ``long_url``: len > max_len
    """
    c = _components(F.col(url_col))
    return df.select(
        "*",
        c["depth"].alias("depth"),
        c["n_dup_segs"].alias("n_dup_segs"),
        c["n_params"].alias("n_params"),
        c["n_year_segs"].alias("n_year_segs"),
        (c["url_len"] > max_len).alias("long_url"),
        _verdict(c, max_depth, max_dup_segs, max_params, max_len).alias(
            "is_trap"
        ),
    )
