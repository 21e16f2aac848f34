"""PII detection and redaction over text columns (training-data op).

A pretraining pipeline scrubs personally identifiable information before
anything else sees the bytes. At 100 TB that scrub must be a pure
JVM-side projection — one pass of `regexp_count`/`regexp_replace` inside
whole-stage codegen, no Python, no shuffle — which is exactly what this
module is: every pattern below is written in the common subset of Java
regex (Spark) and RE2 (DuckDB) — no lookaround, no backreferences — so
the DuckDB oracle in __spark_entry__.py replays it byte-for-byte.

Reference parity note: the reference crawler stores raw article text with
no scrub step; this operator is part of the LLM-data-pipeline surface the
graft adds on top (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied IN ORDER during redaction so a
# credit-card number is masked before the phone pattern could bite a
# fragment of it. Patterns use only \b / \d / classes / bounded repeats:
# identical semantics under Java regex and RE2.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ccn", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_count(col, pattern_name: str) -> Column:
    """Occurrences of one PII class in the ORIGINAL text (counts are
    taken before any redaction, so classes are counted independently)."""
    col = col if isinstance(col, Column) else F.col(col)
    for name, pat, _ in PII_PATTERNS:
        if name == pattern_name:
            return F.regexp_count(col, F.lit(pat))
    raise KeyError(pattern_name)


def scrub_pii(col) -> Column:
    """Redact every PII class, in PII_PATTERNS order."""
    out = col if isinstance(col, Column) else F.col(col)
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII counts + the redacted text.

    One projection — Catalyst fuses the four counts and the four chained
    replaces into a single whole-stage-codegen pass over the column; no
    shuffle, no UDF, safe at any scale.
    """
    counts = [
        pii_count(F.col(text_col), name).alias(f"n_{name}")
        for name, _, _ in PII_PATTERNS
    ]
    return df.select(
        "*", *counts, scrub_pii(F.col(text_col)).alias("clean_text")
    )


# ---------------------------------------------------------------------------
# keyword safety filter (blocklist gating, the C4 "bad words" stage)


# deliberately mild placeholder vocabulary: the operator contract (token
# matching, density thresholds, category rollup) is what's under test —
# a deployment swaps in its real blocklist via the parameter
SAFETY_KEYWORDS: dict[str, list[str]] = {
    "violence": ["attack", "destroy", "weapon"],
    "gambling": ["casino", "jackpot", "betting"],
    "spamlike": ["viagra", "lottery", "clickbait"],
}


def safety_flags(
    docs: DataFrame,
    keywords: dict[str, list[str]] | None = None,
    max_hit_frac: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocklist keyword gating (the C4 §2.2 "bad words" filter shape):
    per document, token hits per category, total hit density, and a
    drop flag when density exceeds ``max_hit_frac``.

    The blocklist inlines as literal JVM predicates (one
    whole-stage-codegen projection over the token array — no shuffle,
    no UDF, no join), which is the right plan at any corpus size
    because real blocklists are a few thousand words: far below
    broadcast thresholds, small enough for literal isin chains.
    Matching is exact-token on the normalized text (the q16 tokens), so
    a SQL oracle replays it verbatim — and substrings of clean words
    ("class" vs "ass") can never false-positive the way substring
    blocklists do."""
    kw = keywords if keywords is not None else SAFETY_KEYWORDS
    from spark_frontier.analytics.textstats import tokens

    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    n = F.size("_toks")
    cat_counts = [
        F.size(F.filter(F.col("_toks"), lambda t: t.isin(*words)))
        .alias(f"n_{cat}")
        for cat, words in sorted(kw.items())
    ]
    out = base.select(F.col(id_col), n.alias("n_tokens"), *cat_counts)
    total = sum(
        (F.col(f"n_{cat}") for cat in sorted(kw)), F.lit(0)
    )
    return out.select(
        "*",
        F.round(
            total / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"), 6
        ).alias("hit_frac"),
        (
            total / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
            > max_hit_frac
        ).alias("drop_doc"),
    )
