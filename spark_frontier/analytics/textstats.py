"""Text analysis operators over the documents table (training-data ops).

All JVM-side expressions (split/regexp/aggregate) — designed so every one
has an exact DuckDB-SQL oracle twin in __spark_entry__.py:

- token_count      whitespace tokens + a BPE-ish subword regex count
- quality_score    length / punctuation-ratio / stopword-ratio composite
- lang_id          stopword-hit n-gram heuristic (en/es/de/fr)
- fingerprint      md5 of normalized text (rolling-hash analogue that both
                   engines compute identically)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_frontier.analytics.dedup import normalize_text

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "ist", "im", "für"],
    "fr": ["le", "la", "et", "les", "des", "de", "un", "une", "dans", "est"],
}

BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col) -> F.Column:
    """Whitespace tokens of normalized text (empty string → empty array)."""
    s = normalize_text(col)
    return F.filter(F.split(s, r"\s+"), lambda t: t != "")


def token_count(col) -> F.Column:
    return F.size(tokens(col))


def subword_count(col) -> F.Column:
    """BPE-ish unit count: alpha runs + digit runs + single punctuation."""
    return F.size(
        F.filter(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0), lambda t: t != "")
    )


def punct_ratio(col) -> F.Column:
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?'\"]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col, lang: str = "en") -> F.Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(col) -> F.Column:
    """Composite ∈ [0,1]: length band + low punctuation + stopword presence
    (the classic cheap heuristics a pretraining filter runs first)."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    return ((len_score + punct_score + stop_score) / F.lit(3.0)).alias(
        "quality_score"
    )


def lang_id(col) -> F.Column:
    """Argmax of per-language stopword hits; 'und' (undetermined) when all
    zero. Deterministic tie-break by language code order (en<es<de<fr is
    resolved alphabetically: de, en, es, fr)."""
    toks = tokens(col)

    def _hits(sws):
        # single-arg lambda required: F.filter treats a 2-arg lambda as
        # (element, index), so a `sw=...` default would receive the index
        return F.size(F.filter(toks, lambda t: t.isin(*sws)))

    scores = [(lang, _hits(sws)) for lang, sws in sorted(STOPWORDS.items())]
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in scores]
    )
    best = F.get(
        F.array_sort(
            pairs,
            lambda a, b: F.when(a["score"] > b["score"], -1)
            .when(a["score"] < b["score"], 1)
            .when(a["lang"] < b["lang"], -1)
            .when(a["lang"] > b["lang"], 1)
            .otherwise(0),
        ),
        0,
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col) -> F.Column:
    """Deterministic 128-bit content fingerprint over normalized text."""
    return F.md5(normalize_text(col))
