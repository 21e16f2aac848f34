"""Sport-category detection (V6-V9, SURVEY.md §2.5) — Spark-first.

Reference: /root/reference/src/article/category_detector.py:78-206.
Precedence (category_detector.py:144-206):

  1. site_focus      when site_type='specific'           (forced)
  2. URL path segment ∈ {configured cats, keyword-table keys, any keyword}
  3. URL pattern      /{cat} or -{cat} in path, else keyword regex
  4. content score    Σ \\b{kw}\\b counts over title+content[:2000],
                      argmax category, require score ≥ 3
  5. default          "sports"

Spark mapping: steps 1-3 are pure JVM expressions (explode+broadcast-join
for segments would also work; for a bounded keyword table a compiled
regex/`exists` chain avoids the shuffle entirely). Step 4 is a vectorized
pandas UDF (regex counting over Arrow batches) — or, SQL-side, a generated
``regexp_count`` expression used for the DuckDB oracle.

The keyword table itself is CONFIG DATA from the reference
(category_detector.py:24-69, config/sites.yaml:30-46), reproduced because
behavior parity requires the same vocabulary.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

CATEGORY_KEYWORDS: dict[str, list[str]] = {
    "nfl": [
        "nfl", "football", "touchdown", "quarterback", "gridiron", "super bowl",
        "afc", "nfc", "cowboys", "chiefs", "eagles", "49ers", "packers", "bears",
        "giants", "steelers", "patriots", "bills", "dolphins", "jets", "ravens",
        "bengals", "browns", "titans", "colts", "jaguars", "texans", "broncos",
        "raiders", "chargers", "vikings", "lions", "buccaneers", "saints",
        "panthers", "falcons", "seahawks", "rams", "cardinals", "commanders",
        "interception", "sack", "fumble", "end zone", "linebacker",
        "wide receiver", "tight end", "running back", "nfl draft", "combine",
        "playoffs", "wild card",
    ],
    "soccer": [
        "soccer", "premier league", "la liga", "bundesliga", "serie a",
        "ligue 1", "mls", "champions league", "europa league", "fifa", "uefa",
        "world cup", "euro", "copa america", "goal", "striker", "midfielder",
        "defender", "goalkeeper", "clean sheet", "hat-trick", "penalty", "var",
        "offside", "free kick", "corner kick", "red card", "yellow card",
        "messi", "ronaldo", "mbappe", "haaland", "liverpool", "arsenal",
        "manchester united", "manchester city", "chelsea", "tottenham",
        "real madrid", "barcelona", "bayern munich", "juventus", "psg",
        "inter miami", "al nassr",
    ],
    "basketball": [
        "basketball", "nba", "wnba", "ncaa", "euroleague", "fiba",
        "three-pointer", "dunk", "layout", "rebound", "assist", "steal",
        "block", "free throw", "point guard", "shooting guard", "small forward",
        "power forward", "center", "lakers", "warriors", "celtics", "bulls",
        "knicks", "heat", "spurs", "mavericks", "suns", "nuggets", "bucks",
        "sixers", "nets", "clippers", "rockets", "lebron", "curry", "durant",
        "giannis", "jokic", "doncic", "tatum", "embiid", "playoffs", "finals",
        "march madness", "draft",
    ],
    "cricket": [
        "cricket", "ipl", "bbl", "psl", "cpl", "icc", "bcci", "ecb", "ca",
        "test match", "odi", "t20", "twenty20", "ashes", "world cup", "wicket",
        "bowler", "batsman", "all-rounder", "century", "fifty", "sixer", "four",
        "lbw", "drs", "stumped", "run out", "spin", "pace", "seam", "googly",
        "yorker", "kohli", "rohit", "dhoni", "babar", "smith", "cummins",
        "stokes", "williamson", "mumbai indians", "csk", "rcb", "kkr",
    ],
    "mlb": [
        "baseball", "mlb", "milb", "world series", "al", "nl", "home run",
        "pitcher", "catcher", "batter", "hitter", "infielder", "outfielder",
        "strikeout", "era", "rbi", "whip", "ops", "inning", "bullpen", "dugout",
        "yankees", "dodgers", "red sox", "cubs", "cardinals", "giants", "mets",
        "phillies", "braves", "astros", "padres", "blue jays", "rays",
        "rangers", "orioles", "ohtani", "judge", "trout", "harper", "betts",
        "soto", "acuna",
    ],
}

# config/sites.yaml:30-46
CUSTOM_CATEGORIES = [
    "football", "soccer", "basketball", "cricket", "tennis", "baseball",
    "hockey", "golf", "rugby", "boxing", "mma", "f1", "motorsport",
    "athletics", "swimming", "olympics",
]

MIN_CONFIDENCE_SCORE = 3  # category_detector.py:72

_KEYWORD_TO_CAT: dict[str, str] = {}
for _cat, _kws in CATEGORY_KEYWORDS.items():
    for _kw in _kws:
        _KEYWORD_TO_CAT.setdefault(_kw, _cat)


def _segment_lookup(seg: str) -> str | None:
    """detect() step 2 per segment (category_detector.py:180-191)."""
    if seg in CUSTOM_CATEGORIES:
        return seg
    if seg in CATEGORY_KEYWORDS:
        return seg
    return _KEYWORD_TO_CAT.get(seg)


def detect_from_url_py(url: str) -> str | None:
    """detect_from_url (category_detector.py:78-103): /{cat} or -{cat} in
    path, else keyword regex with spaces → [-_/]."""
    from urllib.parse import urlparse

    path = urlparse(url).path.lower()
    for category, keywords in CATEGORY_KEYWORDS.items():
        if f"/{category}" in path or f"-{category}" in path:
            return category
        for keyword in keywords:
            if re.search(keyword.replace(" ", "[-_/]"), path):
                return category
    return None


def detect_from_content_py(title: str, content: str) -> str | None:
    """detect_from_content (category_detector.py:105-142): keyword count
    argmax with MIN_CONFIDENCE_SCORE gate. dict-order tie-break (python max)."""
    text = f"{title or ''} {(content or '')[:2000]}".lower()
    scores: dict[str, int] = {}
    for category, keywords in CATEGORY_KEYWORDS.items():
        s = 0
        for keyword in keywords:
            s += len(re.findall(r"\b" + re.escape(keyword) + r"\b", text))
        if s > 0:
            scores[category] = s
    if not scores:
        return None
    best = max(scores, key=scores.get)
    return best if scores[best] >= MIN_CONFIDENCE_SCORE else None


def detect_py(url: str, title: str, content: str,
              site_type: str | None = None, sport_focus: str | None = None) -> str:
    """Full precedence chain (category_detector.py:144-206)."""
    from urllib.parse import urlparse

    if (site_type or "").lower() == "specific" and sport_focus:
        return sport_focus
    path = urlparse(url).path.lower()
    for seg in [s for s in path.strip("/").split("/") if s]:
        hit = _segment_lookup(seg)
        if hit:
            return hit
    hit = detect_from_url_py(url)
    if hit:
        return hit
    hit = detect_from_content_py(title, content)
    if hit:
        return hit
    return "sports"


def detect_category(
    url: Column,
    title: Column,
    content: Column,
    site_type: Column,
    sport_focus: Column,
) -> Column:
    """Vectorized category detection (Arrow batches)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _detect(urls: pd.Series, titles: pd.Series, contents: pd.Series,
                stypes: pd.Series, focuses: pd.Series) -> pd.Series:
        return pd.Series(
            [
                detect_py(u or "", t, c, st, sf)
                for u, t, c, st, sf in zip(urls, titles, contents, stypes, focuses)
            ]
        )

    return _detect(url, title, content, site_type, sport_focus)


