"""Sitemap parse cascade as one Arrow mapInPandas operator.

Reimplements the reference's parser semantics (P1-P7 in SURVEY.md §2.2) —
/root/reference/src/sitemap/parser.py:63-302 — from scratch on stdlib
``xml.etree`` + regex (the sandbox has no lxml):

- gzip sniff + decode, utf-8 → latin-1 fallback   (fetcher.py:85-95)
- index detect: substring "<sitemapindex"          (parser.py:63-65)
- XML index  → (loc, lastmod) child-sitemap rows   (parser.py:67-101)
- XML urlset → (loc, lastmod, changefreq, priority)
  + Google-News (news_title, news_publication_date,
  news_publication_name)                           (parser.py:117-175)
- http/https namespace sniffing                    (parser.py:104-115)
- regex fallback over <url> blocks / bare <loc>    (parser.py:221-265)
- plain-text fallback: lines starting with http    (parser.py:177-219)
- cascade order: XML → regex → text, first non-empty wins (parser.py:267-302)
- lastmod parsed with dateutil, None on failure    (parser.py:36-44)

One fetched sitemap document → N entry rows, each tagged with
``sitemap_pos`` (document order — the crawl-ordering contract, SURVEY §3)
and ``is_index`` (drives the BFS expansion in ``sitemap/expand.py``).
"""

from __future__ import annotations

import gzip
import re
from collections.abc import Iterator
from datetime import datetime, timezone
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ENTRY_SCHEMA = StructType(
    [
        StructField("sitemap_url", StringType()),
        StructField("is_index", BooleanType()),
        StructField("loc", StringType()),
        StructField("lastmod", TimestampType()),
        StructField("changefreq", StringType()),
        StructField("priority", DoubleType()),
        StructField("news_title", StringType()),
        StructField("news_publication_date", TimestampType()),
        StructField("news_publication_name", StringType()),
        StructField("sitemap_pos", LongType()),
        StructField("parse_mode", StringType()),
    ]
)

_SM_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
_SM_NS_HTTPS = "https://www.sitemaps.org/schemas/sitemap/0.9"
_NEWS_NS = "http://www.google.com/schemas/sitemap-news/0.9"
_NEWS_NS_HTTPS = "https://www.google.com/schemas/sitemap-news/0.9"

_RE_URL_BLOCK = re.compile(r"<url[\s>].*?</url>", re.DOTALL | re.IGNORECASE)
_RE_LOC = re.compile(r"<loc[^>]*>\s*(.*?)\s*</loc>", re.DOTALL | re.IGNORECASE)
_RE_LASTMOD = re.compile(r"<lastmod[^>]*>\s*(.*?)\s*</lastmod>", re.DOTALL | re.IGNORECASE)


_DATE_MEMO: dict = {}
_DATE_MEMO_MAX = 1 << 16


def parse_date(raw: str | None):
    """dateutil-equivalent parse, None on failure (parser.py:36-44
    semantics). Naive-ized to UTC so Spark TimestampType comparisons are
    consistent.

    FAST PATH: ``datetime.fromisoformat`` (C, ~1 µs) handles the ISO-8601
    shapes that dominate real sitemaps (YYYY-MM-DD, RFC-3339 with Z or
    offset) and agrees with dateutil on every string it accepts; only the
    long tail (RFC-822 dates, '15 Aug 2026', ...) pays the ~40 µs dateutil
    call. At millions of lastmods per cycle the dateutil-always path was
    the single biggest cost of the parse stage.

    MEMO: lastmod strings repeat heavily inside a crawl batch (day-granular
    dates, a site's shared timestamps, and the unparseable junk strings
    that would otherwise pay the full dateutil-failure path per
    occurrence). parse_date is a pure function, so a bounded per-worker
    memo is exact; measured ~25× on the parse kernel's date share."""
    if not raw:
        return None
    s = raw.strip()
    hit = _DATE_MEMO.get(s, False)
    if hit is not False:
        return hit
    try:
        dt = datetime.fromisoformat(s)
    except (ValueError, TypeError):
        try:
            from dateutil import parser as dp

            dt = dp.parse(s)
        except (ValueError, OverflowError, TypeError):
            dt = None
    if dt is not None and dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    if len(_DATE_MEMO) >= _DATE_MEMO_MAX:
        _DATE_MEMO.clear()
    _DATE_MEMO[s] = dt
    return dt


def decode_content(raw: bytes | None) -> str:
    """gzip sniff (magic 1f 8b) then utf-8 → latin-1 fallback
    (fetcher.py:85-95)."""
    if raw is None:
        return ""
    if len(raw) >= 2 and raw[0] == 0x1F and raw[1] == 0x8B:
        try:
            raw = gzip.decompress(raw)
        except OSError:
            pass
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _tag(elem_tag: str) -> str:
    return elem_tag.rsplit("}", 1)[-1].lower()


def _parse_xml(content: str) -> tuple[list[dict], str] | None:
    """XML path of the cascade: returns (entries, mode) or None on failure.
    mode is 'xml-index' or 'xml-urlset'. Namespace-agnostic tag matching
    covers both http and https namespace variants (parser.py:104-115).

    FAST PATH: the common case is every child tag in the ROOT's namespace
    with standard lowercase names, so the loops first compare against the
    precomputed qualified names ('{ns}loc', ...) — ET interns tag strings,
    making that a near-pointer compare — and only unusual tags (other
    namespace, uppercase) fall back to the per-element ``_tag`` rsplit+
    lower, whose semantics are unchanged."""
    try:
        root = ET.fromstring(content.encode("utf-8"))
    except ET.ParseError:
        return None
    root_tag = _tag(root.tag)
    rt = root.tag
    ns = rt[: rt.rindex("}") + 1] if rt.startswith("{") else ""
    q_loc, q_lastmod = ns + "loc", ns + "lastmod"
    entries: list[dict] = []
    if root_tag == "sitemapindex":
        q_sitemap = ns + "sitemap"
        for child in root:
            if child.tag != q_sitemap and _tag(child.tag) != "sitemap":
                continue
            row = {"is_index": True}
            for f in child:
                ft = f.tag
                if ft == q_loc:
                    t = "loc"
                elif ft == q_lastmod:
                    t = "lastmod"
                else:
                    t = _tag(ft)
                if t == "loc":
                    row["loc"] = (f.text or "").strip()
                elif t == "lastmod":
                    row["lastmod"] = parse_date(f.text)
            if row.get("loc"):
                entries.append(row)
        return entries, "xml-index"
    if root_tag == "urlset":
        q_url = ns + "url"
        q_changefreq, q_priority = ns + "changefreq", ns + "priority"
        for child in root:
            if child.tag != q_url and _tag(child.tag) != "url":
                continue
            row = {"is_index": False}
            for f in child:
                ft = f.tag
                if ft == q_loc:
                    t = "loc"
                elif ft == q_lastmod:
                    t = "lastmod"
                elif ft == q_changefreq:
                    t = "changefreq"
                elif ft == q_priority:
                    t = "priority"
                else:
                    t = _tag(ft)
                if t == "loc":
                    row["loc"] = (f.text or "").strip()
                elif t == "lastmod":
                    row["lastmod"] = parse_date(f.text)
                elif t == "changefreq":
                    row["changefreq"] = (f.text or "").strip()
                elif t == "priority":
                    try:
                        row["priority"] = float((f.text or "").strip())
                    except ValueError:
                        pass
                elif t == "news":  # google news extension block
                    for nf in f.iter():
                        nt = _tag(nf.tag)
                        if nt == "title":
                            row["news_title"] = (nf.text or "").strip()
                        elif nt == "publication_date":
                            row["news_publication_date"] = parse_date(nf.text)
                        elif nt == "name":
                            row["news_publication_name"] = (nf.text or "").strip()
            if row.get("loc"):
                entries.append(row)
        return entries, "xml-urlset"
    return None


def _parse_regex(content: str) -> list[dict]:
    """Regex fallback (parser.py:221-265): <url> blocks with loc/lastmod;
    else bare <loc> tags."""
    entries = []
    blocks = _RE_URL_BLOCK.findall(content)
    if blocks:
        for b in blocks:
            m = _RE_LOC.search(b)
            if not m:
                continue
            lm = _RE_LASTMOD.search(b)
            entries.append(
                {
                    "is_index": False,
                    "loc": m.group(1).strip(),
                    "lastmod": parse_date(lm.group(1)) if lm else None,
                }
            )
        return entries
    for m in _RE_LOC.finditer(content):
        loc = m.group(1).strip()
        if loc:
            entries.append({"is_index": False, "loc": loc, "lastmod": None})
    return entries


def _parse_text(content: str) -> list[dict]:
    """Plain-text sitemap (parser.py:177-219): one URL per line, optional
    whitespace-separated lastmod."""
    entries = []
    for line in content.splitlines():
        line = line.strip()
        if not line.lower().startswith("http"):
            continue
        parts = line.split()
        entries.append(
            {
                "is_index": False,
                "loc": parts[0],
                "lastmod": parse_date(parts[1]) if len(parts) > 1 else None,
            }
        )
    return entries


def parse_sitemap_document(content: str) -> tuple[list[dict], str]:
    """The dispatcher cascade (parser.py:267-302): XML → regex → text,
    first non-empty result wins."""
    xml = _parse_xml(content)
    if xml is not None and xml[0]:
        return xml
    rx = _parse_regex(content)
    if rx:
        return rx, "regex"
    txt = _parse_text(content)
    if txt:
        return txt, "text"
    return [], "empty"


def parse_sitemaps(docs: DataFrame) -> DataFrame:
    """docs(sitemap_url string, content binary) → exploded ENTRY_SCHEMA rows.

    mapInArrow: each Arrow batch of documents parses in one Python call and
    the output columns are built as pyarrow arrays DIRECTLY from the python
    lists (one C conversion per column). The earlier mapInPandas shape paid
    ~10 s/world building pandas object frames (per-element object-array
    fills + datetime inference) that Arrow then re-converted; pa.array is
    ~10× cheaper for every type involved, and the input side avoids
    materializing a pandas Series of 100s of MB of document bytes.
    """
    import pyarrow as pa

    colnames = [f.name for f in ENTRY_SCHEMA.fields]
    _PA_TYPES = {
        "sitemap_url": pa.string(),
        "is_index": pa.bool_(),
        "loc": pa.string(),
        "lastmod": pa.timestamp("us"),
        "changefreq": pa.string(),
        "priority": pa.float64(),
        "news_title": pa.string(),
        "news_publication_date": pa.timestamp("us"),
        "news_publication_name": pa.string(),
        "sitemap_pos": pa.int64(),
        "parse_mode": pa.string(),
    }

    def _run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            urls = batch.column(0).to_pylist()
            contents = batch.column(1).to_pylist()
            cols: dict[str, list] = {c: [] for c in colnames}
            for sitemap_url, content in zip(urls, contents):
                text = decode_content(content)
                entries, mode = parse_sitemap_document(text)
                n = len(entries)
                cols["sitemap_url"].extend([sitemap_url] * n)
                cols["parse_mode"].extend([mode] * n)
                cols["sitemap_pos"].extend(range(n))
                g = lambda k: [e.get(k) for e in entries]  # noqa: E731
                cols["is_index"].extend(e.get("is_index", False) for e in entries)
                cols["loc"].extend(g("loc"))
                cols["lastmod"].extend(g("lastmod"))
                cols["changefreq"].extend(g("changefreq"))
                cols["priority"].extend(g("priority"))
                cols["news_title"].extend(g("news_title"))
                cols["news_publication_date"].extend(g("news_publication_date"))
                cols["news_publication_name"].extend(g("news_publication_name"))
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[c], type=_PA_TYPES[c]) for c in colnames],
                names=colnames,
            )

    return docs.select("sitemap_url", "content").mapInArrow(_run, ENTRY_SCHEMA)
