import gzip
from datetime import datetime

from spark_frontier.sitemap.parser import (
    decode_content,
    parse_date,
    parse_sitemap_document,
    parse_sitemaps,
)

URLSET = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://a.com/1</loc><lastmod>2026-08-14</lastmod>"
    "<changefreq>daily</changefreq><priority>0.8</priority></url>"
    "<url><loc>https://a.com/2</loc></url>"
    "</urlset>"
)

INDEX_HTTPS_NS = (
    '<?xml version="1.0"?>'
    '<sitemapindex xmlns="https://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc>https://a.com/s1.xml</loc><lastmod>2026-08-10</lastmod></sitemap>"
    "<sitemap><loc>https://a.com/s2.xml</loc></sitemap>"
    "</sitemapindex>"
)

NEWS = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9" '
    'xmlns:news="http://www.google.com/schemas/sitemap-news/0.9">'
    "<url><loc>https://n.com/x</loc><news:news>"
    "<news:publication><news:name>Pub</news:name></news:publication>"
    "<news:publication_date>2026-08-15T10:00:00Z</news:publication_date>"
    "<news:title>Headline</news:title></news:news></url></urlset>"
)

MALFORMED = (
    "<urlset><url><loc>https://m.com/a</loc><lastmod>2026-08-01</lastmod></url>"
    "<url><loc>https://m.com/b</loc></url>"  # unclosed root → XML parse fails
)
BARE_LOC = "<foo><loc>https://m.com/bare</loc>"
TEXT = "https://t.com/1 2026-08-14\nnot-a-url\nhttps://t.com/2\n"


def test_cascade_urlset():
    entries, mode = parse_sitemap_document(URLSET)
    assert mode == "xml-urlset"
    assert [e["loc"] for e in entries] == ["https://a.com/1", "https://a.com/2"]
    assert entries[0]["changefreq"] == "daily"
    assert entries[0]["priority"] == 0.8
    assert entries[0]["lastmod"] == datetime(2026, 8, 14)
    assert entries[1].get("lastmod") is None


def test_cascade_index_https_ns():
    entries, mode = parse_sitemap_document(INDEX_HTTPS_NS)
    assert mode == "xml-index"
    assert all(e["is_index"] for e in entries)
    assert entries[0]["loc"] == "https://a.com/s1.xml"


def test_cascade_news():
    entries, mode = parse_sitemap_document(NEWS)
    assert entries[0]["news_title"] == "Headline"
    assert entries[0]["news_publication_name"] == "Pub"
    assert entries[0]["news_publication_date"] == datetime(2026, 8, 15, 10, 0, 0)


def test_cascade_regex_fallback():
    entries, mode = parse_sitemap_document(MALFORMED)
    assert mode == "regex"
    assert [e["loc"] for e in entries] == ["https://m.com/a", "https://m.com/b"]
    assert entries[0]["lastmod"] == datetime(2026, 8, 1)
    bare, mode2 = parse_sitemap_document(BARE_LOC)
    assert mode2 == "regex" and bare[0]["loc"] == "https://m.com/bare"


def test_cascade_text():
    entries, mode = parse_sitemap_document(TEXT)
    assert mode == "text"
    assert [e["loc"] for e in entries] == ["https://t.com/1", "https://t.com/2"]
    assert entries[0]["lastmod"] == datetime(2026, 8, 14)


def test_gzip_and_latin1():
    assert decode_content(gzip.compress(b"<x>caf\xc3\xa9</x>")) == "<x>café</x>"
    assert decode_content(b"caf\xe9") == "café"  # latin-1 fallback


def test_parse_date_fallbacks():
    assert parse_date("2026-08-14T10:30:00+02:00") == datetime(2026, 8, 14, 8, 30)
    assert parse_date("garbage") is None
    assert parse_date(None) is None


def test_spark_parse_operator(spark):
    docs = spark.createDataFrame(
        [
            ("https://a.com/sitemap.xml", URLSET.encode()),
            ("https://a.com/gz.xml", gzip.compress(URLSET.encode())),
            ("https://n.com/news.xml", NEWS.encode()),
            ("https://m.com/bad.xml", MALFORMED.encode()),
            ("https://t.com/t.txt", TEXT.encode()),
            ("https://e.com/empty.xml", b"nothing here"),
        ],
        "sitemap_url string, content binary",
    )
    rows = parse_sitemaps(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["sitemap_url"], []).append(r)
    assert len(by_doc["https://a.com/sitemap.xml"]) == 2
    assert len(by_doc["https://a.com/gz.xml"]) == 2  # gzip transparently decoded
    assert by_doc["https://n.com/news.xml"][0]["news_title"] == "Headline"
    assert by_doc["https://m.com/bad.xml"][0]["parse_mode"] == "regex"
    assert by_doc["https://t.com/t.txt"][0]["parse_mode"] == "text"
    assert "https://e.com/empty.xml" not in by_doc
    # document order preserved via sitemap_pos
    a = sorted(by_doc["https://a.com/sitemap.xml"], key=lambda r: r["sitemap_pos"])
    assert [r["loc"] for r in a] == ["https://a.com/1", "https://a.com/2"]
