"""Deterministic synthetic crawl-world generator (seed=42) — FIXTURES.md.

Builds the hermetic "web" the engine crawls in tests and benchmarks:
sites, a sitemap tree per site (index → urlsets, with news-namespace,
text, gzip, malformed and cycle variants), fetchable pages that deliver
image+caption payloads (input_hint schema), robots.txt documents, and a
pre-populated URL-seen store. Everything derives from the seed — no
network, no external data.

Written as parquet via pyarrow directly (fast, no Spark needed to
generate); Spark reads them back. Scales to millions of URLs for the
benchmark by vectorizing URL/XML construction.
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
import os
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from spark_frontier.payload.codec import encode_image, phash64, synth_pixels

SEED = 42
NOW = datetime(2026, 8, 15, 12, 0, 0)  # fixed "now" for determinism

_ADJ = ["fast", "red", "old", "tall", "brave", "quiet", "sharp", "wide"]
_NOUN = ["striker", "keeper", "coach", "stadium", "derby", "record", "trophy", "season"]


def caption_for(i: int) -> str:
    return f"A {_ADJ[i % 8]} {_NOUN[(i // 8) % 8]} photo #{i}"


def gen_images(n: int, w: int = 32, h: int = 24) -> pd.DataFrame:
    """input_hint table: (image_id, bytes, w, h, fmt, caption, phash)."""
    fmts = ["png", "jpeg", "webp"]
    rows = []
    for i in range(n):
        fmt = fmts[i % 3]
        pixels = synth_pixels(i, w, h)
        rows.append(
            {
                "image_id": f"img-{i}",
                "bytes": encode_image(pixels, fmt),
                "w": np.int32(w),
                "h": np.int32(h),
                "fmt": fmt,
                "caption": caption_for(i),
                "phash": np.int64(phash64(pixels)),
            }
        )
    return pd.DataFrame(rows)


def gen_image_corpus(
    n_base: int = 24, n_var: int = 2, w: int = 32, h: int = 24
) -> pd.DataFrame:
    """Near-dup image corpus for the phash dedup operator: ``n_base``
    mutually-distant random bases (phash hamming ~32 apart) each with
    ``n_var`` lightly-perturbed variants (one small block re-noised →
    hamming ≤ ~6). Deterministic: seeded rng per base, so the decoded
    phashes are stable and the q35 DuckDB oracle can carry them as
    literals (the q23 plane-matrix pattern)."""
    fmts = ["png", "jpeg", "webp"]
    rows = []
    for i in range(n_base):
        rng = np.random.default_rng(1000 + i)
        base = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        group = [base]
        for v in range(n_var):
            pert = base.copy()
            ys, xs = (v * 7) % (h - 4), (v * 11) % (w - 4)
            block = pert[ys:ys + 4, xs:xs + 4].astype(np.int16)
            pert[ys:ys + 4, xs:xs + 4] = np.clip(
                block + rng.integers(-20, 21, block.shape), 0, 255
            ).astype(np.uint8)
            group.append(pert)
        for gi, px in enumerate(group):
            idx = i * (n_var + 1) + gi
            fmt = fmts[idx % 3]
            rows.append(
                {
                    "image_id": f"img-{idx:04d}",
                    "bytes": encode_image(px, fmt),
                    "w": np.int32(w),
                    "h": np.int32(h),
                    "fmt": fmt,
                    "caption": caption_for(idx),
                    "phash": np.int64(phash64(px)),
                }
            )
    return pd.DataFrame(rows)


def gen_sites(n_sites: int = 8) -> pd.DataFrame:
    rows = []
    for i in range(n_sites):
        rows.append(
            {
                "site_id": f"site-{i}",
                "site_seq": np.int32(i),
                "name": f"Site {i}",
                "domain": f"site{i}.example.com",
                "sitemap_url": f"https://site{i}.example.com/sitemap.xml",
                "is_active": i != n_sites - 1,  # last site inactive
                "site_type": "specific" if i % 3 == 0 else "general",
                "sport_focus": ["cricket", None, None][i % 3],
                "last_crawl_at": (NOW - timedelta(days=3)) if i % 4 == 2 else None,
            }
        )
    return pd.DataFrame(rows)


def _urlset_xml(urls: list[tuple[str, str | None]], news: bool = False) -> str:
    ns = ' xmlns:news="http://www.google.com/schemas/sitemap-news/0.9"' if news else ""
    parts = [f'<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"{ns}>']
    for loc, lastmod in urls:
        e = f"<url><loc>{loc}</loc>"
        if lastmod:
            if news:
                e += (
                    "<news:news><news:publication><news:name>Synth News</news:name>"
                    "</news:publication><news:publication_date>"
                    f"{lastmod}</news:publication_date><news:title>T</news:title></news:news>"
                )
            else:
                e += f"<lastmod>{lastmod}</lastmod>"
        e += "</url>"
        parts.append(e)
    parts.append("</urlset>")
    return "".join(parts)


def _index_xml(children: list[str], https_ns: bool = False) -> str:
    ns = "https" if https_ns else "http"
    parts = [
        f'<?xml version="1.0"?><sitemapindex xmlns="{ns}://www.sitemaps.org/schemas/sitemap/0.9">'
    ]
    for c in children:
        parts.append(f"<sitemap><loc>{c}</loc></sitemap>")
    parts.append("</sitemapindex>")
    return "".join(parts)


def _lastmod_for(j: int, rng: np.random.Generator) -> str | None:
    """Date spread: recent (≤2d), within-7d, old, undated, unparseable."""
    r = j % 10
    if r < 4:
        return (NOW - timedelta(hours=int(rng.integers(1, 47)))).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
    if r < 6:
        return (NOW - timedelta(days=int(rng.integers(3, 7)), hours=1)).strftime(
            "%Y-%m-%d"
        )
    if r < 8:
        return (NOW - timedelta(days=int(rng.integers(10, 60)))).strftime("%Y-%m-%d")
    if r == 8:
        return None
    return "not-a-date"


def gen_world(
    out_dir: str,
    n_sites: int = 8,
    urlsets_per_site: int = 3,
    urls_per_urlset: int = 40,
    n_images: int = 64,
    img_w: int = 32,
    img_h: int = 24,
    seen_frac: float = 0.3,
    hot_site: int = 1,
    hot_factor: int = 4,
) -> dict[str, str]:
    """Generate the full world into ``out_dir``; returns table paths.

    Site variety (FIXTURES.md F1/F2): site0 index→urlsets (one gzip child);
    site1 the HOT host (hot_factor× more urlsets — skew); site2 https-ns
    index + a cycle child; site3 news-namespace urlset; site4 text sitemap;
    site5 malformed XML (regex fallback); others plain. Reject-pattern URLs
    sprinkled at ~10%.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    sites = gen_sites(n_sites)
    images = gen_images(n_images, w=img_w, h=img_h)

    pages: list[dict] = []   # sitemap documents
    web: list[dict] = []     # fetchable article pages
    all_urls: list[tuple[str, int]] = []  # (url, global idx)
    gidx = 0

    for i in range(n_sites):
        host = f"site{i}.example.com"
        root = f"https://{host}/sitemap.xml"
        n_us = urlsets_per_site * (hot_factor if i == hot_site else 1)
        kind = i % 6

        def make_urls(us_j: int, count: int) -> list[tuple[str, str | None]]:
            nonlocal gidx
            out = []
            for k in range(count):
                if (k % 10) == 7:
                    url = f"https://{host}/category/list-{us_j}-{k}"  # reject pattern
                else:
                    url = f"https://{host}/article/{us_j:03d}-{k:05d}"
                out.append((url, _lastmod_for(gidx, rng)))
                all_urls.append((url, gidx))
                gidx += 1
            return out

        if kind == 4:  # text sitemap, flat
            lines = []
            for loc, lm in make_urls(0, urls_per_urlset):
                lines.append(f"{loc} {lm}" if lm else loc)
            pages.append({"sitemap_url": root, "content": "\n".join(lines).encode(),
                          "http_code": 200})
        elif kind == 5:  # malformed XML → regex fallback
            entries = make_urls(0, urls_per_urlset)
            body = "".join(
                f"<url><loc>{u}</loc>" + (f"<lastmod>{lm}</lastmod></url>" if lm else "</url>")
                for u, lm in entries
            )
            pages.append({"sitemap_url": root,
                          "content": f"<urlset>{body}".encode(),  # unclosed root
                          "http_code": 200})
        else:
            children = [f"https://{host}/sitemap-{j}.xml" for j in range(n_us)]
            if kind == 2:
                children.append(root)  # cycle back to the root (seen-set test)
            pages.append({"sitemap_url": root,
                          "content": _index_xml(children, https_ns=(kind == 2)).encode(),
                          "http_code": 200})
            for j in range(n_us):
                urls = make_urls(j, urls_per_urlset)
                xml = _urlset_xml(urls, news=(kind == 3))
                content = xml.encode()
                if kind == 0 and j == 0:
                    content = _gzip.compress(content)
                pages.append({"sitemap_url": f"https://{host}/sitemap-{j}.xml",
                              "content": content, "http_code": 200})

    # fetchable pages: each article URL delivers an image payload;
    # some 404/403/429 for the failure paths
    for url, g in all_urls:
        r = g % 25
        code = 200
        if r == 21:
            code = 404
        elif r == 22:
            code = 403
        elif r == 23:
            code = 429
        elif r == 24:
            code = 500
        web.append(
            {
                "url": url,
                "image_id": f"img-{g % n_images}",
                "caption": caption_for(g % n_images),
                "http_code": np.int32(code),
            }
        )

    # robots: site0 disallows /category/ and /private/; site2 has
    # crawl-delay 1; site6 has NO robots (allow-all); others allow all.
    robots = []
    for i in range(n_sites):
        host = f"site{i}.example.com"
        if i == 0:
            txt = "User-agent: *\nDisallow: /private/\nDisallow: /category/\nAllow: /\n"
        elif i == 2:
            txt = "User-agent: *\nCrawl-delay: 1\nDisallow: /video/\n"
        elif i == 6:
            continue
        else:
            txt = "User-agent: *\nDisallow:\n"
        robots.append({"host": host, "content": txt})

    # pre-seen store: deterministic 30% of article urls, some stale (>2d)
    seen = []
    for url, g in all_urls:
        if (g % 100) < int(seen_frac * 100) and "/article/" in url:
            digest = hashlib.sha256(url.encode()).hexdigest()
            seen.append(
                {
                    "url": url,
                    "url_hash": digest,
                    "host": url.split("/")[2],
                    "first_seen_at": NOW - timedelta(hours=(g % 96)),
                }
            )

    paths = {}
    frames = {
        "sites": sites,
        "images": images,
        "sitemap_pages": pd.DataFrame(pages),
        "web_pages": pd.DataFrame(web),
        "robots_docs": pd.DataFrame(robots),
        "url_seen": pd.DataFrame(
            seen,
            columns=["url", "url_hash", "host", "first_seen_at"],
        ),
    }
    for name, df in frames.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            p,
            coerce_timestamps="us",  # Spark cannot read TIMESTAMP(NANOS)
            allow_truncated_timestamps=True,
            row_group_size=65536,  # scan parallelism: splits stop at row
            # group boundaries, so big single-group files serialize reads
        )
        paths[name] = p
    return paths


def gen_corpus(out_dir: str, n_docs: int = 300_000) -> str:
    """Deterministic synthetic document corpus for the corpus-funnel
    benchmark (round-4 VERDICT item 6). Same spirit as ``gen_world``:
    seeded, generated vectorized with numpy/pyarrow (no Spark), cached
    on disk. The mix exercises every unconditional funnel stage at a
    realistic survival profile:

      - 4%  Spanish-stopword docs         → lang gate
      - 3%  repeated-token spam           → repetition gate
      - 5%  exact duplicates              → exact-dedup stage
      - 8%  near duplicates (small drift) → MinHash near-dup stage
      - 80% unique English docs           → survive to packing

    Every doc carries an English (or Spanish) stopword frame so lang-id
    and quality scoring do real work, plus ~60 unique hex-ish tokens so
    shingle sets are doc-specific (near-dup candidates stay ∝ true
    dups, as at web scale). Returns the parquet path.
    """
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "corpus_docs.parquet")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(SEED + 7)
    vocab = np.array([
        "".join(row)
        for row in rng.choice(list("abcdefghjkmnpqrstuvwxyz"),
                              size=(50_000, 6))
    ])
    words_per_doc = 60
    picks = rng.integers(0, len(vocab), size=(n_docs, words_per_doc))

    texts: list[str] = [""] * n_docs
    sources = np.where(rng.random(n_docs) < 0.8, "web", "books")
    spam_tail = "the spam and spam " + "spam " * 50
    for i in range(n_docs):
        m = i % 100
        # dup sources must land on UNIQUE-doc residues (25 for exact,
        # 26 for near): referencing i-1000/i-2000 directly preserves the
        # residue, so copies chained onto copies — 50-deep drift
        # families at 100k docs that exploded the near-dup pair count
        j_exact = i - (m - 11) * 1000 + (25 - m)   # ≡ 25 (mod 100)
        j_near = i - (m - 16) * 2000 + (26 - m)    # ≡ 26 (mod 100)
        if 12 <= m < 17 and 0 <= j_exact < i:
            texts[i] = texts[j_exact]                        # exact dup
        elif 17 <= m < 25 and 0 <= j_near < i:
            texts[i] = texts[j_near] + f" tiny drift {i}"    # near dup
        elif m < 4:
            body = " ".join(vocab[picks[i]])
            texts[i] = (f"el rio y la casa que esta en la colina con "
                        f"los arboles {body} de la finca numero {i}")
        elif 4 <= m < 7:
            texts[i] = spam_tail + f" tagged {i}"
        else:
            body = " ".join(vocab[picks[i]])
            texts[i] = (f"the story of part {i} is that {body} and in "
                        f"the end it was done there")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(sources.tolist()),
        }),
        path,
        row_group_size=2048,  # many row groups -> real scan parallelism
    )
    return path
