"""URL canonicalization, hashing, and host extraction.

The engine's dedup key is ``xxhash64(canonicalize(url))`` (north_rule);
the reference's SHA-256-hex-of-raw-URL key
(/root/reference/src/database/repository.py:92-94) is kept as a parity
column so the final URL-seen set can be compared byte-for-byte.

Everything that Spark can do JVM-side stays JVM-side (``xxhash64``,
``sha2``, ``parse_url`` — whole-stage codegen, no Python); only RFC 3986
normalization needs Python and runs as an Arrow-vectorized pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _canonicalize_one(url: str) -> str:
    """RFC 3986 syntax-based normalization.

    - lowercase scheme and host
    - drop default ports (:80 http, :443 https)
    - uppercase percent-encoding hex digits; decode unreserved characters
    - collapse dot-segments in the path
    - empty path -> "/"
    - drop fragment
    """
    from urllib.parse import quote, unquote, urlsplit, urlunsplit

    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    # decode then re-encode: unreserved chars come out decoded, reserved and
    # non-ascii get uppercase %XX (quote emits uppercase hex)
    path = quote(unquote(parts.path), safe="/:@!$&'()*+,;=~-._")
    # remove dot segments (RFC 3986 §5.2.4)
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
        else:
            out.append(seg)
    path = "/".join(out)
    if not path.startswith("/"):
        path = "/" + path
    query = quote(unquote(parts.query), safe="/:@!$&'()*+,;=~-._?&=")
    return urlunsplit((scheme, host, path, query, ""))


# URLs matching this are ALREADY canonical: lowercase scheme+host, no
# default-port suffix, non-empty path with no dot-segments or
# percent-escapes, no fragment. The vectorized regex check lets ~80-99% of
# real frontier URLs skip the per-URL urllib slow path entirely.
_FAST_CANONICAL = (
    r"^https?://"                      # lowercase scheme
    r"[a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?"  # lowercase reg-name host
    r"(?::\d+)?"                       # explicit port (validated below)
    r"/(?:[A-Za-z0-9\-._~!$&'()*+,;=:@/]*)"  # path, no %, no ./..
    r"(?:\?[A-Za-z0-9\-._~!$&'()*+,;=:@/?&=]+)?$"  # query non-empty, no %
)


def canonicalize_url(url_col) -> Column:
    """Vectorized RFC 3986 normalization (Arrow batches, never per-row Python
    at the DataFrame level). Already-canonical URLs (the overwhelming
    majority of a sitemap frontier) are detected with one vectorized regex
    and passed through; only the rest pay the per-URL urllib path. UDF is
    constructed lazily so importing this module never requires an active
    SparkSession."""
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _canon(urls: pd.Series) -> pd.Series:
        fast = urls.str.match(_FAST_CANONICAL, na=False)
        # any "/."-ish segment (./ ../ trailing /. /.. /.?q) and default
        # ports go to the slow path; uppercase hosts already fail the regex
        fast &= ~urls.str.contains("/.", regex=False)
        fast &= ~urls.str.contains(":80/", regex=False)
        fast &= ~urls.str.contains(":443/", regex=False)
        if fast.all():
            return urls
        out = urls.copy()
        slow = ~fast
        out[slow] = urls[slow].map(
            lambda u: _canonicalize_one(u) if u is not None else None
        )
        return out

    return _canon(url_col)


def url_key(url_col: Column) -> Column:
    """Engine dedup key: xxhash64 of the canonical URL (JVM-side hash)."""
    return F.xxhash64(canonicalize_url(url_col))


def url_key_canonical(canon_col: Column) -> Column:
    """xxhash64 over an already-canonicalized column (avoids re-normalizing)."""
    return F.xxhash64(canon_col)


def sha256_hex(url_col: Column) -> Column:
    """Reference-parity hash: SHA-256 hex of the RAW url
    (repository.py:92-94 hashes the exact string, no normalization)."""
    return F.sha2(url_col, 256)


def host_of(url_col: Column) -> Column:
    """Politeness/partition key: lowercased registrable host (JVM parse_url)."""
    return F.lower(F.parse_url(url_col, F.lit("HOST")))
