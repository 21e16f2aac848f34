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


def canonicalize_url(url_col) -> Column:
    """Vectorized RFC 3986 normalization (Arrow batches, never per-row Python
    at the DataFrame level). UDF is constructed lazily so importing this
    module never requires an active SparkSession."""
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _canon(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: _canonicalize_one(u) if u is not None else None)

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
