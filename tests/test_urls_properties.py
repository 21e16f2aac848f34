"""Property-based tests for the RFC 3986 canonicalizer core (pure
Python — no Spark session needed, so hypothesis can run hundreds of
examples cheaply)."""

import string

from hypothesis import given, settings, strategies as st

from spark_frontier.functions.urls import _canonicalize_one


_path_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "-._~!$&'()*+,;=:@%/ .",
    max_size=40,
)
_host = st.from_regex(r"[A-Za-z0-9]([A-Za-z0-9.\-]{0,20}[A-Za-z0-9])?",
                      fullmatch=True)
_url = st.builds(
    lambda scheme, host, port, path, query: (
        f"{scheme}://{host}{port}/{path}"
        + (f"?{query}" if query else "")
    ),
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    host=_host,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=_path_chars,
    query=_path_chars,
)


@settings(max_examples=300, deadline=None)
@given(_url)
def test_canonicalize_idempotent(url):
    """canon(canon(u)) == canon(u) — the defining property of a
    normalizer; a violation means the URL-seen set can dedup the same
    resource inconsistently across discovery rounds."""
    once = _canonicalize_one(url)
    assert _canonicalize_one(once) == once


@settings(max_examples=300, deadline=None)
@given(_url)
def test_canonicalize_invariants(url):
    """Structural invariants: lowercase scheme/host, no fragment, no
    default port, non-empty path, no '.'/'..' segments."""
    out = _canonicalize_one(url)
    assert "#" not in out
    scheme, rest = out.split("://", 1)
    assert scheme == scheme.lower()
    hostport = rest.split("/", 1)[0]
    host = hostport.rsplit(":", 1)[0] if ":" in hostport else hostport
    assert host == host.lower()
    # default ports are scheme-specific: :80 is default only for http,
    # :443 only for https — the other combinations must be preserved
    if scheme == "http":
        assert not hostport.endswith(":80")
    if scheme == "https":
        assert not hostport.endswith(":443")
    path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
    path = path.split("?", 1)[0]
    assert path.startswith("/")
    assert ".." not in path.split("/") and "." not in path.split("/")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_canonicalize_total(garbage):
    """Never raises on arbitrary input (frontier URLs come from regex
    fallbacks over arbitrary HTML — the canonicalizer must be total)."""
    _canonicalize_one(garbage)
    _canonicalize_one("http://example.com/" + garbage)
