"""URL canonicalization and hashing kernels.

Crawl-domain analog of the reference's scalar codec layer
(/root/reference/util/util.go:53-97, util/hexutil.go:44-103): pure,
deterministic value transforms whose exact semantics are observable in
engine output and therefore pinned by tests.

Determinism contract:
  - ``canonicalize_url`` is a pure function of (href, base).
  - ``hash64`` uses pandas' SipHash-1-3 with the library's fixed default
    key, so values are stable across processes, machines and runs — the
    property the sharded seen-set and host partitioning rely on.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit, parse_qsl, urlencode

import numpy as np
from pandas.util import hash_array

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Fast paths for hrefs that are provably already canonical (or trivially
# resolvable): lowercase http scheme+host, no port/userinfo, a conservative
# path charset, no query/fragment. Equivalence with the slow path is pinned
# by tests (test_kernels: TestCanonicalizeFastPath) — the hot link-extract
# stage takes these for the vast majority of real links.
_FAST_ABS = re.compile(r"^http://[a-z0-9.-]+/[A-Za-z0-9._~%/-]*$")
_FAST_REL = re.compile(r"^/[A-Za-z0-9._~%/-]*$")
_FAST_BASE = re.compile(r"^(http://[a-z0-9.-]+)/")


def canonicalize_url(href: str, base: str | None = None) -> str | None:
    """Canonical form of a URL; None if it is not a crawlable http(s) URL.

    Rules (the engine-wide equivalence relation for the seen-set):
      - resolve relative hrefs against ``base``
      - lowercase scheme and host
      - drop the fragment
      - drop a default port (:80 for http, :443 for https)
      - sort query parameters by (key, value); drop an empty query
      - empty path -> "/"
    """
    # the fragment never survives nor influences resolution of the other
    # components (RFC 3986 §5.3), so strip it first — this lets
    # fragment-bearing hrefs take the fast paths below
    if "#" in href:
        href = href.split("#", 1)[0]
    if base is None:
        if _FAST_ABS.match(href):
            return href
    else:
        if _FAST_ABS.match(href):
            return href
        m = _FAST_BASE.match(base)
        if m is not None and _FAST_REL.match(href):
            return m.group(1) + href
    if base is not None:
        href = urljoin(base, href)
    try:
        parts = urlsplit(href)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    query = parts.query
    if query:
        pairs = sorted(parse_qsl(query, keep_blank_values=True))
        query = urlencode(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str) -> str:
    """Host (lowercased, no port) of an already-canonical URL."""
    return urlsplit(url).hostname or ""


def url_path(url: str) -> str:
    """Path (+ '?query' if any) of an already-canonical URL, for robots
    prefix matching.

    Fast slice: the first '/' after the '://' separator starts the path —
    exact for canonical URLs (no userinfo, no fragment, netloc cannot
    contain '/'), including non-default ports and IPv6 literals, where
    slicing after the host substring would keep ':port' in the path
    (the defect this kernel replaces). Equivalence with
    ``urlsplit``-based parsing is pinned by tests."""
    i = url.find("/", url.find("://") + 3)
    return url[i:] if i != -1 else "/"


def hash64(values) -> np.ndarray:
    """Deterministic 64-bit hash of a sequence of strings -> uint64 ndarray.

    SipHash-1-3 keyed with pandas' fixed default key; vectorized in cython.
    """
    arr = np.asarray(values, dtype=object)
    return hash_array(arr, categorize=False)


def hash64_one(value: str) -> int:
    return int(hash64([value])[0])


def shard_of(host_hash, nshards: int):
    """Shard id for a host hash: the engine's partitioning function.

    All URLs of one host land in one shard, so per-host politeness and
    ordering are decided by a single owner (analog of the reference's
    single serialized committer, /root/reference/syncronizer/synchronizer.go:12-36).
    """
    return host_hash % np.uint64(nshards) if isinstance(host_hash, np.ndarray) else int(host_hash) % nshards
