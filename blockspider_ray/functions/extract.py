"""HTML text and link extraction kernels.

Crawl-domain analog of the reference's normalization kernel
``RawBlock.Convert`` (/root/reference/common/blocks.go:34-90): the single
wire->canonical transform whose output is pinned byte-for-byte by golden
tests (reference test: /root/reference/common/blocks_test.go:38-51).

``extract_text`` is THE byte-identity contract: the fixture generator
computes the ground-truth ``text`` column with this very function, and
both the sequential oracle and the distributed engine must reproduce it
byte-identically per url at any parallelism.

Pure python + compiled regexes; regexes are module-level so an actor or
task pays compilation once per process, not per batch.
"""

from __future__ import annotations

import hashlib
import html as _htmllib
import re

from .urls import canonicalize_url

_RE_SCRIPT = re.compile(rb"<(script|style)\b.*?</\1\s*>", re.I | re.S)
_RE_COMMENT = re.compile(rb"<!--.*?-->", re.S)
_RE_BLOCK = re.compile(
    rb"</?(?:p|div|br|li|ul|ol|h[1-6]|title|tr|table|section|article|header|footer|nav|blockquote)\b[^>]*>",
    re.I,
)
_RE_TAG = re.compile(rb"<[^>]*>")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")
_RE_HREF = re.compile(rb"""<a\b[^>]*?\bhref\s*=\s*["']([^"']+)["']""", re.I)
_RE_TITLE = re.compile(rb"<title[^>]*>(.*?)</title\s*>", re.I | re.S)


def extract_text(html: bytes) -> str:
    """Deterministic plain-text extraction from an HTML byte blob.

    Algorithm (fixed; any change breaks the byte-identity invariant):
      1. drop <script>/<style> blocks and comments
      2. block-level tags become newlines, all other tags vanish
      3. HTML entities are unescaped
      4. horizontal whitespace collapses to single spaces; lines are
         stripped; empty lines are dropped; lines join with "\\n"
    """
    if html is None:
        return ""
    b = _RE_SCRIPT.sub(b"", html)
    b = _RE_COMMENT.sub(b"", b)
    b = _RE_BLOCK.sub(b"\n", b)
    b = _RE_TAG.sub(b"", b)
    s = b.decode("utf-8", errors="replace")
    s = _htmllib.unescape(s)
    s = _RE_SPACES.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_title(html: bytes) -> str:
    m = _RE_TITLE.search(html or b"")
    if not m:
        return ""
    return extract_text(b"<p>" + m.group(1) + b"</p>")


def extract_links(html: bytes, base_url: str) -> list[str]:
    """Canonicalized out-links in document order (http/https only).

    Duplicates are preserved here (document order matters for golden
    link-count tests); frontier-side dedup happens at ingest, mirroring
    the reference's dedup-on-walk (/root/reference/crawler/blocks.go:133,146-150).
    """
    out: list[str] = []
    for m in _RE_HREF.finditer(html or b""):
        href = m.group(1).decode("utf-8", errors="replace")
        cu = canonicalize_url(_htmllib.unescape(href), base=base_url)
        if cu is not None:
            out.append(cu)
    return out


def content_digest(html: bytes) -> int:
    """64-bit content digest of the raw html blob (lineage / mutation
    detection — analog of the reference's block-hash identity used for
    reorg detection, /root/reference/crawler/blocks.go:105-129)."""
    if html is None:
        return 0
    return int.from_bytes(hashlib.blake2b(html, digest_size=8).digest(), "big")


_RE_ANCHOR = re.compile(
    rb"""<a\b[^>]*?\bhref\s*=\s*["']([^"']+)["'][^>]*>(.*?)</a\s*>""", re.I | re.S
)
# anchor labels are one-line link names: ALL whitespace (incl. newlines)
# collapses, unlike extract_text's horizontal-only _RE_SPACES
_RE_ALLSPACE = re.compile(r"\s+")


def extract_anchors(html: bytes, base_url: str) -> list[tuple[str, str]]:
    """(target-url, anchor-text) pairs in document order — the in-link
    labeling signal search/corpus pipelines aggregate per target (the
    reference's per-topic log-filter analog routes on payload fields
    the same way, /root/reference/crawler/blocks.go:202-228).

    Targets pass through the same canonicalization/scheme filter as
    ``extract_links``; anchor text is cleaned with the ``extract_text``
    whitespace contract (entities unescaped, inner tags dropped,
    horizontal runs collapsed, stripped). Empty-text anchors (image
    links, spacers) are dropped."""
    out: list[tuple[str, str]] = []
    for m in _RE_ANCHOR.finditer(html or b""):
        href = m.group(1).decode("utf-8", errors="replace")
        cu = canonicalize_url(_htmllib.unescape(href), base=base_url)
        if cu is None:
            continue
        body = _RE_TAG.sub(b"", m.group(2)).decode("utf-8", errors="replace")
        body = _RE_ALLSPACE.sub(" ", _htmllib.unescape(body)).strip()
        if body:
            out.append((cu, body))
    return out
