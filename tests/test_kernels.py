"""Unit tests for the pure kernels — mirrors the reference's codec tests
(/root/reference/util/hexutil_test pattern) and golden transform tests
(/root/reference/common/blocks_test.go:17-52)."""

import numpy as np

from blockspider_ray.functions.extract import content_digest, extract_links, extract_text, extract_title
from blockspider_ray.functions.robots import is_allowed, parse_robots
from blockspider_ray.functions.urls import canonicalize_url, hash64, hash64_one, url_host


class TestCanonicalize:
    def test_lowercase_scheme_host(self):
        assert canonicalize_url("HTTP://Host.Example/Path") == "http://host.example/Path"

    def test_default_port_stripped(self):
        assert canonicalize_url("http://h.example:80/x") == "http://h.example/x"
        assert canonicalize_url("https://h.example:443/x") == "https://h.example/x"
        assert canonicalize_url("http://h.example:8080/x") == "http://h.example:8080/x"

    def test_fragment_dropped(self):
        assert canonicalize_url("http://h.example/x#frag") == "http://h.example/x"

    def test_query_sorted(self):
        assert canonicalize_url("http://h.example/x?b=2&a=1") == "http://h.example/x?a=1&b=2"

    def test_empty_path(self):
        assert canonicalize_url("http://h.example") == "http://h.example/"

    def test_relative_resolution(self):
        assert canonicalize_url("/p/000003", base="http://h.example/p/000001") == "http://h.example/p/000003"
        assert canonicalize_url("sub", base="http://h.example/a/b") == "http://h.example/a/sub"

    def test_non_http_rejected(self):
        assert canonicalize_url("mailto:x@y.z") is None
        assert canonicalize_url("javascript:void(0)") is None
        assert canonicalize_url("ftp://h.example/f") is None

    def test_idempotent(self):
        u = canonicalize_url("HTTP://H.Example:80/x?b=2&a=1#f")
        assert canonicalize_url(u) == u


class TestHash:
    def test_deterministic(self):
        a = hash64(["http://a/x", "http://b/y"])
        b = hash64(["http://a/x", "http://b/y"])
        assert (a == b).all()
        assert a.dtype == np.uint64

    def test_known_value_stability(self):
        # pins the cross-process stability the sharded seen-set relies on
        assert hash64_one("http://a/x") == hash64_one("http://a/x")
        assert hash64_one("http://a/x") != hash64_one("http://a/y")


class TestExtract:
    HTML = (
        b"<html><head><title>My  Title</title><script>var x=1;</script>"
        b"<style>p{}</style></head><body><div>nav</div><p>Hello &amp; world.</p>"
        b'<p><a href="/p/000002">link a</a></p>'
        b'<p><a href="http://other.example/p/000009?b=2&a=1">link b</a></p>'
        b"<!-- comment --><div>footer</div></body></html>"
    )

    def test_text_golden(self):
        assert extract_text(self.HTML) == "My Title\nnav\nHello & world.\nlink a\nlink b\nfooter"

    def test_script_style_comment_removed(self):
        assert "var x" not in extract_text(self.HTML)
        assert "comment" not in extract_text(self.HTML)

    def test_title(self):
        assert extract_title(self.HTML) == "My Title"

    def test_links_canonical_in_order(self):
        links = extract_links(self.HTML, "http://h.example/p/000001")
        assert links == [
            "http://h.example/p/000002",
            "http://other.example/p/000009?a=1&b=2",
        ]

    def test_digest_changes_with_content(self):
        assert content_digest(self.HTML) != content_digest(self.HTML + b" ")
        assert content_digest(None) == 0

    def test_empty(self):
        assert extract_text(b"") == ""
        assert extract_links(b"", "http://h.example/") == []


class TestRobots:
    def test_parse_and_match(self):
        rules = parse_robots("User-agent: *\nDisallow: /p/00\n\nUser-agent: bot\nDisallow: /all\n")
        assert rules == ["/p/00"]
        assert not is_allowed("/p/001234", rules)
        assert is_allowed("/p/991234", rules)
        assert is_allowed("/q/000001", rules)

    def test_empty_disallow_is_allow_all(self):
        assert parse_robots("User-agent: *\nDisallow:\n") == []

    def test_comments_ignored(self):
        assert parse_robots("# hi\nUser-agent: *\nDisallow: /x # inline\n") == ["/x"]


def test_url_host():
    assert url_host("http://host-0001.example/p/000001") == "host-0001.example"


class TestCanonicalizeFastPath:
    """The fast paths in canonicalize_url must be byte-equivalent to the
    general (urllib) path for every href they accept."""

    def test_equivalence_on_generated_hrefs(self):
        import re
        from urllib.parse import urljoin, urlsplit, urlunsplit, parse_qsl, urlencode

        def slow(href, base=None):
            if base is not None:
                href = urljoin(base, href)
            parts = urlsplit(href)
            scheme = parts.scheme.lower()
            if scheme not in ("http", "https"):
                return None
            host = (parts.hostname or "").lower()
            if not host:
                return None
            port = parts.port
            netloc = host if (port is None or str(port) in ("80", "443")) else f"{host}:{port}"
            path = parts.path or "/"
            query = parts.query
            if query:
                query = urlencode(sorted(parse_qsl(query, keep_blank_values=True)))
            return urlunsplit((scheme, netloc, path, query, ""))

        import numpy as np

        rng = np.random.default_rng(123)
        bases = [f"http://host-{i:04d}.example/p/{j:06d}" for i, j in zip(range(20), range(20))]
        hrefs = []
        for i in range(500):
            h = f"http://host-{int(rng.integers(0,999)):04d}.example/p/{int(rng.integers(0,999999)):06d}"
            r = rng.random()
            if r < 0.2:
                h = f"/p/{int(rng.integers(0,999999)):06d}"
            elif r < 0.3:
                h += "#frag"
            elif r < 0.4:
                h += "?b=2&a=1"
            elif r < 0.45:
                h = h.replace("http://", "HTTP://").replace("host-", "Host-")
            elif r < 0.5:
                h = h + "//double//slash"
            hrefs.append(h)
        for base in bases[:5]:
            for h in hrefs:
                assert canonicalize_url(h, base) == slow(h, base), (h, base)
        for h in hrefs:
            if not h.startswith("/"):
                assert canonicalize_url(h) == slow(h), h


class TestUrlPath:
    """url_path must equal urlsplit-based parsing (path + '?query') on
    every canonical URL shape, including non-default ports and IPv6
    literals — the robots-matching defect class ADVICE.md flagged."""

    CASES = [
        "http://host-0001.example/p/000001",
        "http://host-0001.example/",
        "http://host-0001.example:8080/p/000001",
        "http://host-0001.example:8080/",
        "https://host.example:8443/a/b?x=1&y=2",
        "http://[::1]/p/1",
        "http://[::1]:8080/p/1",
        "http://host.example/p?q=/slashy",
    ]

    def test_equivalence(self):
        from urllib.parse import urlsplit

        from blockspider_ray.functions.urls import url_path

        for u in self.CASES:
            parts = urlsplit(u)
            want = parts.path or "/"
            if parts.query:
                want = f"{want}?{parts.query}"
            assert url_path(u) == want, u

    def test_port_path_robots(self):
        """Disallow prefixes must match URLs on non-default ports."""
        from blockspider_ray.functions.urls import url_path

        rules = parse_robots("User-agent: *\nDisallow: /p/00\n")
        assert not is_allowed(url_path("http://h.example:8080/p/001"), rules)
        assert is_allowed(url_path("http://h.example:8080/q/001"), rules)


class TestRouteHostFastPath:
    """The route stage's vectorized RE2 host extraction (with url_host
    fallback for rows the pattern rejects) must equal the url_host
    kernel on every canonical URL (shard keying identity)."""

    def test_equivalence(self):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        urls = [
            "http://host-0001.example/p/000001",
            "http://host-0001.example:8080/p/000001",
            "https://a.b.example/x",
            "http://[::1]/p/1",
            "http://[::1]:8080/p/1",
            "http://host.example/",
        ]
        flat = pa.array(urls, pa.string())
        # identical pattern + fallback to stages/links.py RouteLinks
        ex = pc.extract_regex(flat, pattern=r"^[^:]+://(?P<host>[^/:\[]+)")
        hosts = pc.struct_field(ex, "host").to_numpy(zero_copy_only=False)
        miss = pc.is_null(ex).to_numpy(zero_copy_only=False)
        for i in np.flatnonzero(miss):
            hosts[i] = url_host(urls[i])
        assert list(hosts) == [url_host(u) for u in urls]
        assert miss.tolist() == [False, False, False, True, True, False]

    def test_route_links_shard_keying_end_to_end(self, ray_session):
        """RouteLinks on a batch containing fast-path AND fallback URLs
        routes every link to hash64(url_host(url)) % nshards."""
        import numpy as np
        import pyarrow as pa
        import ray as _ray

        from blockspider_ray.functions.urls import hash64
        from blockspider_ray.stages.links import RouteLinks

        links = [
            "http://host-0001.example/p/000001",
            "http://[::1]/p/1",
            "https://a.b.example/x",
        ]

        @_ray.remote(num_cpus=0)
        class Sink:
            def __init__(self):
                self.rows = []

            def ingest(self, t):
                self.rows.append(t)

            def deliver(self, links, window):
                # mirrors ShardActor.deliver (fused per-batch RPC)
                if links is not None:
                    self.ingest(links)

            def got(self):
                import pyarrow as pa2

                return pa.concat_tables(self.rows) if self.rows else None

        ns = "test-route-ns"
        nshards = 4
        sinks = [Sink.options(name=f"{ns}-shard-{s}", namespace=None).remote() for s in range(nshards)]
        batch = pa.table(
            {
                "round": pa.array([0], pa.int64()),
                "seq": pa.array([0], pa.int64()),
                "url": pa.array(["http://src.example/"], pa.string()),
                "host": pa.array(["src.example"], pa.string()),
                "url_hash": pa.array(hash64(["http://src.example/"]), pa.uint64()),
                "priority": pa.array([0], pa.int64()),
                "shard": pa.array([0], pa.int64()),
                "status": pa.array(["MISSING"], pa.string()),
                "digest": pa.array([0], pa.uint64()),
                "n_links": pa.array([len(links)], pa.int64()),
                "links": pa.array([links], pa.list_(pa.string())),
            }
        )
        RouteLinks(ns, nshards)(batch)
        got = {}
        for s in range(nshards):
            t = _ray.get(sinks[s].got.remote())
            if t is not None:
                for u, h in zip(t.column("url").to_pylist(), t.column("host").to_pylist()):
                    got[u] = (s, h)
        for u in links:
            h = url_host(u)
            assert got[u] == (int(hash64([h])[0]) % nshards, h), u
        for s in sinks:
            _ray.kill(s)


class TestDisplayHelpers:
    """util.go:28-51,103-115 analogs (display-only; exact-decimal
    divergence documented in functions/display.py)."""

    def test_from_wei(self):
        from blockspider_ray.functions.display import from_wei, from_wei_to_gwei

        assert from_wei("1000000000000000000") == "1"
        assert from_wei("1500000000000000000") == "1.5"
        assert from_wei("1") == "0.000000000000000001"
        assert from_wei("0") == "0"
        assert from_wei_to_gwei("1000000000") == "1"
        assert from_wei_to_gwei("2500000000") == "2.5"

    def test_float_to_string(self):
        from blockspider_ray.functions.display import float_to_string

        assert float_to_string(1.5) == "1.50000000"
        assert float_to_string(0.0) == "0.00000000"

    def test_big_float_to_string(self):
        from blockspider_ray.functions.display import big_float_to_string

        assert big_float_to_string("12", 2) == "12.00"
        assert big_float_to_string("12.5", 2) == "12.50"
        assert big_float_to_string("12.3456", 2) == "12.34"  # truncates, not rounds
        assert big_float_to_string("12.3456", 3) == "12.345"


class TestWebhookAuth:
    """HMAC push-ingest (cmd/transmuted/main.go:66-72,141-174 analog)."""

    def test_signature_roundtrip(self):
        from blockspider_ray.sources.webhook import sign_body, verify_signature

        body = b'{"seeds": ["http://h.example/"]}'
        key = b"secret-key"
        sig = sign_body(body, key)
        assert verify_signature(body, sig, key)
        assert not verify_signature(body + b" ", sig, key)
        assert not verify_signature(body, sig, b"other-key")
        assert not verify_signature(body, "deadbeef", key)

    def test_handle_filters_invalid(self):
        from blockspider_ray.sources.webhook import WebhookIngest, sign_body

        class Sink:
            def __init__(self):
                self.calls = []

            def append_seeds(self, seeds):
                self.calls.append(list(seeds))

        sink = Sink()
        wh = WebhookIngest(sink, b"k1")
        good = b'{"seeds": ["http://a.example/", "http://b.example/x"]}'
        r = wh.handle(good, sign_body(good, b"k1"))
        assert r["status"] == 200 and r["n_seeds"] == 2
        # bad signature: rejected, no state change
        r = wh.handle(good, "0" * 64)
        assert r["status"] == 400 and "signature" in r["error"]
        # valid signature, malformed payload: rejected
        bad = b'{"seeds": "notalist"}'
        r = wh.handle(bad, sign_body(bad, b"k1"))
        assert r["status"] == 400
        bad2 = b"not json"
        r = wh.handle(bad2, sign_body(bad2, b"k1"))
        assert r["status"] == 400
        assert sink.calls == [["http://a.example/", "http://b.example/x"]]
        assert wh.accepted == 1 and wh.rejected == 3
