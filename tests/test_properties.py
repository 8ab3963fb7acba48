"""Property-based tests (hypothesis) — the property-style counterpart of
the reference's table-driven concurrency tests
(/root/reference/syncronizer/synchronizer_test.go:47-55): invariants that
must hold for ALL inputs, not just fixtures."""

import numpy as np
from hypothesis import given, settings, strategies as st

from blockspider_ray.functions.urls import canonicalize_url, hash64
from blockspider_ray.state.cuckoo import CuckooFilter, SeenSet
from blockspider_ray.state.frontier import HostFrontier
from blockspider_ray.state.window import RollbackWindow, WindowEntry

# --- URL canonicalization ---------------------------------------------------

_url_path = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="/._-~%"),
    max_size=30,
)
_host = st.from_regex(r"[a-z0-9][a-z0-9.-]{0,20}[a-z0-9]", fullmatch=True)


@st.composite
def hrefs(draw):
    kind = draw(st.integers(0, 4))
    host = draw(_host)
    path = draw(_url_path)
    if kind == 0:
        return f"http://{host}/{path}"
    if kind == 1:
        return f"/{path}"
    if kind == 2:
        return f"HTTP://{host.upper()}/{path}#frag{draw(st.integers(0, 9))}"
    if kind == 3:
        return f"http://{host}:{draw(st.integers(1, 9999))}/{path}?b=2&a=1"
    return draw(st.text(max_size=40))  # arbitrary garbage


class TestCanonicalizeProperties:
    @given(hrefs())
    @settings(max_examples=300, deadline=None)
    def test_idempotent(self, href):
        c = canonicalize_url(href, base="http://base.example/dir/page")
        if c is not None:
            assert canonicalize_url(c) == c

    @given(hrefs())
    @settings(max_examples=300, deadline=None)
    def test_no_fragment_and_lowercase_host(self, href):
        c = canonicalize_url(href, base="http://base.example/dir/page")
        if c is not None:
            assert "#" not in c
            host = c.split("/")[2]
            assert host == host.lower()
            assert c.startswith("http")


# --- cuckoo filter: NO false negatives, ever -------------------------------


class TestCuckooProperties:
    @given(st.lists(st.integers(0, (1 << 63) - 1), max_size=300, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_no_false_negatives(self, keys):
        cf = CuckooFilter(4096)
        inserted = [k for k in keys if cf.add(int(k))]
        for k in inserted:
            assert cf.contains(int(k))
        if inserted:
            arr = np.array(inserted, dtype=np.uint64)
            assert cf.contains_many(arr).all()

    @given(st.lists(st.integers(0, (1 << 63) - 1), max_size=200, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_exact_seenset_matches_python_set(self, keys):
        s = SeenSet(1024, exact=True)
        ref = set()
        for i in range(0, len(keys), 7):
            batch = np.array(keys[i : i + 7], dtype=np.uint64)
            # only add what's not present (engine contract)
            mask = ~s.contains_many(batch)
            s.add_many(batch[mask])
            ref.update(int(k) for k in batch)
        probe = np.array(keys + [1, 2, 3], dtype=np.uint64) if keys else np.array([1], dtype=np.uint64)
        got = s.contains_many(probe)
        want = np.array([int(k) in ref for k in probe])
        assert (got == want).all()
        assert len(s) == len(ref)


# --- frontier: pop order independent of insertion order ---------------------


class TestFrontierProperties:
    @given(
        st.lists(
            st.tuples(st.sampled_from(["a.x", "b.x", "c.x"]), st.integers(0, 5), st.integers(0, 999)),
            max_size=40,
        ),
        st.randoms(),
    )
    @settings(max_examples=100, deadline=None)
    def test_pop_round_insertion_order_invariant(self, entries, rnd):
        # engine contract: a url is pushed at most once while queued (the
        # finalize step dedups by url with min priority before pushing),
        # so mirror that here — the invariant under test is that PUSH
        # ORDER does not affect pop order
        dedup: dict = {}
        for h, p, i in entries:
            u = f"http://{h}/{i:03d}"
            if u not in dedup or p < dedup[u][2]:
                dedup[u] = (h, u, p)
        urls = list(dedup.values())
        shuffled = list(urls)
        rnd.shuffle(shuffled)

        f1, f2 = HostFrontier(), HostFrontier()
        for h, u, p in urls:
            f1.push(h, u, p)
        for h, u, p in shuffled:
            f2.push(h, u, p)
        assert f1.pop_round(2) == f2.pop_round(2)
        assert f1.pop_round(100) == f2.pop_round(100)

    @given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)), max_size=30))
    @settings(max_examples=100, deadline=None)
    def test_politeness_budget_respected(self, entries):
        f = HostFrontier()
        for p, i in entries:
            f.push("h.x", f"http://h.x/{i:03d}", p)
        popped = f.pop_round(3)
        assert len(popped) <= 3
        # popped in (priority, url) order
        keys = [(p, u) for p, _, u in popped]
        assert keys == sorted(keys)


# --- rollback window: bounded, newest-kept ---------------------------------


class TestWindowProperties:
    @given(st.lists(st.integers(0, 50), min_size=1, max_size=80), st.integers(1, 10))
    @settings(max_examples=100, deadline=None)
    def test_bounded_and_newest_kept(self, url_ids, limit):
        w = RollbackWindow(limit)
        for seq, uid in enumerate(url_ids):
            w.push(WindowEntry(0, seq, f"u{uid}", "h", uid, 0, seq, 0))
        assert len(w) <= limit
        # every surviving entry carries the LATEST seq seen for its url
        last_seq = {}
        for seq, uid in enumerate(url_ids):
            last_seq[f"u{uid}"] = seq
        for e in w.entries():
            assert e.seq == last_seq[e.url]


# --- hashing: determinism and spread ---------------------------------------


class TestHashProperties:
    @given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=50, unique=True))
    @settings(max_examples=100, deadline=None)
    def test_hash64_stable_and_order_independent(self, values):
        a = hash64(values)
        b = hash64(list(reversed(values)))[::-1]
        assert (a == b).all()


class TestIntegerRingProperties:
    """The numpy uint64 sampling hashes and their HUGEINT SQL mirrors
    must agree for ALL non-negative doc_ids (the SWEEP only covers the
    fixture's id range); this evaluates the SQL expression in exact
    Python ints (what HUGEINT computes) against the vectorized path."""

    @given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_mixture_draw_matches_exact_int_arithmetic(self, ids_py):
        m32 = 1 << 32
        ids = np.array(ids_py, dtype=np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(m32)
        u = ((h ^ (h >> np.uint64(16))) * np.uint64(2246822519)) % np.uint64(m32)
        draw = (u % np.uint64(10000)).astype(np.int64)
        for i, d in enumerate(ids_py):
            h_i = ((d % m32) * 2654435761) % m32
            u_i = ((h_i ^ (h_i // 65536)) * 2246822519) % m32
            assert draw[i] == u_i % 10000

    @given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_hash_split_bucket_matches_exact_int_arithmetic(self, ids_py):
        ids = np.array(ids_py, dtype=np.uint64)
        b = (((ids * np.uint64(2654435761)) % np.uint64(1 << 32)) % np.uint64(100)).astype(np.int64)
        for i, d in enumerate(ids_py):
            assert b[i] == (((d % (1 << 32)) * 2654435761) % (1 << 32)) % 100
