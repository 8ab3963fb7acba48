"""Unit tests for the stateful structures — mirrors the reference's
stack/state tests (/root/reference/cache/stack_test.go:7-151 incl. the
eviction-at-limit case, and disk roundtrip disk/disk_test.go:8-52)."""

import numpy as np
import pytest

from blockspider_ray.state.cuckoo import CuckooFilter, SeenSet
from blockspider_ray.state.frontier import HostFrontier, TokenBucket
from blockspider_ray.state.window import RollbackWindow, WindowEntry


class TestCuckooFilter:
    def test_add_contains(self):
        cf = CuckooFilter(1024)
        keys = np.random.default_rng(3).integers(0, 1 << 63, size=500, dtype=np.uint64)
        for k in keys:
            assert cf.add(int(k))
        for k in keys:
            assert cf.contains(int(k))

    def test_contains_many_vectorized(self):
        cf = CuckooFilter(1024)
        keys = np.random.default_rng(4).integers(0, 1 << 63, size=300, dtype=np.uint64)
        for k in keys:
            cf.add(int(k))
        assert cf.contains_many(keys).all()

    def test_false_positive_rate(self):
        cf = CuckooFilter(1 << 14)
        rng = np.random.default_rng(5)
        present = rng.integers(0, 1 << 62, size=1 << 13, dtype=np.uint64)
        for k in present:
            cf.add(int(k))
        absent = rng.integers(1 << 62, 1 << 63, size=20_000, dtype=np.uint64)
        fp = cf.contains_many(absent).mean()
        assert fp < 0.01, f"cuckoo FP rate too high: {fp}"

    def test_serialization_roundtrip(self):
        cf = CuckooFilter(1024)
        keys = [7, 42, 99, 123456789]
        for k in keys:
            cf.add(k)
        cf2 = CuckooFilter.from_bytes(cf.to_bytes(), 1024)
        for k in keys:
            assert cf2.contains(k)
        assert cf2.count == cf.count


class TestSeenSet:
    def test_exact_mode_authoritative(self):
        s = SeenSet(1024, exact=True)
        s.add_many(np.array([1, 2, 3], dtype=np.uint64))
        got = s.contains_many(np.array([1, 2, 3, 4], dtype=np.uint64))
        assert got.tolist() == [True, True, True, False]
        assert len(s) == 3

    def test_snapshot_restore(self):
        s = SeenSet(1024, exact=True)
        s.add_many(np.array([10, 20, 30], dtype=np.uint64))
        fb, arr = s.snapshot()
        s2 = SeenSet.restore(fb, arr, 1024, exact=True)
        assert s2.contains_many(np.array([10, 20, 30], dtype=np.uint64)).all()
        assert len(s2) == 3


class TestHostFrontier:
    def test_pop_order_priority_then_url(self):
        f = HostFrontier()
        f.push("h", "http://h/b", 1)
        f.push("h", "http://h/a", 1)
        f.push("h", "http://h/z", 0)
        got = f.pop_host("h", 10)
        assert got == [(0, "http://h/z"), (1, "http://h/a"), (1, "http://h/b")]

    def test_queued_dedup(self):
        f = HostFrontier()
        assert f.push("h", "http://h/a", 1)
        assert not f.push("h", "http://h/a", 0)
        assert len(f) == 1

    def test_pop_round_politeness_and_host_order(self):
        f = HostFrontier()
        for i in range(5):
            f.push("b.example", f"http://b.example/{i}", 0)
            f.push("a.example", f"http://a.example/{i}", 0)
        got = f.pop_round(2)
        assert [h for _, h, _ in got] == ["a.example", "a.example", "b.example", "b.example"]
        assert len(f) == 6

    def test_pop_round_quota_equals_sorted_prefix(self):
        """pop_round_quota is bit-equivalent to the sort-based form:
        sorted(pop_round_hashed(t))[:quota] for the output, and identical
        frontier state afterwards (the lazy merge pops only quota+hosts
        entries, but what it leaves queued must be the same set)."""
        import random

        rng = random.Random(7)
        urls = [
            (f"h{rng.randrange(12)}.example", f"http://x/{i}", rng.randrange(4), rng.getrandbits(63))
            for i in range(300)
        ]
        for tokens, quota in [(3, 10), (2, 0), (5, 17), (1, 1000)]:
            fa, fb = HostFrontier(), HostFrontier()
            for h, u, p, uh in urls:
                fa.push(h, u, p, uh)
                fb.push(h, u, p, uh)
            ref = sorted(fa.pop_round_hashed(tokens), key=lambda t: (t[0], t[1], t[2]))
            for p, h, u, uh in ref[quota:]:
                fa.push(h, u, p, uh)
            ref = ref[:quota]
            got = fb.pop_round_quota(tokens, quota)
            assert got == ref
            assert sorted(fa.items_hashed()) == sorted(fb.items_hashed())
            assert len(fa) == len(fb)

    def test_insert_order_independence(self):
        import itertools

        urls = [("h", f"http://h/{c}", p) for c, p in [("a", 2), ("b", 0), ("c", 1)]]
        results = []
        for perm in itertools.permutations(urls):
            f = HostFrontier()
            for h, u, p in perm:
                f.push(h, u, p)
            results.append(f.pop_host("h", 10))
        assert all(r == results[0] for r in results)


class TestTokenBucket:
    def test_basic(self):
        tb = TokenBucket(2, 1.0, now=0.0)
        assert tb.try_acquire(1, now=0.0)
        assert tb.try_acquire(1, now=0.0)
        assert not tb.try_acquire(1, now=0.0)
        assert tb.try_acquire(1, now=1.5)


class TestRollbackWindow:
    def _e(self, rnd, seq, url):
        return WindowEntry(rnd, seq, url, "h", 1, 0, 99, 0)

    def test_eviction_at_limit(self):
        w = RollbackWindow(3)
        for i in range(5):
            w.push(self._e(0, i, f"u{i}"))
        assert len(w) == 3
        assert [e.url for e in w.entries()] == ["u2", "u3", "u4"]

    def test_recrawl_replaces(self):
        w = RollbackWindow(3)
        w.push(self._e(0, 0, "a"))
        w.push(self._e(0, 1, "b"))
        w.push(self._e(1, 5, "a"))
        assert [e.url for e in w.entries()] == ["b", "a"]
        assert w.entries()[1].round == 1

    def test_remove(self):
        w = RollbackWindow(3)
        w.push(self._e(0, 0, "a"))
        w.remove("a")
        assert len(w) == 0
        w.remove("missing")  # no-op


class TestCheckpointRoundtrip:
    def test_save_load_shard(self, tmp_path):
        from blockspider_ray.functions.urls import hash64
        from blockspider_ray.state import checkpoint as ck

        f = HostFrontier()
        f.push("h.example", "http://h.example/a", 1)
        f.push("g.example", "http://g.example/b", 0)
        w = RollbackWindow(4)
        w.push(WindowEntry(2, 7, "http://h.example/a", "h.example", 5, 1, 42, 3))
        s = SeenSet(1024, exact=True)
        s.add_many(np.array([5, 6], dtype=np.uint64))

        d = str(tmp_path / "ckpt")
        # two rounds of deltas: the seen-set reassembles from both
        ck.save_shard(
            d, 2, 0, frontier=f, window=w, lineage="before",
            seen_delta_hashes=np.array([5], dtype=np.uint64),
            seen_delta_urls=["http://h.example/a"], seen_size=1,
        )
        ck.save_shard(
            d, 3, 0, frontier=f, window=w, lineage="abc123",
            seen_delta_hashes=np.array([6], dtype=np.uint64),
            seen_delta_urls=["http://g.example/b"], seen_size=2,
        )
        ck.commit_round(d, 3, 1)
        assert ck.latest_committed_round(d) == 3

        f2, w2, lineage, header = ck.load_shard(d, 3, 0)
        assert lineage == "abc123"
        assert len(f2) == 2
        assert f2.pop_host("g.example", 1) == [(0, "http://g.example/b")]
        assert len(w2) == 1 and w2.entries()[0].digest == 42
        hashes, urls, _ = ck.load_seen(d, 3, 0, exact=True)
        assert sorted(hashes.tolist()) == [5, 6]
        assert sorted(urls) == ["http://g.example/b", "http://h.example/a"]
        s2 = SeenSet.restore(b"", hashes, 1024, exact=True)
        assert s2.contains_many(np.array([5, 6], dtype=np.uint64)).all()

    def test_uncommitted_round_invisible(self, tmp_path):
        from blockspider_ray.state import checkpoint as ck

        d = str(tmp_path / "ckpt")
        assert ck.latest_committed_round(d) is None

    def test_commit_requires_all_shards(self, tmp_path):
        from blockspider_ray.state import checkpoint as ck

        d = str(tmp_path / "ckpt")
        with pytest.raises(AssertionError):
            ck.commit_round(d, 0, 2)


class TestSeenSetOverflow:
    def test_approximate_mode_raises_on_saturation(self):
        s = SeenSet(16, exact=False)  # tiny filter: 4 buckets x 4 slots
        keys = np.arange(1, 20000, dtype=np.uint64)
        with pytest.raises(RuntimeError, match="saturated"):
            s.add_many(keys)
        assert s.overflow > 0
