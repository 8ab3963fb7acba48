"""Checkpoint / resume conformance (SURVEY.md §5: "checkpoint taken at
round R/2 => remainder of crawl_log identical to the uninterrupted run")
— the StateFile resume analog (/root/reference/cmd/blockspiderd/main.go:124-132,
state/state.go:63-96)."""

import os

from blockspider_ray.config import CrawlConfig
from blockspider_ray.engine import CrawlEngine
from blockspider_ray.oracle import OracleCrawler
from blockspider_ray.state import checkpoint as ck


def cfg(max_rounds):
    return CrawlConfig(tokens_per_host_per_round=2, max_urls_per_round=500, shards=4, rollback_window=16, max_rounds=max_rounds)


class TestResume:
    def test_resume_matches_uninterrupted(self, tiny_fixture, tmp_path_factory):
        pages_dir, seeds = tiny_fixture
        R = 6

        # uninterrupted oracle reference
        olog, oseen = OracleCrawler(pages_dir, seeds, cfg(R)).run()

        work = str(tmp_path_factory.mktemp("resume"))
        out = os.path.join(work, "out")
        ckpt_dir = os.path.join(work, "ckpt")

        # phase 1: run half the rounds, checkpointing, then tear down
        eng1 = CrawlEngine(pages_dir, seeds, cfg(R // 2), out, ckpt_dir=ckpt_dir)
        eng1.run()
        eng1.shutdown()
        assert ck.latest_committed_round(ckpt_dir) == R // 2 - 1

        # phase 2: fresh engine resumes from the checkpoint
        eng2 = CrawlEngine(pages_dir, seeds, cfg(R), out, ckpt_dir=ckpt_dir, resume=True)
        assert eng2.start_round == R // 2
        eng2.run()
        elog, eseen = eng2.crawl_log(), eng2.seen_table()
        eng2.shutdown()

        assert elog.equals(olog), "resumed crawl_log != uninterrupted oracle"
        assert eseen.equals(oseen)

    def test_resume_overwrites_uncommitted_round(self, tiny_fixture, tmp_path_factory):
        """At-least-once: output written for a round that never committed
        must be overwritten on re-run, not duplicated (SURVEY.md §2.7)."""
        pages_dir, seeds = tiny_fixture
        work = str(tmp_path_factory.mktemp("resume2"))
        out = os.path.join(work, "out")
        ckpt_dir = os.path.join(work, "ckpt")

        eng1 = CrawlEngine(pages_dir, seeds, cfg(3), out, ckpt_dir=ckpt_dir)
        eng1.run()
        eng1.shutdown()
        # simulate a crash after round-3 output was written but before commit:
        # fabricate an orphan round dir
        orphan = os.path.join(out, "crawl_log", "round=3")
        os.makedirs(orphan, exist_ok=True)
        with open(os.path.join(orphan, "garbage.parquet"), "w") as f:
            f.write("not parquet")

        eng2 = CrawlEngine(pages_dir, seeds, cfg(4), out, ckpt_dir=ckpt_dir, resume=True)
        assert eng2.start_round == 3
        eng2.run()
        elog = eng2.crawl_log()
        eng2.shutdown()

        olog, _ = OracleCrawler(pages_dir, seeds, cfg(4)).run()
        assert elog.equals(olog)


class TestResumeAcrossMutation:
    def test_mutation_detected_after_resume(self, tiny_fixture, tmp_path_factory):
        """Checkpoint -> engine torn down -> pages mutated on disk ->
        fresh engine resumes: the resumed rollback window must detect the
        mutation and emit DROPPED (lineage/window state survives the
        restart — the StateFile-reload guarantee under a reorg that
        happened while the daemon was down)."""
        import shutil

        import pyarrow.compute as pc

        from blockspider_ray import gen

        pages_dir, seeds = tiny_fixture
        work = str(tmp_path_factory.mktemp("resmut"))
        mut_pages = f"{work}/pages"
        shutil.copytree(pages_dir, mut_pages)
        out, ckpt_dir = f"{work}/out", f"{work}/ckpt"

        eng1 = CrawlEngine(mut_pages, seeds, cfg(3), out, ckpt_dir=ckpt_dir)
        eng1.run()
        log1 = eng1.crawl_log()
        # pick victims still inside the rollback window (last accepted rows)
        acc = log1.filter(pc.equal(log1.column("status"), "ACCEPTED"))
        victims = acc.column("url").to_pylist()[-2:]
        eng1.shutdown()

        gen.apply_mutations(mut_pages, victims)

        eng2 = CrawlEngine(mut_pages, seeds, cfg(6), out, ckpt_dir=ckpt_dir, resume=True)
        assert eng2.start_round == 3
        eng2.run()
        log2 = eng2.crawl_log()
        eng2.shutdown()

        dropped = log2.filter(pc.equal(log2.column("status"), "DROPPED"))
        assert set(victims) <= set(dropped.column("url").to_pylist())
        # dropped rows carry the pre-mutation text
        for t in dropped.column("text").to_pylist():
            assert "MUTATED" not in t
        # and the victims were re-crawled with the new content
        r3plus = log2.filter(pc.greater_equal(log2.column("round"), 3))
        racc = r3plus.filter(pc.equal(r3plus.column("status"), "ACCEPTED"))
        retexts = {u: t for u, t in zip(racc.column("url").to_pylist(), racc.column("text").to_pylist())}
        for v in victims:
            assert v in retexts and "MUTATED" in retexts[v]
