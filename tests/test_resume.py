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
