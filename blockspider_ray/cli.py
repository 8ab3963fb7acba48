"""Command-line entry points — the ``blockspiderd`` daemon analog
(/root/reference/cmd/blockspiderd/main.go:62-142): parse config, boot or
resume from checkpoint, run crawl rounds, report stats.

Usage:
    python -m blockspider_ray.cli crawl --pages DIR --seeds FILE --out DIR \
        [--config CONFIG.json] [--ckpt DIR] [--resume] [--num-cpus N]
    python -m blockspider_ray.cli gen --size tiny|small|bench
    python -m blockspider_ray.cli consume --out DIR --ckpt DIR [--min-links N]

Owns its Ray session (scripts/CLIs are the only places allowed to call
ray.init — library code never does).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def cmd_crawl(args) -> int:
    ray = _init_ray(args.num_cpus)
    from .config import CrawlConfig
    from .engine import CrawlEngine

    cfg = CrawlConfig.from_json(args.config) if args.config else CrawlConfig()
    with open(args.seeds) as f:
        seeds = [ln.strip() for ln in f if ln.strip()]
    eng = CrawlEngine(args.pages, seeds, cfg, args.out, ckpt_dir=args.ckpt, resume=args.resume)
    if args.follow:
        rounds = eng.run_follow(interval_sec=args.interval, max_idle_ticks=args.max_idle)
    else:
        rounds = eng.run()
    stats = eng.stats()
    print(
        json.dumps(
            {
                "rounds": rounds,
                "urls": sum(m["scheduled"] + m["dropped"] for m in eng.metrics),
                "frontier": sum(s["frontier"] for s in stats),
                "seen": sum(s["seen"] for s in stats),
            }
        )
    )
    eng.shutdown()
    ray.shutdown()
    return 0


def cmd_gen(args) -> int:
    ray = _init_ray(args.num_cpus)
    from . import gen

    pages_dir, seeds = gen.ensure_fixture(args.size)
    print(json.dumps({"pages_dir": pages_dir, "n_seeds": len(seeds)}))
    ray.shutdown()
    return 0


def cmd_consume(args) -> int:
    ray = _init_ray(args.num_cpus)
    from .pipelines.consumer import committed_watermark, consume_crawl_log

    ds = consume_crawl_log(args.out, args.ckpt, min_links=args.min_links)
    print(
        json.dumps(
            {"rows": ds.count(), "watermark": committed_watermark(args.ckpt) if args.ckpt else None}
        )
    )
    ray.shutdown()
    return 0


def cmd_simd(args) -> int:
    """Serve a page store over JSON-RPC (the reorgd daemon analog,
    /root/reference/cmd/reorgd/main.go:255-271). No Ray session — the
    façade is pure stdlib."""
    from .sources.httpd import SimulatorHTTPD

    srv = SimulatorHTTPD(args.pages, port=args.port).start()
    print(json.dumps({"url": srv.url, "pages_dir": args.pages}), flush=True)
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.close()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="blockspider_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the distributed crawl (blockspiderd analog)")
    c.add_argument("--pages", required=True)
    c.add_argument("--seeds", required=True, help="file with one seed url per line")
    c.add_argument("--out", required=True)
    c.add_argument("--config", default=None)
    c.add_argument("--ckpt", default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--follow", action="store_true", help="daemon mode: poll the page store for changes (ticker analog)")
    c.add_argument("--interval", type=float, default=1.0, help="--follow poll interval seconds")
    c.add_argument("--max-idle", type=int, default=3, help="--follow: stop after this many idle polls")
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_crawl)

    g = sub.add_parser("gen", help="generate a deterministic pages fixture (reorgd analog)")
    g.add_argument("--size", default="tiny", choices=["tiny", "small", "bench", "bench4", "bench10"])
    g.add_argument("--num-cpus", type=int, default=None)
    g.set_defaults(fn=cmd_gen)

    n = sub.add_parser("consume", help="downstream crawl-log consumer (Kafka consumer analog)")
    n.add_argument("--out", required=True)
    n.add_argument("--ckpt", default=None)
    n.add_argument("--min-links", type=int, default=1)
    n.add_argument("--num-cpus", type=int, default=None)
    n.set_defaults(fn=cmd_consume)

    d = sub.add_parser("simd", help="serve a page store over JSON-RPC (reorgd daemon analog)")
    d.add_argument("--pages", required=True)
    d.add_argument("--port", type=int, default=8545)
    d.set_defaults(fn=cmd_simd)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
