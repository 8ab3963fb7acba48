"""No-Ray hardware-ceiling control at a configurable shared-footprint.

The bench10 (10M-page, ~26 GB decoded store) scaling pair measures the
crawl engine at E(4->16) ~0.84 (round 3), short of the 0.9 target. The
round-3 analysis attributed the residual to the host's memory system at
the 26 GB random-gather working set — this tool MEASURES that ceiling
with zero Ray, zero Arrow, zero engine code, the bench10-footprint
analog of round 1's pure-compute control (BASELINE.md 'Hardware
ceiling').

Per simulated URL, each pinned worker process does exactly the crawl
hot path's DRAM traffic shape:

  * one random ~page-size read from a SHARED buffer of ``--gb`` GiB
    (the plasma store gather: fetch_batch's pc.take),
  * ``--scans`` linear passes over the copied page (extract reads the
    html and writes the text),
  * a fixed cache-resident compute loop calibrated by ``--compute-kb``
    x ``--compute-passes`` (the parse/regex/hash CPU between memory
    touches).

The buffer is faulted ONCE by the parent (the bench prepump analog) and
inherited read-only via fork, so all workers share one physical copy —
the same sharing structure as plasma. Workers are pinned to distinct
cores. Throughput = URLs/sec summed over workers; the tool runs the
worker counts given by ``--levels`` and prints one JSON line with
E(lo->hi) = thr_hi / ((hi/lo) * thr_lo).

Usage:
  python tools/hw_control.py --gb 26 --levels 4,16 --urls 60000
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np

PAGE = 1900  # mean fixture html size (bytes)


def worker(buf_np, core: int, n_urls: int, seed: int, scans: int,
           compute_kb: int, compute_passes: int, out_q) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    rng = np.random.default_rng(seed)
    n = len(buf_np) - PAGE
    # pre-draw indices so the RNG isn't in the timed loop
    idx = rng.integers(0, n, size=n_urls, dtype=np.int64)
    scratch = np.arange(compute_kb * 1024 // 8, dtype=np.int64)
    acc = 0
    t0 = time.time()
    for i in idx:
        page = buf_np[i : i + PAGE].copy()          # random gather (DRAM)
        for _ in range(scans):
            acc += int(page.sum(dtype=np.int64))    # linear scan (cache)
        for _ in range(compute_passes):              # cache-resident compute
            scratch *= 6364136223846793005
            scratch += 1442695040888963407
            acc ^= int(scratch[0])
    t1 = time.time()
    out_q.put((core, t0, t1, n_urls, acc & 1))


def run_level(buf_np, nworkers: int, urls_per_worker: int, scans: int,
              compute_kb: int, compute_passes: int) -> float:
    """Level throughput from the workers' OWN timed loops: total urls /
    (max in-worker end - min in-worker start). The driver wall includes
    process fork/start/join, an overhead that grows with worker count
    and so taxes the HIGH level more — biasing the reported ceiling
    efficiency downward (the ADVICE r4 finding on the load-bearing
    0.895). In-worker timestamps bracket exactly the gather/scan/compute
    loop."""
    q = mp.Queue()
    procs = [
        mp.Process(
            target=worker,
            args=(buf_np, c, urls_per_worker, 1000 + c, scans, compute_kb, compute_passes, q),
        )
        for c in range(nworkers)
    ]
    for p in procs:
        p.start()
    results = [q.get() for _ in range(nworkers)]  # drain BEFORE join: queue feeds block exit
    for p in procs:
        p.join()
    t_start = min(r[1] for r in results)
    t_end = max(r[2] for r in results)
    total_urls = sum(r[3] for r in results)
    return total_urls / max(t_end - t_start, 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=26.0)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--urls", type=int, default=60000, help="urls per worker per level")
    ap.add_argument("--scans", type=int, default=3)
    ap.add_argument("--compute-kb", type=int, default=48)
    ap.add_argument("--compute-passes", type=int, default=12)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    # fault the shared buffer once, parent-side (prepump analog); fork
    # shares the pages read-only with every worker
    nbytes = int(args.gb * (1 << 30))
    buf = np.ones(nbytes, dtype=np.uint8)  # ones: faulted, nonzero sums

    results = {}
    for nw in (hi, lo):  # high first, like bench.py --scaling
        thr = run_level(buf, nw, args.urls, args.scans, args.compute_kb, args.compute_passes)
        results[nw] = round(thr, 1)
        time.sleep(3)
    e = results[hi] / ((hi / lo) * results[lo])
    print(
        json.dumps(
            {
                "metric": "hw_control_urls_per_sec",
                "gb": args.gb,
                "pair": [lo, hi],
                f"thr_{lo}": results[lo],
                f"thr_{hi}": results[hi],
                "scaling_efficiency": round(e, 3),
                "scans": args.scans,
                "compute_kb": args.compute_kb,
                "compute_passes": args.compute_passes,
            }
        )
    )


if __name__ == "__main__":
    mp.set_start_method("fork")
    main()
