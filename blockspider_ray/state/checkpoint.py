"""Per-shard checkpoint codec — the ``StateFile`` analog.

The reference persists {chainId, updated, cache:[last ≤128 blocks]} as
one JSON file after every sync round (/root/reference/state/state.go:28-32,
:83-96, save call crawler/blocks.go:95) and reloads it at boot
(cmd/blockspiderd/main.go:124-132). Here each shard writes
JSON-header + Parquet payloads, atomically (tmp + rename, like the
reference's WriteJsonFile; disk/disk.go:27-39), and a round is only
*committed* once every shard file exists — marked by a ``COMMIT`` file.
Resume loads the newest committed round; a crash between output emit and
commit re-runs that round, overwriting its idempotent round-keyed output
dirs (at-least-once with idempotent sinks — SURVEY.md §2.7).

Layout::

    ckpt_dir/round=R/shard-S.json              header {round, shard, lineage, updated_ms, ...}
    ckpt_dir/round=R/shard-S.frontier.parquet  queued urls
    ckpt_dir/round=R/shard-S.window.parquet    rollback window rows
    ckpt_dir/round=R/shard-S.seen.parquet      exact url_hash array (test scale)
    ckpt_dir/round=R/shard-S.cuckoo.bin        filter table bytes (scale path)
    ckpt_dir/round=R/COMMIT                    commit marker (written last)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import schemas
from .cuckoo import SeenSet
from .frontier import HostFrontier
from .window import RollbackWindow, WindowEntry


def _atomic_write(path: str, writer) -> None:
    tmp = path + ".tmp"
    writer(tmp)
    os.replace(tmp, path)


def round_dir(ckpt_dir: str, rnd: int) -> str:
    return os.path.join(ckpt_dir, f"round={rnd}")


def save_shard(
    ckpt_dir: str,
    rnd: int,
    shard: int,
    *,
    frontier: HostFrontier,
    window: RollbackWindow,
    seen: SeenSet,
    lineage: str,
    url_hash_of,
    host_hash_of,
) -> None:
    d = round_dir(ckpt_dir, rnd)
    os.makedirs(d, exist_ok=True)
    base = os.path.join(d, f"shard-{shard}")

    items = frontier.items_hashed()  # (priority, url, host, uh) deterministic order
    ftab = pa.table(
        {
            "priority": pa.array([p for p, _, _, _ in items], pa.int64()),
            "url": pa.array([u for _, u, _, _ in items], pa.string()),
            "host": pa.array([h for _, _, h, _ in items], pa.string()),
            "url_hash": pa.array(
                np.fromiter((x for _, _, _, x in items), dtype=np.uint64, count=len(items)), pa.uint64()
            ),
            "round_discovered": pa.array([0] * len(items), pa.int64()),
        },
        schema=schemas.CHECKPOINT_FRONTIER,
    )
    _atomic_write(base + ".frontier.parquet", lambda p: pq.write_table(ftab, p))

    ents = window.entries()
    wtab = pa.table(
        {
            "round": pa.array([e.round for e in ents], pa.int64()),
            "seq": pa.array([e.seq for e in ents], pa.int64()),
            "url": pa.array([e.url for e in ents], pa.string()),
            "host": pa.array([e.host for e in ents], pa.string()),
            "url_hash": pa.array([e.url_hash for e in ents], pa.uint64()),
            "priority": pa.array([e.priority for e in ents], pa.int64()),
            "digest": pa.array([e.digest for e in ents], pa.uint64()),
            "n_links": pa.array([e.n_links for e in ents], pa.int64()),
        },
        schema=schemas.CHECKPOINT_WINDOW,
    )
    _atomic_write(base + ".window.parquet", lambda p: pq.write_table(wtab, p))

    filter_bytes, exact_arr = seen.snapshot()
    stab = pa.table({"url_hash": pa.array(exact_arr, pa.uint64())})
    _atomic_write(base + ".seen.parquet", lambda p: pq.write_table(stab, p))

    def _wb(p):
        with open(p, "wb") as f:
            f.write(filter_bytes)

    _atomic_write(base + ".cuckoo.bin", _wb)

    header = {
        "round": rnd,
        "shard": shard,
        "lineage": lineage,
        "updated_ms": int(time.time() * 1000),
        "frontier_size": len(frontier),
        "window_size": len(window),
        "seen_size": len(seen),
    }

    def _wj(p):
        with open(p, "w") as f:
            json.dump(header, f, indent=1)

    _atomic_write(base + ".json", _wj)


def commit_round(ckpt_dir: str, rnd: int, nshards: int) -> None:
    d = round_dir(ckpt_dir, rnd)
    for s in range(nshards):
        assert os.path.exists(os.path.join(d, f"shard-{s}.json")), f"shard {s} missing"

    def _w(p):
        with open(p, "w") as f:
            f.write("ok")

    _atomic_write(os.path.join(d, "COMMIT"), _w)


def latest_committed_round(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if name.startswith("round=") and os.path.exists(os.path.join(ckpt_dir, name, "COMMIT")):
            r = int(name.split("=")[1])
            best = r if best is None else max(best, r)
    return best


def load_shard(ckpt_dir: str, rnd: int, shard: int, *, cuckoo_capacity: int, exact: bool = True):
    """Returns (frontier, window, seen, lineage, header)."""
    base = os.path.join(round_dir(ckpt_dir, rnd), f"shard-{shard}")
    with open(base + ".json") as f:
        header = json.load(f)

    frontier = HostFrontier()
    ftab = pq.read_table(base + ".frontier.parquet")
    for prio, url, host, uh in zip(
        ftab.column("priority").to_pylist(),
        ftab.column("url").to_pylist(),
        ftab.column("host").to_pylist(),
        ftab.column("url_hash").to_pylist(),
    ):
        frontier.push(host, url, prio, uh)

    window = RollbackWindow(limit=1 << 30)  # caller resets limit
    wtab = pq.read_table(base + ".window.parquet")
    for row in wtab.to_pylist():
        window.push(WindowEntry(**row))

    stab = pq.read_table(base + ".seen.parquet")
    exact_arr = np.asarray(stab.column("url_hash").to_numpy(zero_copy_only=False), dtype=np.uint64)
    with open(base + ".cuckoo.bin", "rb") as f:
        filter_bytes = f.read()
    seen = SeenSet.restore(filter_bytes, exact_arr, cuckoo_capacity, exact=exact)
    return frontier, window, seen, header["lineage"], header
