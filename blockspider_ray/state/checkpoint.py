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
    lineage: str,
    seen_delta_hashes: np.ndarray,
    seen_delta_urls: list | None = None,
    seen_size: int = 0,
    cuckoo_bytes: bytes | None = None,
) -> None:
    d = round_dir(ckpt_dir, rnd)
    os.makedirs(d, exist_ok=True)
    base = os.path.join(d, f"shard-{shard}")

    items = frontier.items_unordered()  # restore is order-free (see HostFrontier.items_unordered)
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
    _atomic_write(base + ".frontier.parquet", lambda p: pq.write_table(ftab, p, compression="zstd", compression_level=1))

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
    _atomic_write(base + ".window.parquet", lambda p: pq.write_table(wtab, p, compression="zstd", compression_level=1))

    # seen-set persisted as PER-ROUND DELTAS (the set is append-only, so
    # round r's state = concat of deltas 0..r): a full dump per round at
    # 10^7+ urls would out-write the crawl log itself
    cols = {"url_hash": pa.array(np.asarray(seen_delta_hashes, dtype=np.uint64), pa.uint64())}
    if seen_delta_urls is not None:
        cols["url"] = pa.array(seen_delta_urls, pa.string())
    stab = pa.table(cols)
    _atomic_write(base + ".seen.parquet", lambda p: pq.write_table(stab, p, compression="zstd", compression_level=1))

    if cuckoo_bytes is not None:
        def _wb(p):
            with open(p, "wb") as f:
                f.write(cuckoo_bytes)

        _atomic_write(base + ".cuckoo.bin", _wb)

    header = {
        "round": rnd,
        "shard": shard,
        "lineage": lineage,
        "updated_ms": int(time.time() * 1000),
        "frontier_size": len(frontier),
        "window_size": len(window),
        "seen_size": int(seen_size),
        "seen_delta": int(len(seen_delta_hashes)),
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


def load_seen(ckpt_dir: str, upto_round: int, shard: int, *, exact: bool = True):
    """Reassemble one shard's seen-set at ``upto_round`` from the
    per-round delta files (all rounds <= upto_round are committed by the
    time a resume targets upto_round). Returns (hashes, urls, cuckoo_bytes)."""
    hashes = []
    urls: list = []
    for r in range(upto_round + 1):
        base = os.path.join(round_dir(ckpt_dir, r), f"shard-{shard}")
        p = base + ".seen.parquet"
        if not os.path.exists(p):
            continue
        t = pq.read_table(p)
        hashes.append(np.asarray(t.column("url_hash").to_numpy(zero_copy_only=False), dtype=np.uint64))
        if exact and "url" in t.column_names:
            urls.extend(t.column("url").to_pylist())
    h = np.concatenate(hashes) if hashes else np.array([], dtype=np.uint64)
    cuckoo_bytes = b""
    cb = os.path.join(round_dir(ckpt_dir, upto_round), f"shard-{shard}.cuckoo.bin")
    if os.path.exists(cb):
        with open(cb, "rb") as f:
            cuckoo_bytes = f.read()
    return h, urls, cuckoo_bytes


def load_shard(ckpt_dir: str, rnd: int, shard: int):
    """Returns (frontier, window, lineage, header); the seen-set is
    assembled separately via load_seen (delta files)."""
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

    return frontier, window, header["lineage"], header
