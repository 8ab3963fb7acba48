"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with metadata columns; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages (model/codec loaded once per actor in ``__init__``). The sandbox
has no image/audio codecs, so the DECODE step is stubbed: real codec
imports are attempted and, failing that, a deterministic synthetic codec
(matching the generator's payload layout) stands in — the Ray-side
plumbing (schemas, batch sizing for large binaries, actor signatures,
output layout) is real and tested.

Synthetic payload layout (the "codec" the stub understands):
  image: b"IMG1" + u16 width + u16 height + width*height gray bytes
  video: b"VID1" + u16 n_frames + u16 w + u16 h + n_frames frames of w*h
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | video
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_frames", pa.int32()),
    ]
)


def generate_media(n: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, ws, hs, nf = [], [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        if i % 4 == 3:
            frames = int(rng.integers(2, 9))
            body = rng.integers(0, 256, size=frames * w * h, dtype=np.uint8).tobytes()
            payloads.append(b"VID1" + struct.pack("<HHH", frames, w, h) + body)
            kinds.append("video")
            nf.append(frames)
        else:
            body = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
            payloads.append(b"IMG1" + struct.pack("<HH", w, h) + body)
            kinds.append("image")
            nf.append(1)
        ids.append(i)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": pa.array(nf, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def ensure_media_fixture(root: str = "/tmp/blockspider_ray_fixtures", n: int = 200) -> str:
    path = os.path.join(root, f"media-{n}.parquet")
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(generate_media(n), tmp)
        os.replace(tmp, path)
    return path


class MediaDecoder:
    """Actor-pool decode stage: codec state initialized ONCE per actor.

    Tries real codecs first (PIL / cv2 — absent in this container); the
    deterministic synthetic codec is the fallback. A payload neither
    understands raises NotImplementedError (clearly-marked stub path)."""

    def __init__(self):
        self.backend = "synthetic"
        try:  # pragma: no cover - not installed in this container
            import PIL.Image  # noqa: F401

            self.backend = "pil"
        except ImportError:
            pass

    def _decode(self, payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
        if payload[:4] == b"IMG1":
            w, h = struct.unpack("<HH", payload[4:8])
            px = np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8)
            return "image", w, h, 1, px
        if payload[:4] == b"VID1":
            f, w, h = struct.unpack("<HHH", payload[4:10])
            px = np.frombuffer(payload[10 : 10 + f * w * h], dtype=np.uint8)
            return "video", w, h, f, px
        raise NotImplementedError(
            "real image/audio decoding requires PIL/cv2 (not in this container); "
            "payload is not in the synthetic fixture layout"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        feats = {"media_id": ids, "kind": batch.column("kind")}
        means, stds, aspects = [], [], []
        for p in batch.column("payload").to_pylist():
            _, w, h, f, px = self._decode(p)
            means.append(float(px.mean()) if len(px) else 0.0)
            stds.append(float(px.std()) if len(px) else 0.0)
            aspects.append(round(w / h, 4))
        feats["mean_intensity"] = pa.array(np.round(means, 4), pa.float64())
        feats["std_intensity"] = pa.array(np.round(stds, 4), pa.float64())
        feats["aspect"] = pa.array(aspects, pa.float64())
        return pa.table(feats)


class FrameSampler:
    """Actor-pool frame-sample stage for video payloads: emit every k-th
    frame's summary (explode: one row per sampled frame)."""

    def __init__(self, stride: int = 2):
        self.stride = stride
        self.decoder = MediaDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_mean = [], [], []
        for mid, p, kind in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("kind").to_pylist(),
        ):
            if kind != "video":
                continue
            _, w, h, f, px = self.decoder._decode(p)
            frames = px.reshape(f, w * h)
            for fi in range(0, f, self.stride):
                out_id.append(mid)
                out_frame.append(fi)
                out_mean.append(round(float(frames[fi].mean()), 4))
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame": pa.array(out_frame, pa.int64()),
                "mean_intensity": pa.array(out_mean, pa.float64()),
            }
        )


def media_features(sf_dir: str) -> rd.Dataset:
    """Decode + feature-extract over the media table. ``sf_dir`` is
    ignored (the media fixture is engine-generated — testdata has no
    binary media); rows-only oracle check.

    Batch sizing note (scale): binary payloads dominate block size — the
    stage runs with a small batch_size and pyarrow format so blocks stay
    zero-copy and bounded (the pattern for real image corpora)."""
    path = ensure_media_fixture()
    ds = rd.read_parquet(path)
    return ds.map_batches(MediaDecoder, batch_format="pyarrow", batch_size=64, concurrency=2, num_cpus=1)


def video_frame_samples(sf_dir: str) -> pd.DataFrame:
    path = ensure_media_fixture()
    ds = rd.read_parquet(path)
    out = ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": 2}, batch_format="pyarrow", batch_size=64,
        concurrency=2, num_cpus=1,
    ).to_pandas()
    return out.sort_values(["media_id", "frame"]).reset_index(drop=True)
