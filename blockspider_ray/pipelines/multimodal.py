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
  audio: b"AUD1" + u32 sample_rate + u32 n_samples + n_samples of i16 PCM
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
        pa.field("kind", pa.string()),  # image | video | audio
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_frames", pa.int32()),  # frames (video) / samples (audio)
        pa.field("sample_rate", pa.int32()),  # audio only; 0 otherwise
    ]
)


def generate_media(n: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table (binary payloads + metadata).
    Every 4th row is video, every 4th (offset 1) is audio, the rest
    images — all three modalities the brief's pipeline handles."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, ws, hs, nf, srs = [], [], [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        if i % 4 == 3:
            frames = int(rng.integers(2, 9))
            body = rng.integers(0, 256, size=frames * w * h, dtype=np.uint8).tobytes()
            payloads.append(b"VID1" + struct.pack("<HHH", frames, w, h) + body)
            kinds.append("video")
            nf.append(frames)
            srs.append(0)
        elif i % 4 == 1:
            sr = int(rng.choice([8000, 16000]))
            ns = int(rng.integers(1024, 4096))
            t = np.arange(ns, dtype=np.float64) / sr
            f0 = float(rng.uniform(100.0, 1000.0))
            wave = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(ns)
            pcm = np.clip(wave * 32767.0, -32768, 32767).astype("<i2")
            payloads.append(b"AUD1" + struct.pack("<II", sr, ns) + pcm.tobytes())
            kinds.append("audio")
            nf.append(ns)
            srs.append(sr)
            w = h = 0
        else:
            body = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
            payloads.append(b"IMG1" + struct.pack("<HH", w, h) + body)
            kinds.append("image")
            nf.append(1)
            srs.append(0)
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
            "sample_rate": pa.array(srs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def ensure_media_fixture(root: str = "/tmp/blockspider_ray_fixtures", n: int = 200) -> str:
    # v2: the fixture gained the audio modality — new name so a cached
    # v1 file is never read by v2 code
    path = os.path.join(root, f"media-{n}-v2.parquet")
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
        if payload[:4] == b"AUD1":
            # (kind, sample_rate, 1, n_samples, samples): sr rides the
            # "width" slot, n_samples the frame slot
            sr, ns = struct.unpack("<II", payload[4:12])
            pcm = np.frombuffer(payload[12 : 12 + 2 * ns], dtype="<i2")
            return "audio", sr, 1, ns, pcm
        raise NotImplementedError(
            "real image/audio decoding requires PIL/cv2/soundfile (not in this "
            "container); payload is not in the synthetic fixture layout"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        feats = {"media_id": ids, "kind": batch.column("kind")}
        means, stds, aspects, durs = [], [], [], []
        for p in batch.column("payload").to_pylist():
            kind, w, h, f, px = self._decode(p)
            if kind == "audio":
                # normalized [-1, 1] float features; duration from sr
                x = px.astype(np.float64) / 32768.0
                means.append(float(x.mean()) if len(x) else 0.0)
                stds.append(float(x.std()) if len(x) else 0.0)
                aspects.append(0.0)
                durs.append(round(f / w, 4))  # n_samples / sample_rate
            else:
                means.append(float(px.mean()) if len(px) else 0.0)
                stds.append(float(px.std()) if len(px) else 0.0)
                aspects.append(round(w / h, 4))
                durs.append(round(f / 24.0, 4) if kind == "video" else 0.0)
        feats["mean_intensity"] = pa.array(np.round(means, 4), pa.float64())
        feats["std_intensity"] = pa.array(np.round(stds, 4), pa.float64())
        feats["aspect"] = pa.array(aspects, pa.float64())
        feats["duration_s"] = pa.array(durs, pa.float64())
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


class AudioWindower:
    """Actor-pool audio feature stage: fixed-size sample windows per
    clip, each reduced to (rms, zero-crossing count) — the framing step
    every audio featurizer (VAD, fingerprinting, spectral pipelines)
    runs before its transform. Decoder state initialized once per
    actor; per-clip math is one reshape + vectorized reductions (the
    tail partial window is dropped, the standard hop==win framing)."""

    def __init__(self, win: int = 512):
        self.win = win
        self.decoder = MediaDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_w, out_rms, out_zc = [], [], [], []
        for mid, p, kind in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("kind").to_pylist(),
        ):
            if kind != "audio":
                continue
            _, sr, _, ns, pcm = self.decoder._decode(p)
            k = ns // self.win
            if k == 0:
                continue
            x = (pcm[: k * self.win].astype(np.float64) / 32768.0).reshape(k, self.win)
            rms = np.sqrt((x * x).mean(axis=1))
            zc = (np.diff(np.signbit(x), axis=1) != 0).sum(axis=1)
            out_id.extend([mid] * k)
            out_w.extend(range(k))
            out_rms.extend(np.round(rms, 6))
            out_zc.extend(zc)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "window": pa.array(out_w, pa.int64()),
                "rms": pa.array(out_rms, pa.float64()),
                "zero_crossings": pa.array([int(z) for z in out_zc], pa.int64()),
            }
        )


def audio_windows(sf_dir: str, win: int = 512) -> pd.DataFrame:
    """Windowed audio features over the media table's audio clips
    (``sf_dir`` ignored — the media fixture is engine-generated; the
    driver records a rows-only check; pytest pins exact per-window
    values against a direct numpy recompute of the payload bytes)."""
    path = ensure_media_fixture()
    ds = rd.read_parquet(path)
    out = ds.map_batches(
        AudioWindower, fn_constructor_kwargs={"win": win}, batch_format="pyarrow",
        batch_size=64, concurrency=2, num_cpus=1,
    ).to_pandas()
    return out.sort_values(["media_id", "window"]).reset_index(drop=True)


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
