"""Multimodal (binary-payload) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Ray-side machinery — schema, actor-pool stage shape, batch sizing,
output layout — is real and tested; the actual media DECODE is stubbed
(the image/audio libraries are not in this container): ``DecodeStage``
raises NotImplementedError for mode="real", and mode="fake" runs a
deterministic featurizer over the raw bytes so pipelines are end-to-end
executable.

Batch-size guidance: payloads are large (100 KB-10 MB); size batches so
batch_size x concurrency x payload fits the worker heap (config
extract_batch_size discussion) — callers pass small batch_size here.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

N_FEATURES = 8


class DecodeStage:
    """Actor-pool map_batches stage: (id, payload binary) ->
    (id, n_bytes, width, height, features list<float>).

    mode="fake": deterministic pseudo-decode — dimensions and features
    derived from the payload bytes (stable across runs).
    mode="real": NotImplementedError (no media libs in this container);
    drop in a PIL/libvips decode with the same signature at deploy time.
    """

    def __init__(self, id_col: str = "url", payload_col: str = "html",
                 mode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "media decode requires image/audio libraries absent from "
                "this environment; use mode='fake' for plumbing tests")
        payloads: List[bytes] = batch.column(self.payload_col).to_pylist()
        n = len(payloads)
        n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                              count=n)
        width = np.empty(n, dtype=np.int64)
        height = np.empty(n, dtype=np.int64)
        feats = np.empty((n, N_FEATURES), dtype=np.float64)
        for i, p in enumerate(payloads):
            h = np.frombuffer(p, dtype=np.uint8)
            width[i] = 16 + (int(h[: 64].sum()) % 1024) if h.size else 0
            height[i] = 16 + (int(h[-64:].sum()) % 1024) if h.size else 0
            # deterministic byte-histogram features
            hist = np.bincount(h % 8, minlength=N_FEATURES)[:N_FEATURES] \
                if h.size else np.zeros(N_FEATURES)
            feats[i] = hist / max(1, h.size)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_bytes": pa.array(n_bytes),
            "width": pa.array(width),
            "height": pa.array(height),
            "features": pa.array(list(feats),
                                 type=pa.list_(pa.float64(), N_FEATURES)),
        })


def decode_binary(ds, id_col: str = "url", payload_col: str = "html",
                  mode: str = "fake", batch_size: int = 256,
                  concurrency=(1, 8)):
    """The actor-pool decode/featurize stage over a binary column."""
    return ds.map_batches(
        DecodeStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col,
                               "mode": mode})


class ResizeStage:
    """(id, payload) -> (id, out_w, out_h, resized:binary).

    mode="fake": deterministic byte-grid subsample to out_w x out_h
    (stable across runs; output payload is exactly out_w*out_h bytes) —
    the real PIL/libvips resample drops in with the same signature.
    mode="real": NotImplementedError (no image libs in this container)."""

    def __init__(self, id_col: str = "url", payload_col: str = "html",
                 out_w: int = 32, out_h: int = 32, mode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        self.out_w = out_w
        self.out_h = out_h
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("image resample needs PIL/libvips")
        n_out = self.out_w * self.out_h
        out: List[bytes] = []
        for p in batch.column(self.payload_col).to_pylist():
            h = np.frombuffer(p, dtype=np.uint8)
            if h.size == 0:
                out.append(b"\x00" * n_out)
                continue
            idx = (np.arange(n_out, dtype=np.int64) * h.size) // n_out
            out.append(h[idx].tobytes())
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "out_w": pa.array(np.full(batch.num_rows, self.out_w,
                                      dtype=np.int64)),
            "out_h": pa.array(np.full(batch.num_rows, self.out_h,
                                      dtype=np.int64)),
            "resized": pa.array(out, type=pa.binary()),
        })


class FrameSampleStage:
    """Video-style frame sampling: (id, payload) -> one row PER FRAME
    (id, frame_idx, frame:binary) — the row-expanding stage shape
    (flat_map semantics via a batch fn returning more rows than it got).

    mode="fake": the payload is treated as n_frames equal-length chunks
    sampled at evenly spaced offsets; a real ffmpeg/pyav keyframe
    sampler drops in with the same signature and output layout."""

    def __init__(self, id_col: str = "url", payload_col: str = "html",
                 n_frames: int = 4, mode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        self.n_frames = n_frames
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("frame decode needs ffmpeg/pyav")
        ids = batch.column(self.id_col).to_pylist()
        out_id, out_fi, out_fr = [], [], []
        for i, p in enumerate(batch.column(self.payload_col).to_pylist()):
            size = len(p)
            k = min(self.n_frames, max(1, size))
            step = max(1, size // k)
            for f in range(k if size else 1):
                out_id.append(ids[i])
                out_fi.append(f)
                out_fr.append(p[f * step:(f + 1) * step] if size else b"")
        return pa.table({
            self.id_col: pa.array(out_id),
            "frame_idx": pa.array(out_fi, type=pa.int64()),
            "frame": pa.array(out_fr, type=pa.binary()),
        })


def resize_binary(ds, id_col: str = "url", payload_col: str = "html",
                  out_w: int = 32, out_h: int = 32, mode: str = "fake",
                  batch_size: int = 256, concurrency=(1, 8)):
    return ds.map_batches(
        ResizeStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col,
                               "out_w": out_w, "out_h": out_h, "mode": mode})


def frame_sample(ds, id_col: str = "url", payload_col: str = "html",
                 n_frames: int = 4, mode: str = "fake",
                 batch_size: int = 64, concurrency=(1, 8)):
    """Small batch_size: output is n_frames x input rows of binary
    payload — batch x concurrency x payload must fit the worker heap."""
    return ds.map_batches(
        FrameSampleStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col,
                               "n_frames": n_frames, "mode": mode})
