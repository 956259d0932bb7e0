"""Multimodal (binary-payload) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Ray-side machinery — schema, actor-pool stage shape, batch sizing,
output layout — is real and tested.  ``DecodeStage`` mode="real" now
REALLY decodes PNG payloads with the pure-stdlib decoder below (zlib
inflate + per-scanline unfiltering, color types 0/2/3/4/6 at bit depth
8); other formats (JPEG/audio/video) still raise NotImplementedError —
their codecs are not in this container — and mode="fake" remains the
deterministic byte featurizer so non-PNG pipelines stay end-to-end
executable.

Batch-size guidance: payloads are large (100 KB-10 MB); size batches so
batch_size x concurrency x payload fits the worker heap (config
extract_batch_size discussion) — callers pass small batch_size here.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa

N_FEATURES = 8

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type (3 = palette indices, 1 sample)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, height: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Reverse the PNG scanline filters (types 0-4: None/Sub/Up/
    Average/Paeth) over the inflated IDAT stream.  Returns the
    (height, stride) uint8 sample matrix.  Up/None vectorize across
    the row; Sub/Average/Paeth carry an intra-row dependency and run
    per-byte (fine for the bounded-size payloads a decode stage sees
    per batch)."""
    out = np.zeros((height, stride), dtype=np.uint8)
    buf = np.frombuffer(raw, dtype=np.uint8)
    if buf.size < height * (stride + 1):
        raise ValueError("PNG: truncated IDAT stream")
    pos = 0
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ft = int(buf[pos])
        line = buf[pos + 1:pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else zero
        if ft == 0:
            cur = line
        elif ft == 2:      # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:      # Sub
            cur = line
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ft == 3:      # Average
            cur = line
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:      # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Pure-stdlib PNG decode (zlib + struct + numpy): returns
    (width, height, channels, pixels[h, w, channels] uint8).

    Supports bit depth 8, no interlace, color types 0 (gray), 2 (RGB),
    3 (palette -> RGB), 4 (gray+alpha), 6 (RGBA) — the common subset;
    anything else raises ValueError.  This is the de-stubbed
    mode="real" decode path (the container has no image libraries;
    PNG needs none)."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIG)
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"PNG: unsupported (depth={depth}, interlace={interlace})")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color}")
    samples = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    mat = _png_unfilter(raw, h, w * samples, samples)
    px = mat.reshape(h, w, samples)
    if color == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        px = plte[px[:, :, 0]]
        samples = 3
    return w, h, samples, px


def png_features(px: np.ndarray) -> np.ndarray:
    """Deterministic N_FEATURES-vector from decoded pixels: per-channel
    means / 255 (slots 0-3, zero-padded), fraction of samples > 127,
    population std / 255, channel count, and a reserved 0."""
    h, w, c = px.shape
    f = np.zeros(N_FEATURES, dtype=np.float64)
    flat = px.astype(np.float64)
    f[:c] = flat.mean(axis=(0, 1)) / 255.0  # c is 1..4 by construction
    f[4] = float((flat > 127).mean())
    f[5] = float(flat.std()) / 255.0
    f[6] = float(c)
    return f


class DecodeStage:
    """Actor-pool map_batches stage: (id, payload binary) ->
    (id, n_bytes, width, height, features list<float>).

    mode="fake": deterministic pseudo-decode — dimensions and features
    derived from the payload bytes (stable across runs).
    mode="real": PNG payloads decode for real (``decode_png`` above:
    stdlib zlib inflate + scanline unfiltering); width/height come from
    IHDR and features from the decoded pixels (``png_features``).
    Non-PNG payloads raise NotImplementedError — JPEG/audio/video
    codecs are absent from this container; drop a PIL/libvips decode
    into ``_decode_real`` with the same signature at deploy time.
    """

    def __init__(self, id_col: str = "url", payload_col: str = "html",
                 mode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    @staticmethod
    def _decode_real(p: bytes):
        """Real decode of one payload -> (width, height, features).
        PNG is handled in-process; extend per format at deploy time."""
        if p.startswith(PNG_SIG):
            w, h, _, px = decode_png(p)
            return w, h, png_features(px)
        raise NotImplementedError(
            "real decode implemented for PNG only in this container "
            "(no JPEG/audio/video codecs); use mode='fake' for other "
            "formats' plumbing tests")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads: List[bytes] = batch.column(self.payload_col).to_pylist()
        n = len(payloads)
        n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                              count=n)
        width = np.empty(n, dtype=np.int64)
        height = np.empty(n, dtype=np.int64)
        feats = np.empty((n, N_FEATURES), dtype=np.float64)
        if self.mode == "real":
            for i, p in enumerate(payloads):
                width[i], height[i], feats[i] = self._decode_real(p)
            return pa.table({
                self.id_col: batch.column(self.id_col),
                "n_bytes": pa.array(n_bytes),
                "width": pa.array(width),
                "height": pa.array(height),
                "features": pa.array(
                    list(feats), type=pa.list_(pa.float64(), N_FEATURES)),
            })
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
