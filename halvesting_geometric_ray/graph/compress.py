"""WebGraph-style compressed adjacency storage for CSR shards.

Boldi & Vigna 2004 ("The WebGraph framework") made 10^10-edge web
graphs storable by exploiting two empirical laws of the link graph:
LOCALITY (most links point near their source in url order) and
GAP SKEW (sorted adjacency gaps are tiny power-law integers).  This
module is the engine's storage-scale path for the same laws:

  per source row (CSR adjacency already sorted by (src, dst)):
    first neighbor  -> zigzag(first - src)   (locality: small |delta|)
    every next      -> (gap - 1)             (strictly ascending, so
                                              gaps >= 1)
  all values        -> LEB128 varint bytes   (one byte for values
                                              < 128 — the common case)

Both passes are fully vectorized numpy (encode: per-byte masked
scatter over <= 10 rounds; decode: continuation-bit scan +
segmented-cumsum gap reconstruction) — no Python loop over edges.

This is a COLD-STORAGE codec, deliberately not wired into the hot
iterate path (shard actors keep raw int64 arrays; decompression is
one vectorized pass at load).  compress_csr_shards measures exactly
what it saves: bytes of the `indices` column vs varint blob.

Round-trip exactness, hub-skew ratios and the vectorized-varint
corner cases (0, 127, 128, 2^32, negative deltas) are pinned in
tests/test_compress.py.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray


def varint_encode(vals: np.ndarray) -> np.ndarray:
    """uint64 values -> LEB128 byte stream (vectorized)."""
    v = vals.astype(np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    # bytes needed: ceil(bit_length / 7), min 1
    nb = np.ones(v.size, dtype=np.int64)
    t = v >> np.uint64(7)
    while t.any():
        nb += (t != 0)
        t >>= np.uint64(7)
    pos = np.concatenate([[0], np.cumsum(nb)])
    out = np.zeros(pos[-1], dtype=np.uint8)
    max_nb = int(nb.max())
    for j in range(max_nb):
        m = nb > j
        byte = ((v[m] >> np.uint64(7 * j))
                & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[m] - 1 > j).astype(np.uint8) << 7
        out[pos[:-1][m] + j] = byte | cont
    return out


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """LEB128 byte stream -> uint64 values (vectorized)."""
    b = np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lens.max())):
        m = lens > j
        out[m] |= (b[starts[m] + j] & np.uint64(0x7F)).astype(
            np.uint64) << np.uint64(7 * j)
    return out


def _zigzag(d: np.ndarray) -> np.ndarray:
    d = d.astype(np.int64)
    return ((d << 1) ^ (d >> 63)).astype(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64)
    return ((z >> np.uint64(1)).astype(np.int64)
            ^ -(z & np.uint64(1)).astype(np.int64))


def encode_adjacency(vid_lo: int, indptr: np.ndarray,
                     indices: np.ndarray) -> np.ndarray:
    """CSR (sorted-in-row) -> gap/zigzag varint byte blob."""
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    counts = np.diff(indptr)
    if indices.size == 0:
        return np.empty(0, dtype=np.uint8)
    srcs = np.repeat(np.arange(len(counts), dtype=np.int64) + vid_lo,
                     counts)
    row_start = np.zeros(indices.size, dtype=bool)
    row_start[indptr[:-1][counts > 0]] = True
    vals = np.empty(indices.size, dtype=np.uint64)
    # first-of-row: zigzag(first - src); rest: gap - 1
    vals[row_start] = _zigzag(indices[row_start] - srcs[row_start])
    rest = ~row_start
    gaps = indices[rest] - indices[np.flatnonzero(rest) - 1] - 1
    vals[rest] = gaps.astype(np.uint64)
    return varint_encode(vals)


def decode_adjacency(vid_lo: int, indptr: np.ndarray,
                     blob: np.ndarray) -> np.ndarray:
    """Inverse of encode_adjacency -> the exact indices array."""
    indptr = np.asarray(indptr, dtype=np.int64)
    counts = np.diff(indptr)
    vals = varint_decode(blob)
    n = int(indptr[-1])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    assert vals.size == n, (vals.size, n)
    srcs = np.repeat(np.arange(len(counts), dtype=np.int64) + vid_lo,
                     counts)
    row_start = np.zeros(n, dtype=bool)
    row_start[indptr[:-1][counts > 0]] = True
    g0 = np.empty(n, dtype=np.int64)
    g0[row_start] = _unzigzag(vals[row_start]) + srcs[row_start]
    rest = ~row_start
    g0[rest] = vals[rest].astype(np.int64) + 1
    c = np.cumsum(g0)
    # neighbors[i] = C[i] - C[row_start - 1]  + start  (start folded
    # into g0[row_start] already): subtract the pre-row cumsum
    rs_idx = np.flatnonzero(row_start)
    pre = np.where(rs_idx > 0, c[rs_idx - 1], 0)
    offset = np.repeat(pre, counts[counts > 0])
    return c - offset


@ray.remote(num_cpus=1)
def _compress_one(path: str, out_path: str) -> Dict:
    t = pq.read_table(path)
    row = {k: t.column(k)[0] for k in t.column_names}
    vid_lo = row["vid_lo"].as_py()
    indptr = np.asarray(row["indptr"].values, dtype=np.int64)
    indices = np.asarray(row["indices"].values, dtype=np.int64)
    blob = encode_adjacency(vid_lo, indptr, indices)
    out = pa.table({
        "vid_lo": pa.array([vid_lo], type=pa.int64()),
        "vid_hi": pa.array([row["vid_hi"].as_py()], type=pa.int64()),
        "indptr": pa.array([indptr], type=pa.list_(pa.int64())),
        "blob": pa.array([blob.tobytes()], type=pa.binary()),
    })
    pq.write_table(out, out_path, compression="zstd")
    return {"path": out_path,
            "bytes_raw": int(indices.size * 8),
            "bytes_blob": int(blob.size),
            "n_edges": int(indices.size)}


def compress_csr_shards(descs: List[Dict], out_dir: str
                        ) -> Tuple[List[Dict], Dict]:
    """Compress every shard's adjacency; returns (per-shard records,
    info) with info = {bytes_raw, bytes_blob, ratio, bits_per_edge}."""
    os.makedirs(out_dir, exist_ok=True)
    recs = ray.get([
        _compress_one.remote(
            d["path"], os.path.join(out_dir,
                                    f"cshard_{d['part']:05d}.parquet"))
        for d in sorted(descs, key=lambda d: d["part"])])
    raw = sum(r["bytes_raw"] for r in recs)
    blob = sum(r["bytes_blob"] for r in recs)
    edges = sum(r["n_edges"] for r in recs)
    info = {"bytes_raw": raw, "bytes_blob": blob,
            "ratio": raw / blob if blob else float("inf"),
            "bits_per_edge": 8.0 * blob / edges if edges else 0.0,
            "n_edges": edges}
    return recs, info


def load_compressed_shard(path: str) -> Dict:
    """Read one compressed shard back to raw CSR arrays (exact)."""
    t = pq.read_table(path)
    row = {k: t.column(k)[0] for k in t.column_names}
    vid_lo = row["vid_lo"].as_py()
    indptr = np.asarray(row["indptr"].values, dtype=np.int64)
    blob = np.frombuffer(row["blob"].as_py(), dtype=np.uint8)
    return {"vid_lo": vid_lo, "vid_hi": row["vid_hi"].as_py(),
            "indptr": indptr,
            "indices": decode_adjacency(vid_lo, indptr, blob)}
