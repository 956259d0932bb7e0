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
