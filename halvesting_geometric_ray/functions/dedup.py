"""Deduplication operators for training-data pipelines.

- exact dedup: group by full text, keep min doc_id (D1/D2 analogue of
  the reference's drop_duplicates, link_prediction_metadata.py:228,316);
- n-gram Jaccard near-dup: token-trigram sets, inverted-index pair
  generation, exact Jaccard verify;
- MinHash-LSH near-dup: 64 seeded permutations over trigram hashes,
  banded bucketing -> candidates -> exact verify;
- SimHash near-dup: 64-bit token-weighted simhash, 16-bit band
  blocking -> Hamming verify.

All hashes are seeded/stable; outputs are deterministic sets.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

_MOD = (1 << 61) - 1
_MASK63 = (1 << 63) - 1

NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS


def _hash_strs(strs: List[str], seed: int = 7) -> np.ndarray:
    import polars as pl

    if not strs:
        return np.empty(0, dtype=np.int64)
    return (pl.Series(strs).hash(seed=seed).to_numpy() & np.uint64(_MASK63)) \
        .astype(np.int64)


def trigrams(tokens: List[str]) -> List[str]:
    return [" ".join(tokens[i:i + 3]) for i in range(len(tokens) - 2)]


def trigram_hashes(text: str) -> np.ndarray:
    """Distinct hashed token-trigrams of a document."""
    toks = text.split(" ")
    return np.unique(_hash_strs(trigrams(toks)))


def _perm_params(num_perm: int = NUM_PERM, seed: int = 11):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MOD, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MOD, size=num_perm, dtype=np.int64)
    return a, b


_A, _B = _perm_params()


def minhash_signature(gram_hashes: np.ndarray) -> np.ndarray:
    """num_perm-vector of min((a*h + b) mod p) over the gram set."""
    if gram_hashes.size == 0:
        return np.full(NUM_PERM, _MOD, dtype=np.int64)
    out = np.empty(NUM_PERM, dtype=np.int64)
    hv = gram_hashes.astype(np.uint64)
    for i in range(NUM_PERM):
        # uint64 wrap-around multiply is fine: it is a fixed deterministic
        # mixing function, not number theory we rely on
        prod = (np.uint64(_A[i]) * hv + np.uint64(_B[i])) % np.uint64(_MOD)
        out[i] = int(prod.min())
    return out


def band_keys(sig: np.ndarray) -> List[int]:
    """One stable hash per band of the signature."""
    keys = []
    for b in range(BANDS):
        chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
        x = np.uint64(1469598103934665603)
        for v in chunk.astype(np.uint64):
            x = (x ^ v) * np.uint64(1099511628211)
        keys.append(int(x & np.uint64(_MASK63)))
    return keys


def simhash64(tokens: List[str]) -> int:
    """Token-count-weighted 64-bit simhash (top bit cleared)."""
    if not tokens:
        return 0
    import collections

    counts = collections.Counter(tokens)
    toks = list(counts.keys())
    hs = _hash_strs(toks, seed=23).astype(np.uint64)
    w = np.fromiter((counts[t] for t in toks), dtype=np.int64, count=len(toks))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    score = ((2 * bits - 1) * w[:, None]).sum(axis=0)
    v = 0
    for i in range(64):
        if score[i] > 0:
            v |= (1 << i)
    return v & _MASK63


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique arrays."""
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0
