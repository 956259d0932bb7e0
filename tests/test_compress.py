"""Compressed adjacency codec: varint corner cases, zigzag, exact
round-trip on random/skewed/empty-row graphs, shard-level round-trip
through parquet, compression-ratio sanity on a locality-heavy graph."""

import numpy as np
import pytest

from halvesting_geometric_ray.graph.compress import (
    _unzigzag, _zigzag, compress_csr_shards, decode_adjacency,
    encode_adjacency, load_compressed_shard, varint_decode,
    varint_encode)


def test_varint_corner_cases():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384,
                     2**32 - 1, 2**32, 2**63 - 1, 2**64 - 1],
                    dtype=np.uint64)
    enc = varint_encode(vals)
    assert np.array_equal(varint_decode(enc), vals)
    # single-byte economy: values < 128 take exactly one byte
    assert varint_encode(np.array([5], dtype=np.uint64)).size == 1
    assert varint_encode(np.array([128], dtype=np.uint64)).size == 2
    assert varint_encode(np.empty(0, dtype=np.uint64)).size == 0
    assert varint_decode(np.empty(0, dtype=np.uint8)).size == 0


def test_zigzag():
    d = np.array([0, -1, 1, -2, 2, -(2**62), 2**62], dtype=np.int64)
    assert np.array_equal(_unzigzag(_zigzag(d)), d)


def rand_csr(n, p, seed, lo=0, local=False):
    rng = np.random.default_rng(seed)
    rows = []
    for v in range(n):
        if local:
            cand = np.arange(max(0, v - 20), min(n, v + 20)) + lo
        else:
            cand = np.arange(n) + lo
        nb = np.sort(rng.choice(cand, rng.integers(0, 6),
                                replace=False))
        rows.append(nb.astype(np.int64))
    indptr = np.zeros(n + 1, dtype=np.int64)
    for v in range(n):
        indptr[v + 1] = indptr[v] + len(rows[v])
    indices = np.concatenate(rows) if rows else \
        np.empty(0, dtype=np.int64)
    return indptr, indices


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_roundtrip_random(seed):
    indptr, indices = rand_csr(80, 0.1, seed, lo=1000)
    blob = encode_adjacency(1000, indptr, indices)
    got = decode_adjacency(1000, indptr, blob)
    assert np.array_equal(got, indices)


def test_roundtrip_skewed_and_empty_rows():
    # hub row + many empties + a far-pointer row
    indptr = np.array([0, 0, 50, 50, 52, 52], dtype=np.int64)
    hub = np.sort(np.random.default_rng(1).choice(
        10**9, 50, replace=False)).astype(np.int64)
    far = np.array([5, 999_999_999], dtype=np.int64)
    indices = np.concatenate([hub, far])
    blob = encode_adjacency(0, indptr, indices)
    assert np.array_equal(decode_adjacency(0, indptr, blob), indices)
    # fully empty shard
    e = encode_adjacency(0, np.array([0, 0, 0], dtype=np.int64),
                         np.empty(0, dtype=np.int64))
    assert e.size == 0
    assert decode_adjacency(0, np.array([0, 0, 0], dtype=np.int64),
                            e).size == 0


def test_locality_compresses_well():
    # a graph obeying the WebGraph laws: near-diagonal links
    indptr, indices = rand_csr(2000, 0.1, 4, lo=0, local=True)
    blob = encode_adjacency(0, indptr, indices)
    raw = indices.size * 8
    assert blob.size * 4 < raw  # > 4x smaller than int64
    assert np.array_equal(decode_adjacency(0, indptr, blob), indices)


def test_shard_file_roundtrip(tmp_path, tiny_graph):
    """Compress the fixture corpus' real CSR shards and read them
    back exactly; ratio and bits/edge are reported."""
    from halvesting_geometric_ray.graph.csr import (build_csr_shards,
                                                    load_shard)
    from halvesting_geometric_ray.graph.build import read_layer

    g = tiny_graph
    descs = build_csr_shards(read_layer(g.edges), g.offsets,
                             str(tmp_path / "csr"),
                             lineage={"kind": "directed"})
    recs, info = compress_csr_shards(descs, str(tmp_path / "ccsr"))
    assert info["n_edges"] > 0
    assert info["ratio"] > 1.0
    assert 0 < info["bits_per_edge"] < 64
    for d, r in zip(sorted(descs, key=lambda x: x["part"]), recs):
        raw = load_shard(d["path"])
        back = load_compressed_shard(r["path"])
        assert back["vid_lo"] == raw["vid_lo"]
        assert np.array_equal(back["indptr"], raw["indptr"])
        assert np.array_equal(back["indices"], raw["indices"])
