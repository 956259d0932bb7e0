"""q_ccnet_buckets composition: tercile fractions + ordering."""

import numpy as np

from halvesting_geometric_ray.queries_text import QUERIES


def test_ccnet_buckets_gate_shape():
    out = QUERIES["q_ccnet_buckets"]("/root/testdata/sf0.001").to_pandas()
    assert set(out.bucket) <= {"head", "middle", "tail"}
    assert out.doc_id.is_unique
    for lang, grp in out.groupby("lang"):
        n = len(grp)
        if n < 9:
            continue
        frac = grp.bucket.value_counts(normalize=True)
        # terciles: each bucket ~1/3 (ties can skew small groups)
        for b in ("head", "middle", "tail"):
            assert 0.15 < frac.get(b, 0) < 0.55, (lang, dict(frac))
        # ordering: max head score <= min tail score
        h = grp.loc[grp.bucket == "head", "score"]
        t = grp.loc[grp.bucket == "tail", "score"]
        if len(h) and len(t):
            assert h.max() <= t.min() + 1e-9


def test_ccnet_deterministic():
    a = QUERIES["q_ccnet_buckets"]("/root/testdata/sf0.001").to_pandas()
    b = QUERIES["q_ccnet_buckets"]("/root/testdata/sf0.001").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a.bucket == b.bucket).all()
    assert np.allclose(a.score, b.score)
