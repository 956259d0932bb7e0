

def test_gopher_rules_branches():
    """Each Gopher rule rejects its crafted offender; the good doc
    passes; counts match a hand computation."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from halvesting_geometric_ray.functions.text import \
        gopher_rules_batch

    good = "the quick brown fox and the lazy dog have fun with " \
           "words that keep being fine to read again and again more"
    short = "the and of"
    symbols = " ".join(["###"] * 30)
    lowalpha = " ".join(["123"] * 30)
    nostop = " ".join(["zebra"] * 30)
    t = pa.table({
        "doc_id": pa.array(np.arange(5, dtype=np.int64)),
        "text": pa.array([good, short, symbols, lowalpha, nostop])})
    out = gopher_rules_batch(t).to_pandas().set_index("doc_id")
    assert bool(out.loc[0, "keep"])
    assert not out.loc[1, "keep"]          # word count < 20
    assert not out.loc[2, "keep"]          # symbol ratio >= 0.1
    assert not out.loc[3, "keep"]          # alpha fraction <= 0.8
    assert not out.loc[4, "keep"]          # stopword hits < 2
    assert out.loc[0, "n_words"] == len(good.split(" "))
    assert out.loc[4, "stop_hits"] == 0
    assert abs(out.loc[3, "alpha_frac"]) < 1e-12
