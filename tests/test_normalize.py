"""Text normalization vs a pure-Python unicodedata oracle, and
mixture resampling determinism/rate/nesting properties."""

import re
import unicodedata

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.text import normalize_text_batch
from halvesting_geometric_ray.ops.sample import mixture_resample

_CTRL = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]|[­​-‏⁠﻿]")


def oracle_norm(t, nfc=True, lowercase=True, strip_accents=False,
                strip_control=True, collapse_ws=True):
    if strip_control:
        t = "".join(c for c in t
                    if not (unicodedata.category(c) in ("Cc", "Cf")
                            and c not in "\t\n\r"))
    if nfc or strip_accents:
        t = unicodedata.normalize("NFC", t)
    if strip_accents:
        t = unicodedata.normalize("NFD", t)
        t = "".join(c for c in t if unicodedata.category(c) != "Mn")
        t = unicodedata.normalize("NFC", t)
    if lowercase:
        t = t.lower()
    if collapse_ws:
        t = re.sub(r"\s+", " ", t).strip()
    return t


CASES = [
    "  Hélló  WORLD\x00 ",
    "Café vs Café",          # NFC unification
    "A​B­C",                   # zero-width + soft hyphen (Cf)
    "tabs\tand\nnewlines\r\n collapse",
    "ẞ STRASSE ß",             # sharp-s casing
    "no change needed",
    "",
    "İstanbul Iı",             # dotted/dotless i
    "ACCENT́S Ångström",
]


@pytest.mark.parametrize("opts", [
    {},
    {"strip_accents": True},
    {"lowercase": False},
    {"collapse_ws": False},
    {"strip_control": False, "collapse_ws": False},
])
def test_normalize_matches_unicodedata_oracle(opts):
    t = pa.table({"doc_id": list(range(len(CASES))), "text": CASES})
    out = normalize_text_batch(t, **opts)
    got = out.column("text_norm").to_pylist()
    exp = [oracle_norm(c, **opts) for c in CASES]
    assert got == exp
    # passthrough columns intact
    assert out.column("doc_id").to_pylist() == list(range(len(CASES)))
    assert out.column("text").to_pylist() == CASES


def test_normalize_idempotent():
    t = pa.table({"text": CASES})
    once = normalize_text_batch(t, strip_accents=True)
    twice = normalize_text_batch(
        pa.table({"text": once.column("text_norm")}), strip_accents=True)
    assert (twice.column("text_norm").to_pylist()
            == once.column("text_norm").to_pylist())


def _mix_ds(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "grp": rng.choice(["en", "web", "forum", "other"], size=n,
                          p=[0.4, 0.3, 0.2, 0.1]),
    })


def test_mixture_resample_rates_and_determinism():
    pdf = _mix_ds()
    rates = {"en": 1.0, "web": 0.3, "forum": 0.05}
    a = mixture_resample(rd.from_pandas(pdf), "grp", "doc_id", rates,
                         seed=5).to_pandas().sort_values("doc_id")
    b = mixture_resample(rd.from_pandas(pdf).repartition(7), "grp",
                         "doc_id", rates, seed=5
                         ).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    kept = a.grp.value_counts()
    tot = pdf.grp.value_counts()
    assert kept["en"] == tot["en"]                      # rate 1.0 keeps all
    assert "other" not in kept                          # default_rate=0 drops
    assert abs(kept["web"] / tot["web"] - 0.3) < 0.03   # ~4 sd at n~6000
    assert abs(kept["forum"] / tot["forum"] - 0.05) < 0.02


def test_mixture_resample_nested_rates():
    pdf = _mix_ds()
    lo = mixture_resample(rd.from_pandas(pdf), "grp", "doc_id",
                          {"web": 0.1}, seed=5).to_pandas()
    hi = mixture_resample(rd.from_pandas(pdf), "grp", "doc_id",
                          {"web": 0.4}, seed=5).to_pandas()
    assert set(lo.doc_id).issubset(set(hi.doc_id))


def test_mixture_resample_rate_cap_and_default():
    pdf = _mix_ds(2000)
    out = mixture_resample(rd.from_pandas(pdf), "grp", "doc_id",
                           {"en": 5.0}, seed=1,
                           default_rate=1.0).to_pandas()
    assert len(out) == len(pdf)  # cap at keep-all + default keeps rest
