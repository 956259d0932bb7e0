"""Directed triad census (Holland-Leinhardt 16 types) — distributed
Batagelj-Mrvar formulation.

The full census classifies every unordered vertex triple of a directed
graph into one of 16 isomorphism classes (003, 012, 102, 021D, 021U,
021C, 111D, 111U, 030T, 030C, 201, 120D, 120U, 120C, 210, 300 — MAN
labels + D=out-star / U=in-star / C=path-or-cycle sub-patterns).  It is
the classic local-structure fingerprint of a web/citation graph
(reciprocity + transitivity in one table; Milo-style motif profiles are
read off the 030/120 rows).  Naive enumeration is C(n,3) triples; this
implementation never enumerates an open triple — the Batagelj-Mrvar
(2001, "A subquadratic triad census algorithm") counting identities
reduce everything to:

1. DYAD table (u<v, code 1=u->v / 2=v->u / 3=mutual): one grouped
   bit_or exchange over the deduped directed edges;
2. per-vertex class degrees (M mutual, O asym-out, I asym-in) and
   support degrees: one explode + grouped-sum exchange;
3. CLOSED triples (all 3 dyads non-null) enumerated EXACTLY ONCE via
   the certified support-triangle machinery (degree orientation bounds
   the wedge skew; graph/triangles.py), then 3 bucketed hash joins
   attach the dyad codes and a 64-entry derived lookup classifies each
   — per-type partial counts plus per-center class-pair corrections
   are folded inside the same pass;
4. 2-dyad (open-wedge) types from per-vertex combinatorics
   (C(M,2)->201, MO->111U, MI->111D, C(O,2)->021D, C(I,2)->021U,
   OI->021C) MINUS the closed-triple corrections from step 3;
5. 1-dyad types per dyad class via n - deg(u) - deg(v) + cn(u, v)
   summed in closed form (cn totals come from step 3's codes);
6. 003 = C(n,3) - everything else.

All exchanges are bounded by E; driver state is O(16) counters.  The
reference has no motif analytics (its graph work stops at building the
citation network, halvesting_geometric/utils/data/
link_prediction_dataset.py); this extends the engine's triangle family
to the full directed census.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.join import hash_join
from .triangles import _wedges, orient

TRIAD_NAMES = ("003", "012", "102", "021D", "021U", "021C", "111D",
               "111U", "030T", "030C", "201", "120D", "120U", "120C",
               "210", "300")

_I64 = pa.int64()


def classify_bits(bits: int) -> str:
    """Triad type of a vertex-ordered triple (x1, x2, x3) from its
    6-bit adjacency: 1=x1->x2, 2=x2->x1, 4=x1->x3, 8=x3->x1,
    16=x2->x3, 32=x3->x2.  Derived from the published pictograms
    (D = the shared vertex is the SOURCE of both asym arcs, U = the
    sink, C = path/cycle; 111D = asym arc INTO the mutual pair,
    111U = out of it)."""
    d = [(bool(bits & 1), bool(bits & 2)),
         (bool(bits & 4), bool(bits & 8)),
         (bool(bits & 16), bool(bits & 32))]  # (12), (13), (23)
    m = sum(1 for f, b in d if f and b)
    a = sum(1 for f, b in d if f != b)
    # asym out/in degree per vertex (mutual arcs excluded)
    out = [0, 0, 0]
    inn = [0, 0, 0]
    pairs = ((0, 1), (0, 2), (1, 2))
    for (i, j), (f, b) in zip(pairs, d):
        if f != b:
            if f:
                out[i] += 1
                inn[j] += 1
            else:
                out[j] += 1
                inn[i] += 1
    if (m, a) == (0, 0):
        return "003"
    if (m, a) == (0, 1):
        return "012"
    if (m, a) == (1, 0):
        return "102"
    if (m, a) == (0, 2):
        if 2 in out:
            return "021D"
        if 2 in inn:
            return "021U"
        return "021C"
    if (m, a) == (1, 1):
        # the mutual pair: vertices i,j with d[k] both-true
        k = next(i for i, (f, b) in enumerate(d) if f and b)
        pair = set(pairs[k])
        # the asym arc: source s -> sink t
        (i, j), (f, b) = next(
            (p, fb) for p, fb in zip(pairs, d) if fb[0] != fb[1])
        s = i if f else j
        return "111U" if s in pair else "111D"
    if (m, a) == (0, 3):
        return "030T" if 2 in out else "030C"
    if (m, a) == (2, 0):
        return "201"
    if (m, a) == (1, 2):
        if 2 in out:
            return "120D"
        if 2 in inn:
            return "120U"
        return "120C"
    if (m, a) == (2, 1):
        return "210"
    return "300"


# 64-entry lookup: bit pattern -> index into TRIAD_NAMES
TRIAD_TABLE = np.array([TRIAD_NAMES.index(classify_bits(b))
                        for b in range(64)], dtype=np.int64)

# class-pair keys for the open-wedge corrections: at a closed triple's
# center, the two incident dyads fall in classes M / O (center->other)
# / I (other->center); the pair maps to the 2-dyad triad type it would
# have been counted as.
_PAIR_TYPE = {("M", "M"): "201", ("M", "O"): "111U", ("M", "I"): "111D",
              ("O", "O"): "021D", ("I", "I"): "021U", ("O", "I"): "021C"}


def _dyads(edges, cfg: EngineConfig):
    """Directed edge table -> (u<v, code) dyad table (one exchange)."""

    def canon(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        mask = s != d
        s, d = s[mask], d[mask]
        code = np.where(s < d, 1, 2).astype(np.int64)
        return pa.table({"u": pa.array(np.minimum(s, d), type=_I64),
                         "v": pa.array(np.maximum(s, d), type=_I64),
                         "code": pa.array(code, type=_I64)})

    c = edges.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True)
    # bit_or via max-of-sum trick: dedup (u,v,code) then sum codes per
    # pair — each direction contributes its bit at most once
    from ..ops.dedup import distinct

    uniq = distinct(c, ["u", "v", "code"], num_parts=cfg.num_parts)
    return grouped_aggregate(uniq, ["u", "v"], {"code": ("sum", "code")},
                             num_parts=cfg.num_parts)


def triad_census(edges, cfg: EngineConfig = DEFAULT) -> Dict[str, int]:
    """Full 16-type census of the directed simple graph (self-loops
    dropped, duplicate arcs collapsed).  n = number of distinct
    endpoint vertices.  Returns {type: count} with
    sum == C(n, 3)."""
    dy = _dyads(edges, cfg).materialize()

    # per-vertex class degrees M/O/I (+ support degree = M+O+I)
    def explode(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy()
        v = b.column("v").to_numpy()
        code = b.column("code").to_numpy()
        vid = np.concatenate([u, v])
        mut = np.concatenate([code == 3, code == 3])
        # code 1: u->v (u out, v in); code 2: v->u
        o = np.concatenate([code == 1, code == 2])
        i = np.concatenate([code == 2, code == 1])
        return pa.table({"vid": pa.array(vid, type=_I64),
                         "m": pa.array(mut.astype(np.int64)),
                         "o": pa.array(o.astype(np.int64)),
                         "i": pa.array(i.astype(np.int64))})

    perv = grouped_aggregate(
        dy.map_batches(explode, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["vid"], {"M": ("sum", "m"), "O": ("sum", "o"),
                  "I": ("sum", "i")}, num_parts=cfg.num_parts)

    # fold per-vertex combinatorics into scalars (one small reduce:
    # each block emits one partial row)
    def vfold(b: pa.Table) -> pa.Table:
        M = b.column("M").to_numpy().astype(np.int64)
        O = b.column("O").to_numpy().astype(np.int64)
        I = b.column("I").to_numpy().astype(np.int64)
        deg = M + O + I
        return pa.table({
            "n_vertices": pa.array([len(M)], type=_I64),
            "w201": pa.array([int((M * (M - 1) // 2).sum())], type=_I64),
            "w111U": pa.array([int((M * O).sum())], type=_I64),
            "w111D": pa.array([int((M * I).sum())], type=_I64),
            "w021D": pa.array([int((O * (O - 1) // 2).sum())], type=_I64),
            "w021U": pa.array([int((I * (I - 1) // 2).sum())], type=_I64),
            "w021C": pa.array([int((O * I).sum())], type=_I64),
            "degM": pa.array([int((deg * M).sum())], type=_I64),
            "degA": pa.array([int((deg * (O + I)).sum())], type=_I64),
        })

    vstats = (perv.map_batches(vfold, batch_format="pyarrow",
                               zero_copy_batch=True)
              .to_pandas().sum(axis=0))
    n = int(vstats["n_vertices"])

    # dyad class totals (one small reduce)
    def dfold(b: pa.Table) -> pa.Table:
        code = b.column("code").to_numpy()
        return pa.table({
            "n_mut": pa.array([int((code == 3).sum())], type=_I64),
            "n_asym": pa.array([int((code != 3).sum())], type=_I64)})

    dstats = (dy.map_batches(dfold, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas().sum(axis=0))
    n_mut, n_asym = int(dstats["n_mut"]), int(dstats["n_asym"])

    # ---- closed triples: support triangles + 3 code joins ----------
    und = dy.select_columns(["u", "v"]).map_batches(
        lambda b: pa.table({"src": b.column("u"), "dst": b.column("v")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    oriented = orient(und, cfg).materialize()
    o = oriented.select_columns(["src", "dst"])
    w = _wedges(oriented, cfg)
    w_schema = pa.schema([("a", _I64), ("b", _I64), ("u", _I64)])
    o_schema = pa.schema([("src", _I64), ("dst", _I64)])
    tri = hash_join(w, o, on=["a", "b"], right_on=["src", "dst"],
                    join_type="semi", num_parts=cfg.num_parts,
                    left_schema=w_schema, right_schema=o_schema)

    # vid-sort the triple and attach the 3 dyad codes
    def sort3(b: pa.Table) -> pa.Table:
        x = np.stack([b.column("u").to_numpy(), b.column("a").to_numpy(),
                      b.column("b").to_numpy()])
        x = np.sort(x, axis=0)
        return pa.table({"x1": pa.array(x[0], type=_I64),
                         "x2": pa.array(x[1], type=_I64),
                         "x3": pa.array(x[2], type=_I64)})

    t = tri.map_batches(sort3, batch_format="pyarrow",
                        zero_copy_batch=True)
    t_schema = pa.schema([("x1", _I64), ("x2", _I64), ("x3", _I64)])
    dy_schema = pa.schema([("u", _I64), ("v", _I64), ("code", _I64)])
    for i, (ka, kb, cname) in enumerate(
            [("x1", "x2", "c12"), ("x1", "x3", "c13"),
             ("x2", "x3", "c23")]):
        t = hash_join(t, dy, on=[ka, kb], right_on=["u", "v"],
                      right_cols=["code"], num_parts=cfg.num_parts,
                      left_schema=t_schema, right_schema=dy_schema)
        t = t.map_batches(
            lambda b, _c=cname: b.rename_columns(
                list(b.column_names[:-1]) + [_c]),
            batch_format="pyarrow", zero_copy_batch=True)
        t_schema = t_schema.append(pa.field(cname, _I64))

    # classify + fold per-type counts AND per-center class-pair
    # corrections in one pass (partial rows per block)
    names = list(TRIAD_NAMES)
    pair_keys = list(_PAIR_TYPE)

    def tfold(b: pa.Table) -> pa.Table:
        c12 = b.column("c12").to_numpy()
        c13 = b.column("c13").to_numpy()
        c23 = b.column("c23").to_numpy()
        bits = ((c12 & 1) | (c12 & 2)
                | ((c13 & 1) << 2) | ((c13 & 2) << 2)
                | ((c23 & 1) << 4) | ((c23 & 2) << 4))
        types = TRIAD_TABLE[bits]
        cols = {}
        for idx, nm in enumerate(names):
            cols["t_" + nm] = pa.array([int((types == idx).sum())],
                                       type=_I64)
        # corrections: for each closed triple and each center vertex,
        # the class pair of its two incident dyads.  center x1 sees
        # dyads (12),(13) as M/O/I from x1's side; x2 sees (12),(23);
        # x3 sees (13),(23) from the HIGH side (code 1 = low->high).
        def cls(code, low_side):
            out = np.full(code.shape, "I", dtype="U1")
            out[code == 3] = "M"
            out[(code == (1 if low_side else 2))] = "O"
            return out

        centers = [
            (cls(c12, True), cls(c13, True)),     # at x1 (low in both)
            (cls(c12, False), cls(c23, True)),    # at x2
            (cls(c13, False), cls(c23, False)),   # at x3
        ]
        corr = {k: 0 for k in pair_keys}
        for ca, cb in centers:
            for k in pair_keys:
                s = set(k)
                if len(s) == 1:
                    c = (k[0],)
                    corr[k] += int(((ca == c[0]) & (cb == c[0])).sum())
                else:
                    corr[k] += int((((ca == k[0]) & (cb == k[1]))
                                    | ((ca == k[1]) & (cb == k[0]))).sum())
        # cn class totals for the 1-dyad closed-form (how many closed
        # triples each dyad class participates in, summed)
        cn_mut = int((c12 == 3).sum() + (c13 == 3).sum()
                     + (c23 == 3).sum())
        cn_asym = int((c12 != 3).sum() + (c13 != 3).sum()
                      + (c23 != 3).sum())
        for k in pair_keys:
            cols["p_" + "".join(k)] = pa.array([corr[k]], type=_I64)
        cols["cn_mut"] = pa.array([cn_mut], type=_I64)
        cols["cn_asym"] = pa.array([cn_asym], type=_I64)
        return pa.table(cols)

    tstats = (t.map_batches(tfold, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas().sum(axis=0))

    census = {nm: int(tstats.get("t_" + nm, 0)) for nm in names}
    # 2-dyad types: per-vertex combinatorics minus closed corrections
    for (ka, kb), nm in _PAIR_TYPE.items():
        census[nm] = int(vstats["w" + nm]) - int(
            tstats.get("p_" + ka + kb, 0))
    # 1-dyad types: sum over dyads of (n - deg(u) - deg(v) + cn)
    census["012"] = n * n_asym - int(vstats["degA"]) + int(
        tstats.get("cn_asym", 0))
    census["102"] = n * n_mut - int(vstats["degM"]) + int(
        tstats.get("cn_mut", 0))
    total = n * (n - 1) * (n - 2) // 6
    census["003"] = total - sum(v for k, v in census.items() if k != "003")
    return census


def triad_census_table(edges, cfg: EngineConfig = DEFAULT) -> pa.Table:
    """Census as a 16-row (triad_type, n) Arrow table in canonical
    order."""
    c = triad_census(edges, cfg)
    return pa.table({
        "triad_type": pa.array(list(TRIAD_NAMES), type=pa.string()),
        "n": pa.array([c[k] for k in TRIAD_NAMES], type=_I64)})
