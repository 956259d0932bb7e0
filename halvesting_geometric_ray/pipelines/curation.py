"""End-to-end corpus curation: the composed training-data pipeline.

Chains the engine's text operators into the canonical web-corpus
cleanup a reference user would otherwise hand-wire:

  normalize -> language/quality filter -> PII scrub
            -> exact dedup (winner = min doc id)
            -> near-dup dedup (trigram-Jaccard pairs -> connected
               components -> keep cluster representative)
            -> optional hive-partitioned parquet sink

Every stage is one of the individually-oracled operators (see
COVERAGE.md); this module only composes them, so the pipeline inherits
their scale shapes: stateless batch kernels for the map stages, one
key-partitioned exchange for exact dedup, and the inverted-index +
shard-actor CC machinery for near-dup.  Nothing materializes the corpus
on the driver; with ``collect_stats=False`` (default) the whole thing
is a single streaming plan.
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.hashing import stable_hash64
from ..functions.text import (langid_batch, normalize_text_batch,
                              pii_scrub_batch, quality_batch)
from ..ops.dedup import keep_min_by
from ..ops.join import hash_join


def curate_corpus(docs, *, langs: Optional[List[str]] = None,
                  quality: bool = True,
                  quality_gates: tuple = (20, 400, 30),
                  pii: bool = True,
                  exact_dedup: bool = True, neardup: bool = False,
                  pair_cap: int = 1_000_000,
                  driver_hash_cap: int = 16_000_000,
                  workdir: Optional[str] = None,
                  out_path: Optional[str] = None,
                  collect_stats: bool = False):
    """Run the curation chain over a (doc_id, text) dataset.

    Returns (dataset, info): dataset has (doc_id, text, pred_lang);
    info records the enabled stages and, with ``collect_stats``,
    per-stage surviving row counts (stats mode materializes each stage
    — a diagnostic run, not the production path).

    ``neardup=True`` needs ``workdir`` (CC checkpoints).  Below
    ``pair_cap`` near-dup pairs the clusters collapse via a driver
    union-find over just the pairs (works with ANY int64 doc ids);
    past it the shard-actor CC engine runs, which needs dense-ish ids
    (vertex space = max id + 1; run ops.ids first for sparse corpora).

    ``driver_hash_cap``: corpora at or under this many surviving rows
    resolve exact dedup with one driver lexsort over the projected
    (hash, id) pairs (16 B/doc — 256 MB at the default cap) instead of
    the distributed combiner exchange; identical winner-by-min-id
    semantics (parity pinned in tests).  Past the cap the exchange
    path runs — that is the 10^12-doc shape.
    """
    if neardup and not workdir:
        raise ValueError("neardup=True requires a workdir")

    info: dict = {"stages": [], "counts": {}}

    def note(name, ds):
        info["stages"].append(name)
        if collect_stats:
            ds = ds.materialize()
            info["counts"][name] = ds.count()
        return ds

    # 1. normalize (NFC + casefold + control strip + ws collapse)
    def norm(b: pa.Table) -> pa.Table:
        out = normalize_text_batch(b)
        return pa.table({"doc_id": b.column("doc_id").cast(pa.int64()),
                         "text": out.column("text_norm")})

    ds = note("normalize", docs.map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True))

    # 2. fused language + quality gate (one pass, two cheap kernels)
    if langs or quality:
        langset = set(langs or [])

        def gate(b: pa.Table) -> pa.Table:
            keep = np.ones(b.num_rows, dtype=bool)
            lid = langid_batch(b)
            pred = lid.column("pred_lang")
            if langset:
                keep &= np.isin(
                    pred.to_numpy(zero_copy_only=False), list(langset))
            if quality:
                q = quality_batch(b, *quality_gates)
                keep &= q.column("keep").to_numpy(zero_copy_only=False)
            t = b.append_column("pred_lang", pred)
            return t.filter(pa.array(keep))

        ds = note("filter", ds.map_batches(
            gate, batch_format="pyarrow", zero_copy_batch=True))
    else:
        ds = ds.map_batches(
            lambda b: b.append_column(
                "pred_lang", pa.array(["?"] * b.num_rows,
                                      type=pa.string())),
            batch_format="pyarrow", zero_copy_batch=True)

    # 3. PII scrub (placeholders replace emails/phones)
    if pii:
        def scrub(b: pa.Table) -> pa.Table:
            out = pii_scrub_batch(b)
            return pa.table({"doc_id": b.column("doc_id"),
                             "text": out.column("clean_text"),
                             "pred_lang": b.column("pred_lang")})

        ds = note("pii_scrub", ds.map_batches(
            scrub, batch_format="pyarrow", zero_copy_batch=True))

    # 4. exact dedup: winner = min doc_id per normalized-text hash.
    # The text payload NEVER moves: only (hash, id) int pairs go through
    # the loser computation (subset_dup_losers' combiner emits
    # definite losers without shuffling them), then the loser set —
    # sized by duplicate mass, not corpus — broadcasts as an anti
    # semi-join.  Past ``loser_cap`` (pathological dup rates) fall back
    # to the full-row keep_min_by exchange.
    if exact_dedup:
        from ..ops.dedup import subset_dup_losers
        from ..ops.join import broadcast_semi

        def proj_h(b: pa.Table) -> pa.Table:
            return pa.table({"__h": pa.array(
                np.asarray(stable_hash64(b.column("text"))),
                type=pa.int64()), "doc_id": b.column("doc_id")})

        # hd IS materialized — WITHOUT the hash column: the loser scan
        # reads a cheap (hash, id) projection pass over it, and on a
        # clean corpus (or after the anti-filter) the materialized
        # layer itself is the result, so downstream consumption never
        # pays the drop-columns projection the old __h-carrying layer
        # forced on every consumer.  Re-running the normalize/PII
        # regex kernels instead of materializing costs more than one
        # object-store copy (measured 11.8 s vs 6.9 s at 8 CPUs on
        # 600k docs; blocks spill under pressure).
        hd = ds.materialize()
        n_rows = hd.count()
        if n_rows <= driver_hash_cap:
            # driver fast path: the projected (hash, id) pairs are
            # 16 B/doc — under the cap (default 256 MB) one lexsort on
            # the driver replaces the whole combiner exchange, which
            # for a mostly-unique corpus shuffles ~|corpus| rows to
            # discover ~nothing (measured 2.76 s of the 5.9 s chain at
            # 8 CPUs / 600k docs to find 0 losers).  Loser = any row
            # whose (hash-sorted, id-sorted) predecessor shares its
            # hash — identical winners-by-min-id semantics.
            # ONE batched ray.get: per-ref gets cost a driver RPC
            # round-trip each (~1-3 ms x blocks of serial wall)
            parts = [t for t in ray.get(
                hd.map_batches(proj_h, batch_format="pyarrow",
                               zero_copy_batch=True)
                .to_arrow_refs()) if t.num_rows]
            drop = np.array([], dtype=np.int64)
            if parts:
                tbl = pa.concat_tables(parts)
                h = tbl.column("__h").to_numpy(zero_copy_only=False)
                ids = tbl.column("doc_id").to_numpy(
                    zero_copy_only=False)
                order = np.lexsort((ids, h))
                hs = h[order]
                if hs.size:
                    drop = ids[order][np.r_[False, hs[1:] == hs[:-1]]]
            if drop.size:
                ds = broadcast_semi(
                    hd, "doc_id",
                    pa.table({"doc_id": pa.array(drop,
                                                 type=pa.int64())}),
                    "doc_id", anti=True)
            else:  # clean corpus: the anti-filter would be identity
                ds = hd
        else:
            # 10^12-doc path: distributed combiner exchange (definite
            # losers never shuffle), then loser-set broadcast under
            # loser_cap, full keep_min_by exchange past it
            losers = subset_dup_losers(
                hd.map_batches(proj_h, batch_format="pyarrow",
                               zero_copy_batch=True),
                "__h", "doc_id").materialize()
            loser_cap = 20_000_000  # ~160 MB of int64 ids broadcast
            if losers.count() <= loser_cap:
                ltbl = pa.concat_tables(
                    [t for t in ray.get(losers.to_arrow_refs())
                     if t.num_rows]) if losers.count() else \
                    pa.table({"doc_id": pa.array([], type=pa.int64())})
                ds = broadcast_semi(hd, "doc_id",
                                    ltbl, "doc_id", anti=True)
            else:
                def add_h(b: pa.Table) -> pa.Table:
                    return b.append_column("__h", pa.array(
                        np.asarray(stable_hash64(b.column("text"))),
                        type=pa.int64()))

                ds = keep_min_by(
                    hd.map_batches(add_h, batch_format="pyarrow",
                                   zero_copy_batch=True),
                    "__h", "doc_id").drop_columns(["__h"])
        ds = note("exact_dedup", ds)

    # 5. near-dup dedup: Jaccard pairs -> clusters -> keep representative.
    # The pair set is normally FAR smaller than the corpus, so the
    # default path union-finds the pairs on the driver and broadcasts
    # the (small) drop set as an anti semi-join — the corpus itself
    # keeps streaming.  Only past ``pair_cap`` pairs (boilerplate-heavy
    # corpora) does the shard-actor CC engine pay for itself.
    if neardup:
        from ..queries_text import neardup_jaccard_pairs

        base = ds.materialize()  # pairs + survivor filter both read it
        pairs = neardup_jaccard_pairs(base).materialize()

        if pairs.count() <= pair_cap:
            tbl = pa.concat_tables(
                [t for t in ray.get(pairs.to_arrow_refs())
                 if t.num_rows]) if pairs.count() else None
            drop = np.array([], dtype=np.int64)
            if tbl is not None:
                a = tbl.column("doc_a").to_numpy()
                b2 = tbl.column("doc_b").to_numpy()
                ids = np.unique(np.concatenate([a, b2]))
                parent = np.arange(len(ids))
                ia = np.searchsorted(ids, a)
                ib = np.searchsorted(ids, b2)

                def find(x):
                    while parent[x] != x:
                        parent[x] = parent[parent[x]]
                        x = parent[x]
                    return x

                for x, y in zip(ia, ib):
                    rx, ry = find(x), find(y)
                    if rx != ry:  # min-id root = min doc id (ids sorted)
                        parent[max(rx, ry)] = min(rx, ry)
                roots = np.array([find(i) for i in range(len(ids))])
                drop = ids[roots != np.arange(len(ids))]
            from ..ops.join import broadcast_semi

            ds = broadcast_semi(base, "doc_id",
                                pa.table({"doc_id": pa.array(
                                    drop, type=pa.int64())}),
                                "doc_id", anti=True)
        else:
            from ..fixtures import even_offsets
            from ..graph.components import connected_components

            def sym(b: pa.Table) -> pa.Table:
                a = b.column("doc_a").to_numpy()
                bb = b.column("doc_b").to_numpy()
                return pa.table({"src": pa.array(np.concatenate([a, bb])),
                                 "dst": pa.array(np.concatenate([bb, a]))})

            edges = pairs.map_batches(sym, batch_format="pyarrow",
                                      zero_copy_batch=True)
            n = int(base.max("doc_id") or 0) + 1
            num_parts = min(16, max(1, n // 64))
            wd = os.path.join(workdir, "curate_cc")
            shutil.rmtree(wd, ignore_errors=True)  # lineage does not
            # fingerprint edge content; never adopt a stale checkpoint
            labels, _ = connected_components(
                edges, even_offsets(n, num_parts), wd, job="curate_cc")
            reps = labels.map_batches(
                lambda b: pa.table({"keep_id": b.column("vid")}).filter(
                    pc.equal(b.column("vid"), b.column("label"))),
                batch_format="pyarrow", zero_copy_batch=True)
            ds = hash_join(
                base, reps, on="doc_id", right_on="keep_id",
                join_type="semi",
                left_schema=pa.schema([("doc_id", pa.int64()),
                                       ("text", pa.string()),
                                       ("pred_lang", pa.string())]),
                right_schema=pa.schema([("keep_id", pa.int64())]))
        ds = note("neardup_dedup", ds)

    if out_path:
        from ..sources.readers import write_partitioned_parquet

        write_partitioned_parquet(ds, out_path,
                                  partition_cols=["pred_lang"])
        info["out_path"] = out_path
    return ds, info
