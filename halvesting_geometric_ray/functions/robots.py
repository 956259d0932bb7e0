"""Robots-exclusion crawl-permission filtering (RFC 9309 longest-match
semantics, single user-agent group): given a per-host rule table
(host, allow, path_prefix), decide every url by the MATCHING rule with
the longest prefix — ties broken allow-wins (the REP rule), then by
prefix for full determinism; a url with no matching rule is allowed.

This is the crawl-side admission filter every corpus pipeline runs
before fetching; here it runs retroactively over an already-crawled
page table (which urls SHOULD we have fetched?).

Scale shape: the rule table is inherently host-bounded (robots files
are small) — broadcast once via ray.put as {host: [(prefix, allow)]};
the decision pass is a stateless map_batches that groups each batch by
host and runs vectorized startswith per rule.  No exchange.

Reference anchor: the reference's clean-set membership filter
(link_prediction_metadata.py:365) is the same admission-gate shape
with exact-id membership; this is the prefix-rule upgrade.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

import ray


def split_host_path(urls: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """scheme://host/a/b/... -> (host, '/a/b/...'): host is the third
    '/'-segment, path is everything after it (any number of segments;
    a url with no path yields '/').  Null urls map to ('', '/') — they
    match no host rule, so they fall through to the allowed-by-default
    branch, mirroring the SQL oracle's NULL-propagation."""
    hosts = np.empty(len(urls), dtype=object)
    paths = np.empty(len(urls), dtype=object)
    for i, u in enumerate(urls):
        if u is None:
            hosts[i] = ""
            paths[i] = "/"
            continue
        parts = u.split("/")
        hosts[i] = parts[2] if len(parts) > 2 else ""
        paths[i] = "/" + "/".join(parts[3:])
    return hosts, paths


def robots_decide(pages, rules_ref, *, url_col: str = "url"):
    """``rules_ref``: ray.put of {host: [(prefix, allow), ...]}.
    Returns (url, allowed, rule_prefix) — rule_prefix '' when no rule
    matched (allowed by default)."""

    def decide(b: pa.Table) -> pa.Table:
        rules: Dict[str, List[Tuple[str, bool]]] = ray.get(rules_ref)
        urls = np.asarray(b.column(url_col).to_pylist(), dtype=object)
        hosts, paths = split_host_path(urls)
        allowed = np.ones(len(urls), dtype=bool)
        matched = np.full(len(urls), "", dtype=object)
        best_len = np.full(len(urls), -1, dtype=np.int64)
        best_allow = np.zeros(len(urls), dtype=bool)
        for host in set(hosts.tolist()):
            hr = rules.get(host)
            if not hr:
                continue
            # prefix-ascending iteration + no-replace-on-equal gives
            # the SQL (len DESC, allow DESC, prefix ASC) tie order
            hr = sorted(hr)
            sel = np.flatnonzero(hosts == host)
            sub = paths[sel]
            for prefix, allow in hr:
                m = np.fromiter((p.startswith(prefix) for p in sub),
                                dtype=bool, count=len(sub))
                li = len(prefix)
                idx = sel[m]
                # longest wins; ties -> allow wins; then prefix asc
                better = (li > best_len[idx]) | (
                    (li == best_len[idx]) & allow & ~best_allow[idx])
                upd = idx[better]
                best_len[upd] = li
                best_allow[upd] = allow
                matched[upd] = prefix
        has = best_len >= 0
        allowed = np.where(has, best_allow, True)
        return pa.table({
            "url": b.column(url_col),
            "allowed": pa.array(allowed, type=pa.bool_()),
            "rule_prefix": pa.array(matched.tolist(),
                                    type=pa.string())})

    return pages.map_batches(decide, batch_format="pyarrow",
                             zero_copy_batch=True)
