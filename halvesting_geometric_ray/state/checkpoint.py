"""Per-iteration, per-partition checkpointing with lineage + metrics.

The reference checkpoints only model training (ModelCheckpoint,
link_prediction.py:95-97) and restarts its build only at the coarse
nodes/edges boundary (build_metadata.py:84-87).  The north rule requires
finer grain: every analytics iteration persists per-partition state
(rank/label + delta) with a lineage manifest so a failed job resumes
MID-iteration — completed partitions of the in-flight iteration are
loaded from parquet and only the missing ones are recomputed.

Layout:
    {root}/{job}/manifest.json            # lineage + per-iter metrics
    {root}/{job}/iter_{k:05d}/part-{p:05d}.parquet   # atomic (tmp+rename)
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Set

import pyarrow as pa
import pyarrow.parquet as pq


class IterativeCheckpoint:
    def __init__(self, root: str, job: str, lineage: Dict) -> None:
        self.dir = os.path.join(root, job)
        os.makedirs(self.dir, exist_ok=True)
        self.manifest_path = os.path.join(self.dir, "manifest.json")
        self.lineage = lineage
        self.manifest = self._load_or_init()

    def _load_or_init(self) -> Dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                m = json.load(f)
            if m.get("lineage") == self.lineage:
                return m
        # Input changed (or manifest missing while part files linger):
        # stale iter_*/part-*.parquet would otherwise be silently adopted
        # by the purely filesystem-based have_parts() — wipe them so only
        # files written under the current lineage are visible.
        self._clear_iter_dirs()
        return {"lineage": self.lineage, "iters": {}}

    def _clear_iter_dirs(self) -> None:
        import shutil

        if not os.path.isdir(self.dir):
            return
        for f in os.listdir(self.dir):
            if f.startswith("iter_"):
                shutil.rmtree(os.path.join(self.dir, f), ignore_errors=True)

    def _save(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self.manifest_path)

    def iter_dir(self, k: int) -> str:
        d = os.path.join(self.dir, f"iter_{k:05d}")
        os.makedirs(d, exist_ok=True)
        return d

    def part_path(self, k: int, p: int) -> str:
        return os.path.join(self.iter_dir(k), f"part-{p:05d}.parquet")

    @staticmethod
    def write_part(table: pa.Table, path: str) -> None:
        """Atomic per-partition write — called from inside gather tasks."""
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)

    def have_parts(self, k: int) -> Set[int]:
        """Partitions of iteration k already durable on disk."""
        d = os.path.join(self.dir, f"iter_{k:05d}")
        if not os.path.isdir(d):
            return set()
        out = set()
        for f in os.listdir(d):
            if f.startswith("part-") and f.endswith(".parquet"):
                out.add(int(f[5:10]))
        return out

    def commit_iter(self, k: int, metrics: Dict, parts: List[int]) -> None:
        self.manifest["iters"][str(k)] = {
            "complete": True,
            "metrics": metrics,
            "parts": sorted(parts),
        }
        self._save()

    def latest_complete(self) -> Optional[int]:
        done = [int(k) for k, v in self.manifest["iters"].items() if v.get("complete")]
        return max(done) if done else None

    def metrics_history(self) -> List[Dict]:
        return [self.manifest["iters"][k]["metrics"]
                for k in sorted(self.manifest["iters"], key=int)]

    def state_files(self, k: int, parts: Optional[Set[int]] = None) -> List[str]:
        have = self.have_parts(k)
        use = have if parts is None else (have & parts)
        return [self.part_path(k, p) for p in sorted(use)]
