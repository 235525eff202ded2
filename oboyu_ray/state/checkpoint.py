"""Per-partition checkpoint manifests with lineage + metrics.

"Resumable from checkpoint" for a batch pipeline (north rule): every build
phase writes its partition outputs to temp files, atomically renames them,
then commits a small JSON manifest recording the partition id, its input
lineage (files / conv ranges), row counts, content fingerprint and timings.
On re-run a phase anti-joins its partition list against the committed
manifests (J4 analog in SURVEY §2.4) and skips finished work; a killed run
resumes mid-build and produces byte-identical artifacts (tests/test_build_pipeline.py).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional


def file_sig(path: str) -> List[int]:
    """(size, mtime_ns) change signature — the reference's timestamp+size
    change-detection strategy (change_detector.py:64-132).  Used in phase
    lineage so a rewritten upstream artifact invalidates downstream
    partition manifests; untouched artifacts keep their signature and the
    downstream phase resumes as a no-op."""
    st = os.stat(path)
    return [st.st_size, st.st_mtime_ns]


def files_sig(paths) -> Dict[str, List[int]]:
    return {p: file_sig(p) for p in paths}


def atomic_write_json(path: str, obj: Dict[str, Any]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
    os.replace(tmp, path)


def atomic_write_table(path: str, table) -> None:
    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


class Manifest:
    """Manifest store for one build phase under <workdir>/manifests/<phase>."""

    def __init__(self, workdir: str, phase: str) -> None:
        self.dir = os.path.join(workdir, "manifests", phase)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, part_id: int | str) -> str:
        return os.path.join(self.dir, f"part-{part_id}.json")

    def get(self, part_id: int | str) -> Optional[Dict[str, Any]]:
        p = self._path(part_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_done(self, part_id: int | str, lineage: Optional[Dict[str, Any]] = None) -> bool:
        m = self.get(part_id)
        if m is None:
            return False
        if lineage is not None and m.get("lineage") != lineage:
            return False  # inputs changed → rebuild
        return all(os.path.exists(p) for p in m.get("outputs", []))

    def commit(
        self,
        part_id: int | str,
        outputs: List[str],
        lineage: Optional[Dict[str, Any]] = None,
        metrics: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        m = {
            "part_id": part_id,
            "outputs": outputs,
            "lineage": lineage or {},
            "metrics": metrics or {},
            "committed_at": time.time(),
        }
        atomic_write_json(self._path(part_id), m)
        return m

