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


# reference smart strategy hashes only files under 10MB
# (change_detector.py:160-167); larger files trust timestamp+size
SMART_HASH_MAX = 10 * 1024 * 1024


def content_hash(path: str, chunk_size: int = 8192) -> str:
    """SHA-256 of file content in 8KB chunks — the reference's
    calculate_file_hash (change_detector.py:224-247)."""
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(chunk_size):
            h.update(chunk)
    return h.hexdigest()


class SigCache:
    """(path, size, mtime) → content hash memo, persisted as JSON, so the
    hash/smart strategies re-hash a file only when its stat changes (the
    role the reference's file_metadata table plays)."""

    def __init__(self, path: Optional[str] = None) -> None:
        self.path = path
        self.data: Dict[str, str] = {}
        if path and os.path.exists(path):
            with open(path) as f:
                self.data = json.load(f)

    def sha(self, path: str, st: os.stat_result) -> str:
        key = f"{path}:{st.st_size}:{st.st_mtime_ns}"
        if key not in self.data:
            # evict superseded stat keys for the same path so touch/rewrite
            # cycles don't grow the persisted cache without bound
            prefix = f"{path}:"
            stale = [
                k for k in self.data
                if k.startswith(prefix) and k.rsplit(":", 2)[0] == path
            ]
            for k in stale:
                del self.data[k]
            self.data[key] = content_hash(path)
        return self.data[key]

    def save(self) -> None:
        if self.path:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            atomic_write_json(self.path, self.data)


def file_sig(path: str, strategy: str = "timestamp", cache: Optional[SigCache] = None):
    """Change signature used in phase lineage, mirroring the reference's
    three change-detection strategies (change_detector.py:64-223):

    * ``timestamp`` — [size, mtime_ns]: fast, but a touch-without-change
      rebuilds the partition.
    * ``hash`` — ["sha256", size, hexdigest]: content-addressed, stable
      under touch; always reads the file (or hits the SigCache).
    * ``smart`` — hash for files under 10MB (via the stat-keyed cache, so
      unchanged files cost one stat), timestamp+size above.

    A rewritten upstream artifact invalidates downstream partition
    manifests; artifacts whose signature is unchanged resume as a no-op."""
    st = os.stat(path)
    if strategy == "timestamp":
        return [st.st_size, st.st_mtime_ns]
    if strategy == "smart" and st.st_size >= SMART_HASH_MAX:
        return [st.st_size, st.st_mtime_ns]
    if strategy not in ("hash", "smart"):
        raise ValueError(f"unknown change strategy {strategy!r}")
    sha = cache.sha(path, st) if cache is not None else content_hash(path)
    return ["sha256", st.st_size, sha]


def files_sig(
    paths, strategy: str = "timestamp", cache: Optional[SigCache] = None
) -> Dict[str, list]:
    return {p: file_sig(p, strategy, cache) for p in paths}


def atomic_write_json(path: str, obj: Dict[str, Any]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
    os.replace(tmp, path)


def atomic_write_table(path: str, table, row_group_size: Optional[int] = None) -> None:
    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    if row_group_size is not None:
        pq.write_table(table, tmp, row_group_size=row_group_size)
    else:
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

