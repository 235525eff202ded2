"""Result sinks — resumable partitioned Parquet output.

`write_result` lands any driver-contract query result (Dataset / pandas /
Arrow) as Parquet with a small manifest (row count, schema, timing) written
LAST, so a consumer can treat `_MANIFEST.json` as the commit marker: a
killed write leaves no manifest and the re-run overwrites cleanly (the
write-then-commit idempotency pattern the index build uses per partition).
Datasets stream straight to multiple files via `ds.write_parquet` — never
one giant file; small driver-side frames land as a single part file.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from oboyu_ray.state.checkpoint import atomic_write_json

MANIFEST = "_MANIFEST.json"


def write_result(
    result: Any,
    out_dir: str,
    partition_cols: Optional[list] = None,
) -> Dict[str, Any]:
    """Write a query result to ``out_dir`` as parquet + commit manifest."""
    t0 = time.time()
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    if isinstance(result, ray.data.Dataset):
        if partition_cols:
            result.write_parquet(out_dir, partition_cols=partition_cols)
        else:
            result.write_parquet(out_dir)
        files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(out_dir)
            for f in fs
            if f.endswith(".parquet")
        )
        n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        schema = pq.ParquetFile(files[0]).schema_arrow if files else pa.schema([])
    else:
        table = (
            result
            if isinstance(result, pa.Table)
            else pa.Table.from_pandas(pd.DataFrame(result), preserve_index=False)
        )
        path = os.path.join(out_dir, "part-00000.parquet")
        pq.write_table(table, path)
        files = [path]
        n_rows = table.num_rows
        schema = table.schema

    manifest = {
        "n_rows": int(n_rows),
        "n_files": len(files),
        "columns": schema.names,
        "wall_sec": round(time.time() - t0, 3),
        "committed_at": time.time(),
    }
    atomic_write_json(os.path.join(out_dir, MANIFEST), manifest)
    return manifest


def is_committed(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, MANIFEST))
