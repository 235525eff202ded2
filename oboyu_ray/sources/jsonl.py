"""JSONL transcript source — line-delimited JSON, the dominant interchange
format for scraped / annotated training-data corpora.

The engine's canonical input is the parquet transcript shard
(``BASELINE.json`` input_hint: conv_id, turn_idx, role, text, tool, ts);
JSONL is what scrapers and annotation tools emit.  The idiomatic Ray-Data
shape is normalize-at-the-edge: a distributed, RESUMABLE conversion pass
(one task per shard, atomic tmp+rename, skip-if-committed — the same
commit discipline as `sources/sinks.py`) into canonical parquet shards
that the existing `pipelines/build_index` path consumes unchanged.
Conversion cost is paid once; every downstream rebuild reads columnar
with column pruning — indexing straight off JSON would re-parse every
byte of text on every rebuild.

Parsing is pyarrow's native JSON reader with an EXPLICIT schema (ISO-8601
timestamps land directly in timestamp[us]; no Python-dict row path), so a
shard converts as one vectorized C++ pass.

Reference parity: the reference's crawler discovers and extracts file
corpora (crawler/services — text/markdown/PDF, see sources/files.py);
JSONL transcript shards are this engine's transcript-shaped equivalent of
"a new input format arrives at the edge".
"""

from __future__ import annotations

import os
from typing import Iterator, List

import pyarrow as pa
import pyarrow.json as pj
import pyarrow.parquet as pq

from oboyu_ray.sources.transcripts import TRANSCRIPT_SCHEMA

# ISO-8601 with microseconds — what json.dumps(datetime.isoformat()) emits
# and what pyarrow's explicit-schema timestamp parser accepts.
_TS_FORMAT = "%Y-%m-%dT%H:%M:%S.%f"


def _parse_ts(s: str):
    """Salvage-path timestamp parse accepting the common ISO-8601 variants
    real scraped data carries: fractional or whole seconds, trailing 'Z',
    numeric UTC offsets.  Zoned stamps normalize to naive UTC (the canonical
    schema is timestamp[us] without tz).  Raises on anything else — the
    caller quarantines the line."""
    from datetime import datetime, timezone

    txt = s.strip()
    if txt.endswith(("Z", "z")):
        txt = txt[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(txt)
    except ValueError:
        dt = datetime.strptime(s, _TS_FORMAT)
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def write_transcripts_jsonl(table: pa.Table, path: str) -> str:
    """Write a transcript table as one JSONL shard (test/export helper;
    atomic).  Timestamps serialize as ISO-8601 with microseconds so the
    round-trip through `read_jsonl_shard` is exact."""
    import json

    cols = table.to_pydict()
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for i in range(table.num_rows):
            row = {
                "conv_id": cols["conv_id"][i],
                "turn_idx": cols["turn_idx"][i],
                "role": cols["role"][i],
                "text": cols["text"][i],
                "tool": cols["tool"][i],
                "ts": cols["ts"][i].strftime(_TS_FORMAT),
            }
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    os.replace(tmp, path)
    return path


def read_jsonl_shard(path: str) -> pa.Table:
    """One JSONL shard → canonical transcript Arrow table (vectorized
    pyarrow JSON reader, explicit schema — ISO timestamps parse straight
    into timestamp[us], ints into int32; no per-row Python)."""
    t = pj.read_json(
        path, parse_options=pj.ParseOptions(explicit_schema=TRANSCRIPT_SCHEMA)
    )
    return t.select([f.name for f in TRANSCRIPT_SCHEMA])


def read_jsonl_shard_lenient(path: str):
    """(table, n_bad_lines): the salvage path for scraped shards — tries
    the vectorized reader first (zero cost on clean data) and only on
    failure falls back to per-line parsing, SKIPPING lines that are not
    valid JSON or do not coerce to the canonical schema.  Scraped corpora
    are never clean; a 10^12-turn ingest must quarantine-and-continue, not
    die at shard 31,417."""
    import json

    try:
        return read_jsonl_shard(path), 0
    except (pa.ArrowInvalid, ValueError):
        pass
    cols = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    n_bad = 0
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            if not line.strip():
                continue
            try:
                r = json.loads(line)
                row = (
                    str(r["conv_id"]), int(r["turn_idx"]), str(r["role"]),
                    str(r["text"]), str(r.get("tool", "")),
                    _parse_ts(str(r["ts"])),
                )
            except Exception:
                n_bad += 1
                continue
            for k, v in zip(cols, row):
                cols[k].append(v)
    return pa.Table.from_pydict(cols, schema=TRANSCRIPT_SCHEMA), n_bad


def read_transcripts_jsonl(paths: List[str]) -> "ray.data.Dataset":
    """JSONL shards as a streaming transcript Dataset (schema-coerced).

    One read task per shard; downstream stages see the exact canonical
    schema, so every transcript operator works on JSONL input unchanged."""
    import ray.data

    def load(batch: pa.Table) -> Iterator[pa.Table]:
        for p in batch.column("path").to_pylist():
            yield read_jsonl_shard(p)

    return ray.data.from_items([{"path": p} for p in sorted(paths)]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )


def jsonl_to_parquet_shards(
    jsonl_paths: List[str], out_dir: str, strict: bool = True
) -> List[str]:
    """Distributed, resumable JSONL→parquet shard conversion.

    One Ray task per input shard writes `<stem>.parquet` via tmp+rename;
    already-converted shards are skipped (crash-safe resume — a partial
    tmp file is never visible under the committed name).  Returns the
    parquet paths in input order, ready for `build_index`.

    ``strict=False`` quarantines malformed lines instead of failing the
    shard (`read_jsonl_shard_lenient`); per-shard bad-line counts merge
    into ``<out_dir>/conversion_manifest.json`` across resumes, so the
    ingest is auditable — skipped data is COUNTED, never silent."""
    import json

    import ray.data

    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    # Output names must be unique per INPUT PATH, not per basename —
    # data/*/shard.jsonl would otherwise map every directory's shard onto
    # one output and silently drop all but the first (ADVICE r3).  Stems
    # that collide get a deterministic short hash of the full input path
    # appended; unique stems keep their plain name so existing committed
    # conversions stay resumable.
    stems: dict = {}
    for p in jsonl_paths:
        stems.setdefault(os.path.splitext(os.path.basename(p))[0], []).append(p)
    if len(jsonl_paths) != len(set(jsonl_paths)):
        dup = sorted({p for p in jsonl_paths if jsonl_paths.count(p) > 1})
        raise ValueError(f"duplicate input paths: {dup[:5]}")
    out_paths = []
    todo = []
    for p in jsonl_paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        if len(stems[stem]) > 1:
            tag = hashlib.md5(os.path.abspath(p).encode()).hexdigest()[:10]
            stem = f"{stem}-{tag}"
        out = os.path.join(out_dir, stem + ".parquet")
        out_paths.append(out)
        if not os.path.exists(out):
            todo.append({"src": p, "dst": out})

    if todo:

        def convert(batch: pa.Table) -> Iterator[pa.Table]:
            for row in batch.to_pylist():
                if strict:
                    tbl, n_bad = read_jsonl_shard(row["src"]), 0
                else:
                    tbl, n_bad = read_jsonl_shard_lenient(row["src"])
                tmp = row["dst"] + ".tmp"
                pq.write_table(tbl, tmp)
                os.replace(tmp, row["dst"])
                yield pa.table(
                    {
                        "dst": [row["dst"]],
                        "rows": [tbl.num_rows],
                        "bad_lines": [n_bad],
                    }
                )

        done = (
            ray.data.from_items(todo)
            .map_batches(convert, batch_format="pyarrow", batch_size=1)
            .take_all()
        )
        manifest_path = os.path.join(out_dir, "conversion_manifest.json")
        manifest = {}
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
        for r in done:
            manifest[os.path.basename(r["dst"])] = {
                "rows": int(r["rows"]), "bad_lines": int(r["bad_lines"])
            }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True, indent=1)
        os.replace(tmp, manifest_path)
    return out_paths
