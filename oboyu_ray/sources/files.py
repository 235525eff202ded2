"""File-corpus source: discovery → decode → front-matter (SURVEY §2-S1/S2/S3).

The `oboyu index DIR` ingestion front half, Ray-Data-first:

* ``discover_files`` — reference `crawler/discovery.py` semantics subset:
  recursive walk with include/exclude glob patterns, max depth 10, max file
  size 10 MB, symlinks not followed.  Driver-side listing (file *planning*
  is metadata work, like `read_parquet`'s); the file list then fans out to
  parallel reader tasks.
* ``read_documents`` — per-file map tasks: bytes → text decode (UTF-8 with
  latin-1 fallback; the reference's chardet/charset-normalizer cascade for
  Shift-JIS/EUC-JP is availability-gated the same way its other optional
  deps are) → markdown front-matter split for ``title`` / ``uri`` metadata
  (reference `content_extractor.py:208-257`; implemented with stdlib — a
  leading ``---`` YAML block with simple ``key: value`` lines, which is the
  subset the reference's metadata extraction reads).
"""

from __future__ import annotations

import fnmatch
import os
import re
from typing import Dict, Iterator, List, Optional, Tuple

import pyarrow as pa

import ray.data

MAX_DEPTH = 10  # discovery.py:31
MAX_FILE_SIZE = 10 * 1024 * 1024  # discovery.py:47

try:  # availability gate, same pattern as the reference's optional deps
    import frontmatter  # type: ignore

    HAS_FRONTMATTER = True
except ImportError:
    HAS_FRONTMATTER = False

try:  # PDF extraction gate — reference optimized_pdf_processor.py:18-24
    import pymupdf  # type: ignore
    import pymupdf4llm  # type: ignore

    HAS_PDF = True
except ImportError:
    pymupdf = None
    pymupdf4llm = None
    HAS_PDF = False

_FM_RE = re.compile(r"\A---\s*\n(.*?)\n---\s*\n?", re.DOTALL)


def extract_pdf(path: str) -> str:
    """PDF → markdown text via pymupdf4llm (reference
    optimized_pdf_processor.py:164-243).  Availability-gated exactly like
    the reference: a clear ImportError with install guidance when the libs
    are absent (true in this container); .pdf files are only DISCOVERED
    when the gate is open, so the default pipeline never hits this."""
    if not HAS_PDF:
        raise ImportError(
            "PDF processing requires pymupdf4llm; install with "
            "pip install 'pymupdf4llm>=0.0.25'"
        )
    doc = pymupdf.open(path)
    try:
        return pymupdf4llm.to_markdown(doc)
    finally:
        doc.close()


def generate_title(path: str, content: str, meta: Dict[str, str]) -> str:
    """Reference crawler.py:251-275: front-matter title → first content line
    (< 100 chars, no '.') → filename stem."""
    if meta.get("title"):
        return str(meta["title"])
    if content and content.strip():
        first_line = content.strip().splitlines()[0].strip()
        if len(first_line) < 100 and "." not in first_line:
            return first_line
    return os.path.splitext(os.path.basename(path))[0]


def discover_files(
    root: str,
    include_patterns: Optional[List[str]] = None,
    exclude_patterns: Optional[List[str]] = None,
    max_depth: int = MAX_DEPTH,
    max_file_size: int = MAX_FILE_SIZE,
) -> List[str]:
    """Recursive discovery with glob filters; deterministic sorted output.
    ``*.pdf`` joins the default include set only when the PDF gate is open."""
    include = include_patterns or (["*.txt", "*.md"] + (["*.pdf"] if HAS_PDF else []))
    exclude = exclude_patterns or []
    root = os.path.abspath(root)
    out: List[str] = []
    for dirpath, dirnames, filenames in os.walk(root, followlinks=False):
        depth = os.path.relpath(dirpath, root).count(os.sep)
        if os.path.relpath(dirpath, root) != "." and depth + 1 >= max_depth:
            dirnames[:] = []
        for f in filenames:
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, root)
            if not any(fnmatch.fnmatch(f, pat) for pat in include):
                continue
            if any(fnmatch.fnmatch(rel, pat) or fnmatch.fnmatch(path, pat) for pat in exclude):
                continue
            try:
                if os.path.getsize(path) > max_file_size:
                    continue
            except OSError:
                continue
            out.append(path)
    return sorted(out)


def decode_bytes(raw: bytes) -> str:
    """UTF-8 first; latin-1 as the total fallback (the reference's chardet
    cascade is availability-gated and chardet is absent here)."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def parse_front_matter(content: str) -> Tuple[str, Dict[str, str]]:
    """content → (body, metadata).  With python-frontmatter installed this
    delegates to it (reference path); the stdlib fallback parses a leading
    ``---`` block of ``key: value`` lines and reads the same fields the
    reference extracts (title, uri, created_at, updated_at as strings)."""
    if HAS_FRONTMATTER:  # pragma: no cover
        post = frontmatter.loads(content)
        meta = {
            k: str(post.metadata[k])
            for k in ("title", "uri", "created_at", "updated_at")
            if k in post.metadata
        }
        return post.content, meta
    m = _FM_RE.match(content)
    if not m:
        return content, {}
    meta: Dict[str, str] = {}
    for line in m.group(1).splitlines():
        if ":" in line:
            k, _, v = line.partition(":")
            k = k.strip()
            if k in ("title", "uri", "created_at", "updated_at"):
                meta[k] = v.strip().strip("\"'")
    return content[m.end():], meta


def read_documents(
    paths: List[str], files_per_task: int = 16
) -> "ray.data.Dataset":
    """File list → Dataset(path, title, uri, text) via parallel reader tasks."""
    groups = [
        {"files": paths[s : s + files_per_task]}
        for s in range(0, len(paths), files_per_task)
    ]

    def read_group(batch: pa.Table) -> Iterator[pa.Table]:
        for row in batch.to_pylist():
            cols: Dict[str, List] = {"path": [], "title": [], "uri": [], "text": []}
            for path in row["files"]:
                if path.lower().endswith(".pdf"):
                    body, meta = extract_pdf(path), {}
                else:
                    with open(path, "rb") as f:
                        raw = f.read()
                    body, meta = parse_front_matter(decode_bytes(raw))
                cols["path"].append(path)
                cols["title"].append(generate_title(path, body, meta))
                cols["uri"].append(meta.get("uri", ""))
                cols["text"].append(body)
            yield pa.table(
                {k: pa.array(v, type=pa.string()) for k, v in cols.items()}
            )

    return ray.data.from_items(groups).map_batches(
        read_group, batch_format="pyarrow", batch_size=1
    )
