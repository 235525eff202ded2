"""Text processing operators: chunking, snippets, highlighting.

Faithful reimplementations of the reference's text-processing semantics
(verified against importlib-loaded reference classes in
tests/test_textproc.py):

* chunk_text        — sliding-window chunker with paragraph/sentence boundary
                      snapping, reference indexer/core/document_chunker.py:27-113
                      (SURVEY §2-M4).  Exposed both as a pure function and as
                      a flat-map style ``map_batches`` stage (1 doc → n chunk
                      rows) for long-text mode; the transcript index keeps
                      1 turn = 1 doc per the north rule.
* extract_snippet   — match-window snippet extraction,
                      retriever/search/snippet_extractor.py:9-107.
* highlight_matches — word-boundary highlighting with ``**{}**`` format,
                      retriever/search/text_highlighter.py:19-101.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import pyarrow as pa

# ------------------------------------------------------------------ chunking

DEFAULT_CHUNK_SIZE = 1024
DEFAULT_CHUNK_OVERLAP = 256
_MAX_ITER = 10_000

_SENTENCE_BREAKS = (". ", "。", "! ", "？", "? ", "！", "\n")


def _best_break_point(text: str, start: int, end: int, chunk_size: int) -> int:
    """document_chunker.py:80-113: prefer the last paragraph break past the
    half-window, else the latest sentence break past the half-window (+1 to
    include the punctuation), else the hard cut."""
    half = start + chunk_size // 2
    paragraph_break = text.rfind("\n\n", start, end)
    if paragraph_break != -1 and paragraph_break > half:
        return paragraph_break
    breaks = [text.rfind(sep, start, end) for sep in _SENTENCE_BREAKS]
    valid = [b for b in breaks if b != -1 and b > half]
    if valid:
        return max(valid) + 1
    return end


def chunk_text(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> List[str]:
    """Reference document_chunker.py:27-78 semantics exactly: empty /
    whitespace-only → [""], short text → [text], else overlapping windows
    with boundary snapping, stripped, empty chunks dropped, with the same
    forced-progress guard against pathological boundaries."""
    if not text or not text.strip():
        return [""]
    if len(text) <= chunk_size:
        return [text]
    chunks: List[str] = []
    start = 0
    it = 0
    while start < len(text) and it < _MAX_ITER:
        it += 1
        end = start + chunk_size
        if end < len(text):
            end = _best_break_point(text, start, end, chunk_size)
        chunk = text[start:end].strip()
        if chunk:
            chunks.append(chunk)
        old_start = start
        start = end - chunk_overlap if end < len(text) else len(text)
        if start <= old_start and it > 1:
            start = old_start + max(1, chunk_size // 2)
    return chunks


def chunk_batch(
    batch: pa.Table,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Flat-map chunking stage: (id, text) rows → (id, chunk_index, chunk)
    rows.  chunk_index mirrors the reference's per-document enumeration
    (document_processor.py:85-105)."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_ids: List = []
    out_idx: List[int] = []
    out_chunks: List[str] = []
    for d, t in zip(ids, texts):
        for i, c in enumerate(chunk_text(t or "", chunk_size, chunk_overlap)):
            out_ids.append(d)
            out_idx.append(i)
            out_chunks.append(c)
    return pa.table(
        {
            id_col: pa.array(out_ids, type=batch.column(id_col).type),
            "chunk_index": pa.array(out_idx, type=pa.int32()),
            "chunk": pa.array(out_chunks, type=pa.string()),
        }
    )


# ------------------------------------------------------------------ snippets

def find_match_positions(
    content: str, terms: List[str], case_sensitive: bool = False
) -> List[Tuple[int, int]]:
    """(start, end) spans of every term occurrence, in position order."""
    if not content:
        return []
    hay = content if case_sensitive else content.lower()
    spans: List[Tuple[int, int]] = []
    for t in terms:
        if not t:
            continue
        needle = t if case_sensitive else t.lower()
        at = hay.find(needle)
        while at != -1:
            spans.append((at, at + len(needle)))
            at = hay.find(needle, at + 1)
    return sorted(spans)


def extract_snippet(
    content: str,
    match_positions: List[Tuple[int, int]],
    length: int = 200,
    context_window: int = 50,
) -> str:
    """snippet_extractor.py:9-107 semantics: center on the first match,
    expand symmetrically toward the target length, grow to cover every
    match, truncate from the end if over-length."""
    if not content or not content.strip():
        return ""
    if not match_positions:
        return content if len(content) <= length else content[:length].strip()
    first = match_positions[0]
    center = (first[0] + first[1]) // 2
    start = max(0, center - context_window)
    end = min(len(content), center + context_window)
    cur = end - start
    if cur < length:
        expansion = (length - cur) // 2
        new_start = max(0, start - expansion)
        new_end = min(len(content), end + expansion)
        for ms, me in match_positions:
            new_start = min(new_start, ms)
            new_end = max(new_end, me)
        if new_end - new_start > length:
            new_end = new_start + length
        start, end = new_start, min(len(content), new_end)
    return content[start:end]


def snippet_for_terms(
    content: str, terms: List[str], length: int = 200, context_window: int = 50
) -> str:
    return extract_snippet(
        content, find_match_positions(content, terms), length, context_window
    )


# ------------------------------------------------------------------ highlight

DEFAULT_HIGHLIGHT_FORMAT = "**{}**"


def highlight_matches(
    text: str,
    matches: List[str],
    case_sensitive: bool = False,
    highlight_format: str = DEFAULT_HIGHLIGHT_FORMAT,
) -> str:
    """text_highlighter.py:19-80: per-term word-boundary regex substitution;
    terms shorter than 2 chars are skipped; each term applied in order over
    the running result (so earlier insertions are visible to later terms,
    exactly like the reference)."""
    if not matches:
        return text
    out = text
    for m in matches:
        if len(m) < 2:
            continue
        flags = 0 if case_sensitive else re.IGNORECASE
        pattern = re.compile(r"\b" + re.escape(m) + r"\b", flags)
        out = pattern.sub(lambda g: highlight_format.format(g.group()), out)
    return out


def highlight_query(text: str, query: str, case_sensitive: bool = False) -> str:
    if not query:
        return text
    return highlight_matches(text, query.split(), case_sensitive)


def remove_highlights(text: str) -> str:
    return re.sub(r"\*\*(.*?)\*\*", r"\1", text)
