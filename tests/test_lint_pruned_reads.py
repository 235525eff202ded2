"""Lint gate: every ``ray.data.read_parquet`` call in the library must pass
``columns=`` so only needed columns leave storage (VERDICT r3 #4/#9).

AST-based, not grep, so multi-line calls are handled.  Own-artifact reads
where every column is required are whitelisted explicitly, with the reason
stated next to the entry — add to the whitelist only with a comment.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "oboyu_ray"

# (relative path, function name) pairs allowed to read all columns.
WHITELIST = {
    # pq_index codes dir is our own artifact: (vec_id, code_0..code_M) are
    # ALL consumed by the ADC scan — pruning would drop needed subcodes.
    ("state/pq_index.py", "pq_persisted_topk"),
}


def _read_parquet_calls(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            name = f.attr if isinstance(f, ast.Attribute) else getattr(f, "id", "")
            if name == "read_parquet":
                yield node


def _enclosing_funcs(tree: ast.AST):
    """Map each call lineno to the innermost enclosing function name."""
    spans = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            spans.append((node.lineno, node.end_lineno, node.name))
    spans.sort(key=lambda s: s[1] - s[0])  # innermost (smallest) first

    def lookup(lineno: int) -> str:
        for lo, hi, name in spans:
            if lo <= lineno <= hi:
                return name
        return "<module>"

    return lookup


def test_all_read_parquet_calls_prune_columns():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        tree = ast.parse(path.read_text(), filename=rel)
        fn_of = _enclosing_funcs(tree)
        for call in _read_parquet_calls(tree):
            has_columns = any(k.arg == "columns" for k in call.keywords)
            if has_columns:
                continue
            if (rel, fn_of(call.lineno)) in WHITELIST:
                continue
            offenders.append(f"{rel}:{call.lineno} in {fn_of(call.lineno)}")
    assert not offenders, (
        "read_parquet without columns= (add columns or whitelist with a "
        "reason):\n  " + "\n  ".join(offenders)
    )
