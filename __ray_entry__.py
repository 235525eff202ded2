"""Driver contract for the oboyu_ray engine.

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init`` / ``ray.shutdown``.

* ``entry()`` — flagship pipeline at sf0.001: BM25 top-k over the documents
  table via the Dataset-native scorer.
* ``queries()`` — one callable per implemented operator (SURVEY.md §2).
* ``oracle_sql()`` — DuckDB-equivalent SQL for each query where expressible;
  omitted keys get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from oboyu_ray.pipelines.entry_queries import q_bm25_topk

    return q_bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from oboyu_ray.pipelines.corpus_queries import corpus_queries
    from oboyu_ray.pipelines.entry_queries import core_queries

    return {**core_queries(), **corpus_queries()}


def oracle_sql() -> dict[str, str]:
    from oboyu_ray.pipelines.corpus_queries import corpus_oracle_sql
    from oboyu_ray.pipelines.entry_queries import core_oracle_sql

    return {**core_oracle_sql(), **corpus_oracle_sql()}
