"""oboyu_ray — a Ray-Data-native full-text (BM25) indexing and query engine.

A from-scratch reimplementation of the query/data-processing capabilities of
sonesuke/oboyu's BM25 core, designed for Ray Data streaming execution over
Parquet transcript tables at 10^12-turn scale.  See SURVEY.md for the
blueprint and ARCHITECTURE notes in pipelines/build_index.py.
"""

__version__ = "0.1.0"
