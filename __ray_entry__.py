"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship extraction pipeline over an interleaved corpus derived
    deterministically from sf0.001's documents table (text split into
    spans + synthetic media payloads interleaved), per BASELINE.json
    input_hint. Returns the lazy record Dataset."""
    from wine_label_ocr_ray.pipelines.extract import build_extract_pipeline
    from wine_label_ocr_ray.synth import derive_corpus_from_documents

    corpus = derive_corpus_from_documents(
        os.path.join(_SF0001, "documents.parquet"),
        "/tmp/wlor_corpus_sf0.001", seed=42)
    return build_extract_pipeline(corpus)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 +
    the training-data operator suite. Each callable takes ``sf_dir``."""
    from wine_label_ocr_ray.pipelines import queries as Q
    return Q.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (omitted for
    non-SQL-expressible ops -> driver records rows-only checks)."""
    from wine_label_ocr_ray.pipelines import queries as Q
    return Q.ORACLE_SQL
