"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship keyphrase-boosted BM25 query at
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 plus the training-data pipeline ops, with DuckDB
oracles wherever the semantics are SQL-replayable — including the
machines one might assume aren't: the BIO decode state machine, the full
Arrow tagger surface (injectable rule), the complete SimHash pipeline
(SQL-expressible token hash), transitive near-dup clustering (recursive
CTE), the 5-stage curation chain, and the sequence-packing kernel
(recursive-CTE fold). Only 3 entries are rows-only: the 2
production-hash variants (``keyphrase_extract`` blake2b,
``simhash_pairs`` xxhash64) and the float64-logsumexp ``crf_loss`` —
each pinned by a pure-Python parity pytest AND sharing its pipeline
with an oracle-gated twin (``keyphrase_extract_ruled``,
``simhash_fp_pairs``, ``crf_loss_toy``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dlkp_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in contract.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL ops)."""
    return {name: sql for name, (_fn, sql) in contract.QUERIES.items() if sql}
