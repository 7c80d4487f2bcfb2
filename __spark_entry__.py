"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship keyphrase-boosted BM25 query at
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with DuckDB oracles where ANSI-SQL can express the
semantics (non-SQL ops — BIO decode, MinHash/SimHash candidate
generation, LSH ANN, binary feature extraction — are rows-only and covered
by pytest against pure-Python oracles instead).
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
