"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``gpu_accelerated_vector_indexing_spark/``; the query/oracle registry is
``gpu_accelerated_vector_indexing_spark.queries`` (one module per operator family).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gpu_accelerated_vector_indexing_spark.queries import merged

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's whole online hot path (SURVEY.md §3.1): scan →
    cosine score → top-k → document mapback → 200-char snippet.
    """
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_with_docs

    return knn_with_docs(spark, SMOKE_SF_DIR, query_id=0, k=5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return merged()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-expressible query."""
    return merged()[1]
