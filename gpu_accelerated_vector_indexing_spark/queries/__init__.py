"""Named query registry: every operator the engine claims is here.

Each family module exposes
  QUERIES: dict[name, Callable[[SparkSession, str], DataFrame]]
  ORACLES: dict[name, str]      # DuckDB ANSI SQL; omit → rows-only check

The driver contract (``__spark_entry__.py``) merges all families.
Column names are aliased identically in the Spark code and the oracle
SQL — the driver's compare hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def merged() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from gpu_accelerated_vector_indexing_spark.queries import (
        approx_q,
        curation_q,
        dedup_q,
        ivf_q,
        knn_q,
        lsh_q,
        modern_q,
        multimodal_q,
        relational_q,
        streaming_q,
        temporal_q,
        text_q,
        udx_q,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (
        knn_q,
        ivf_q,
        lsh_q,
        modern_q,
        relational_q,
        temporal_q,
        approx_q,
        curation_q,
        dedup_q,
        text_q,
        multimodal_q,
        streaming_q,
        udx_q,
    ):
        overlap = queries.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    missing = oracles.keys() - queries.keys()
    if missing:
        raise ValueError(f"oracle without query: {missing}")
    return queries, oracles
