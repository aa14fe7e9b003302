"""Parquet fixture sources (TESTDATA.md tables).

The canonical storage format of the engine is Parquet: columnar,
predicate-pushdown- and partition-pruning-capable — the Spark-native
replacement for the reference's raw float32 ``.bin`` cluster files
(reference IVF.cpp:456-486) and JSON article directories
(reference IVF.cpp:84-101). Raw-binary/NPY ingestion parity lives in
``sources.binary``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from gpu_accelerated_vector_indexing_spark.session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (spark, sf_dir, name) → relation. DataFrames are immutable and lazy, so
# handing the same object to every caller is safe; memoizing skips the
# per-call footer read + schema inference that spark.read.parquet does on
# the driver (measurable across a 75-query registry run). Keyed on the
# session OBJECT so a stopped/recreated session never serves stale plans.
_RELATION_CACHE: dict[tuple[SparkSession, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table.

    Column pruning and predicate pushdown reach the scan because this
    returns the bare relation — callers compose filters/projections on
    top and Catalyst pushes them down (SURVEY.md §4).
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    key = (spark, sf_dir, name)
    if key not in _RELATION_CACHE:
        if name == "events":
            _RELATION_CACHE[key] = _load_events(spark, sf_dir)
        else:
            _RELATION_CACHE[key] = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _RELATION_CACHE[key]


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize events.ts to whole seconds, adapting to the fixture's
    physical type: TIMESTAMP(NANOS) parquet (older driver testdata) is
    unreadable by Spark, so read nanos as long and integer-`div` to seconds
    (double division would lose precision at 1.7e18); TIMESTAMP[us] (current
    testdata) reads natively and gets date_trunc. Oracle SQL applies the
    identical second-truncation (see streaming_q / temporal_q views)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(raw.schema["ts"].dataType, LongType):
        ts = F.timestamp_seconds(F.expr("ts div 1000000000"))
    else:
        ts = F.date_trunc("second", F.col("ts"))
    return raw.select(
        "event_id",
        ts.alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tune_session(spark)
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
