"""Interchange-format sinks/sources: CSV, JSON-lines, ORC.

The reference's only interchange formats are raw float32 ``.bin`` and
JSON article files (SURVEY.md §2.2 "Scans" row — no Parquet/CSV/ORC);
the engine standardizes on Parquet and treats the text formats as
ingestion/export utilities. ``roundtrip_check`` puts each sink+source
pair under the driver's value-hash gate: write the events fact table
out, read it back with an explicit schema (never inferSchema — at
100 TB schema inference is an extra full scan), and aggregate — the
result must match the same aggregate computed directly on the parquet
source, or the format pair corrupted data.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

_SCHEMA = "event_id long, user_id long, event_type string, value double"
FORMATS = ("csv", "json", "orc")


def roundtrip_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per format: ``(fmt, n_rows, sum_ids, sum_value)`` after a
    write→read round trip of events (ts/props excluded: CSV has no
    lossless nanosecond-timestamp contract and that's a format property,
    not an engine one).

    Aggregates are decimal-exact, so any row lost or value mangled by a
    format pair breaks the oracle hash.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    frames = []
    tmp = tempfile.mkdtemp(prefix="gpu_accelerated_vector_indexing_fmt_")
    try:
        for fmt in FORMATS:
            path = f"{tmp}/{fmt}"
            writer = ev.write.mode("overwrite").format(fmt)
            if fmt == "csv":
                writer = writer.option("header", "true")
            writer.save(path)
            reader = spark.read.format(fmt).schema(_SCHEMA)
            if fmt == "csv":
                reader = reader.option("header", "true")
            back = reader.load(path)
            frames.append(
                back.agg(
                    F.lit(fmt).alias("fmt"),
                    F.count("*").alias("n_rows"),
                    F.sum("event_id").alias("sum_ids"),
                    F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
                )
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        # materialize before the temp dirs disappear; rebuild as a
        # JVM-literal frame (createDataFrame from a Python list spins a
        # Python worker — see index_build.kmeans_assign)
        rows = out.collect()
        structs = [
            F.struct(
                F.lit(r.fmt).alias("fmt"),
                F.lit(r.n_rows).cast("long").alias("n_rows"),
                F.lit(r.sum_ids).cast("long").alias("sum_ids"),
                F.lit(float(r.sum_value)).alias("sum_value"),
            )
            for r in rows
        ]
        return (
            spark.range(1)
            .select(F.explode(F.array(*structs)).alias("s"))
            .select("s.fmt", "s.n_rows", "s.sum_ids", "s.sum_value")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
