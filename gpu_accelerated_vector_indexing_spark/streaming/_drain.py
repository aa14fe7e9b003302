"""Shared Structured-Streaming plumbing for the drained foreachBatch
queries: the embeddings stream reader and the accumulate-drain harness
used by ``vector_stream.streaming_knn`` and
``graph_stream.streaming_graph_attach`` (one definition of the fixture
schema / source glob / checkpoint / lineage-cut accumulation instead of
a copy per module)."""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

EMB_STREAM_SCHEMA = "vec_id long, embedding array<float>, label int"


def embeddings_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The embeddings fixture as a file stream. ``max_files_per_trigger``
    throttles arrivals so tests can force MULTIPLE micro-batches and pin
    batching-invariance."""
    reader = spark.readStream.schema(EMB_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(os.path.join(sf_dir, "embeddings.parque*"))


def drain_accumulate(
    src: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    checkpoint_prefix: str,
) -> DataFrame:
    """Run ``src`` to completion, applying ``transform`` to each
    micro-batch and accumulating the results with ``localCheckpoint``
    lineage truncation (O(1) lineage in batch count). Raises a clear
    error when the stream produced no micro-batches (e.g. the source
    glob matched no files) instead of a bare KeyError."""
    state: dict[str, DataFrame] = {}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df)
        merged = state["df"].unionByName(out) if "df" in state else out
        state["df"] = merged.localCheckpoint(eager=True)

    q = (
        src.writeStream.outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix=checkpoint_prefix))
        .foreachBatch(fold)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if "df" not in state:
        raise ValueError(
            "stream drained zero micro-batches — the source glob matched no files"
        )
    return state["df"]

DOCS_STREAM_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The documents fixture as a file stream — one definition of the
    schema/glob shared by the dedup and curation streams."""
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(os.path.join(sf_dir, "documents.parque*"))

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The events fixture as a file stream — the alerting/monitoring
    ingest shape (one definition of the schema/glob)."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(os.path.join(sf_dir, "events.parque*"))
