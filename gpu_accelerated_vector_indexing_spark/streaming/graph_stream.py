"""Streaming graph-index maintenance: NEW vectors arrive as a stream
and each micro-batch attaches to the live adjacency state — the
Structured-Streaming twin of ``operators.graph_ann.graph_ann_insert``,
completing the family symmetry the dedup index already has
(``incremental_dedup`` ↔ ``streaming_incremental_dedup``).

Per micro-batch (inside ``foreachBatch``, so windowed top-k is
available):

    new-vector ids → static grouping metadata join (the build's own
        seed groupings, precomputed once from the corpus — index
        metadata, never recomputed per batch)
        → batch→archive seed pairs (grouping-partner joins)
        → ONE refinement hop through the masked archive adjacency
        → score (memoized normed state) → per-node top-k
        → accumulate attached edges (localCheckpoint lineage cut)

Stream ≡ batch BY CONSTRUCTION: every candidate for node *n* is
generated in the micro-batch carrying *n* (seeds pair the batch row
against STATIC archive partners; the refine hop walks STATIC archive
adjacency), and each node arrives exactly once — so the per-node top-k
is batch-local and the drained union over any batching equals the
one-shot batch attach. The DuckDB oracle is therefore the batch twin's
(queries/_graph_ann_oracle.insert_digest_sql), and batching-invariance
is pinned separately in tests via ``maxFilesPerTrigger``.

Scale posture: the static sides (grouping metadata, archive adjacency,
normed vectors) are memoized index state — broadcast or bucket-joined
per micro-batch; candidate volume per batch is
Θ(batch·SEED_WINDOW·(1+K)), scaling with the BATCH and never with the
archive. Accumulated state is the attached edge list itself (k rows per
new node), localCheckpoint-ed so lineage stays O(1) in batch count.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
    GRAPH_INSERT_MODULUS,
    K_GRAPH,
    _grouped,
    _rank_digest,
    _score_pairs,
    _topk_per_node,
    fixture_graph,
    fixture_normed,
)
from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table


def streaming_graph_attach(
    spark: SparkSession,
    sf_dir: str,
    modulus: int = GRAPH_INSERT_MODULUS,
    k: int = K_GRAPH,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain the new-vector stream, attaching each micro-batch to the
    masked live adjacency; returns the build-digest shape (per neighbor
    rank: count, exact score sum, nbr id sum) over ALL attached edges —
    value-identical to ``graph_ann_insert`` regardless of batching."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb_n = fixture_normed(spark, sf_dir)
    adj = fixture_graph(spark, sf_dir)
    arch_adj = adj.filter(
        (F.col("node") % modulus != 0) & (F.col("nbr") % modulus != 0)
    ).select("node", "nbr")
    # grouping ASSIGNMENTS are build-time index metadata: computed once
    # from the static corpus (identical to the batch twin's _seed_pairs
    # input), the batch side just looks its rows up by id
    grouped = _grouped(emb)
    arch_g = grouped.filter(F.col("vec_id") % modulus != 0)

    reader = spark.readStream.schema("vec_id long, embedding array<float>, label int")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(os.path.join(sf_dir, "embeddings.parque*"))
    new_ids = raw.filter(F.col("vec_id") % modulus == 0).select("vec_id")

    state: dict[str, DataFrame] = {}

    def attach_batch(batch_df: DataFrame, batch_id: int) -> None:
        bg = grouped.join(batch_df.select("vec_id"), "vec_id")
        cells = (
            bg.alias("a")
            .join(
                arch_g.alias("b"),
                (F.col("a.label") == F.col("b.label")) & (F.col("a.cg") == F.col("b.cg")),
            )
            .filter(F.col("a.vec_id") != F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("node"), F.col("b.vec_id").alias("nbr"))
        )
        blocks = (
            bg.alias("a")
            .join(arch_g.alias("b"), "blk")
            .filter(F.col("a.vec_id") != F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("node"), F.col("b.vec_id").alias("nbr"))
        )
        seed = cells.union(blocks).distinct()
        refine = (
            seed.alias("s")
            .join(arch_adj.alias("g"), F.col("s.nbr") == F.col("g.node"))
            .filter(F.col("s.node") != F.col("g.nbr"))
            .select(F.col("s.node").alias("node"), F.col("g.nbr").alias("nbr"))
        )
        cand = seed.union(refine).distinct()
        attached = _topk_per_node(_score_pairs(cand, emb_n), k)
        merged = state["df"].unionByName(attached) if "df" in state else attached
        state["df"] = merged.localCheckpoint(eager=True)

    q = (
        new_ids.writeStream.outputMode("append")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="gpu_accelerated_vector_indexing_sgraph_"),
        )
        .foreachBatch(attach_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _rank_digest(state["df"])
