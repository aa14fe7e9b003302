"""Streaming incremental dedup: a document stream checked against the
static archive signature state.

The Structured-Streaming twin of ``operators.dedup.incremental_dedup``
— the production shape where "today's crawl" ARRIVES as a stream and
the archive index is a materialized static table:

    docs stream → per-doc MinHash bands (stateless projection)
        → stream-static join vs the archive band relation
        → exact-Jaccard verify vs archive shingle arrays (static join)
        → per-new-doc best match (streaming agg, complete mode)

Scale posture: the band projection is stateless (the signature fold is
a per-row expression, reference-free); the archive sides are static
DataFrames derived from the memoized dedup index state (broadcast or
bucket-joined per micro-batch — the stream never shuffles for the
join); the only stateful operator is the per-new-doc max aggregate,
whose state is one (jaccard, doc_id) struct per streamed doc.

Oracle: complete-mode drain over the bounded fixture slice equals the
batch incremental query restricted to docs with ≥1 band collision, so
the query carries a full DuckDB value oracle (queries/dedup_q.py).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_accelerated_vector_indexing_spark.streaming._drain import (
    documents_stream,
    scoped_stream_partitions,
)
from gpu_accelerated_vector_indexing_spark.operators.dedup import (
    HASH_MOD,
    band_keys,
    INCR_BATCH_MOD,
    INCR_BATCH_REM,
    INCR_THRESHOLD,
    SHINGLE_LEN,
    grams_state,
    minhash_from_grams,
    raw_shingle_hashes,
    sigs_state,
)

_sink_lock = threading.Lock()
_sink_n = [0]



def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the document stream to completion against the static archive
    state and return the per-new-doc best-match verdicts."""
    with _sink_lock:
        _sink_n[0] += 1
        name = f"gpu_accelerated_vector_indexing_sdedup_{_sink_n[0]}"

    # static archive sides, from the memoized dedup index state
    is_batch = F.col("doc_id") % INCR_BATCH_MOD == INCR_BATCH_REM
    arch_bands = band_keys(sigs_state(spark, sf_dir).filter(~is_batch)).select(
        F.col("doc_id").alias("corpus_doc_id"), "band", "key"
    )
    arch_grams = (
        grams_state(spark, sf_dir)
        .filter(~is_batch & (F.col("len_chars") >= SHINGLE_LEN))
        .select(F.col("doc_id").alias("corpus_doc_id"), F.col("gh").alias("ghb"), F.col("n").alias("nb"))
    )

    # the new-batch document stream: stateless shingle/signature projection
    raw = documents_stream(spark, sf_dir)
    # gh derives from gha in a SECOND projection: inlining both off the
    # raw text would run the O(len·SHINGLE_LEN) shingle fold twice per
    # row (Catalyst does not dedupe the common subexpression across
    # separate aliases here)
    batch_docs = raw.filter(is_batch & (F.length("text") >= SHINGLE_LEN)).select(
        "doc_id",
        raw_shingle_hashes(F.col("text")).alias("gha"),
    ).withColumn("gh", F.transform(F.col("gha"), lambda h: h % F.lit(HASH_MOD)))
    # the signature fold and the banding both carry the raw-hash
    # payload through (keep=) — a streaming DF cannot re-join itself to
    # fetch gh back, and the verify stage needs it
    stream_side = minhash_from_grams(batch_docs, keep=("gha",)).withColumn(
        "na", F.size("gha")
    )
    bands_with_payload = band_keys(stream_side, keep=("gha", "na")).withColumnRenamed(
        "doc_id", "new_doc_id"
    )

    inter = F.size(F.array_intersect(F.col("gha"), F.col("ghb")))
    verified = (
        bands_with_payload.join(arch_bands, ["band", "key"])  # stream-static
        .join(arch_grams, "corpus_doc_id")
        .select(
            "new_doc_id",
            "corpus_doc_id",
            F.round(inter / (F.col("na") + F.col("nb") - inter), 6).alias("jaccard"),
        )
    )
    # duplicate (multi-band) pairs collapse inside the max — no distinct
    # needed, so the only stateful operator is this aggregate
    best = verified.groupBy("new_doc_id").agg(
        F.max(F.struct("jaccard", "corpus_doc_id")).alias("best")
    )
    out = best.select(
        "new_doc_id",
        F.col("best.jaccard").alias("best_jaccard"),
        F.col("best.corpus_doc_id").alias("best_match_doc_id"),
        (F.col("best.jaccard") >= INCR_THRESHOLD).alias("is_duplicate"),
    )
    with scoped_stream_partitions(spark, sf_dir, "documents"):
        q = out.writeStream.outputMode("complete").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)
