"""Multimodal column handling (EXT, SURVEY.md §2.3).

Images/audio/video are opaque ``BINARY`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators. The heavy codecs (PIL,
torchaudio, …) are NOT in this environment, so the decode step is
gated behind an import-try with a deterministic fake fallback — the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is real and oracle-tested where expressible.

The fixture corpus has no real media, so ``documents.text`` UTF-8
bytes stand in as the payload (≙ treating the article store,
IVF.cpp:87, as a binary modality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table


def attach_binary(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload BINARY, meta STRUCT).

    The schema every multimodal operator below consumes: payload is
    opaque bytes; meta carries mime/size so planners can filter without
    decoding (predicate pushdown never needs the payload).
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col("text")).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, mime: str):
    """Decode a binary payload into a media object.

    Real codecs are unavailable in this container: PIL/librosa imports
    are attempted and a deterministic fake is returned otherwise.
    """
    if mime.startswith("image/"):
        try:
            import io

            from PIL import Image  # noqa: F401 — not installed here

            return Image.open(io.BytesIO(payload))
        except ImportError as exc:
            raise NotImplementedError(
                "image decode requires PIL, which is not installed; "
                "use multimodal_features for the deterministic fake path"
            ) from exc
    # deterministic fake "decode": the byte buffer itself
    return payload


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Computes per-payload features (byte length, simulated frame count,
    first/last byte) in Arrow-sized batches — the exact execution shape
    a real image/audio featurizer would use, with the decode swapped
    for the deterministic fake.
    """
    import pandas as pd

    binp = attach_binary(load_table(spark, sf_dir, "documents"))

    def extract(batches):
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(p) for p in payloads],
                    "n_frames": [len(p) // 1000 + 1 for p in payloads],
                    "first_byte": [p[0] if p else None for p in payloads],
                    "last_byte": [p[-1] if p else None for p in payloads],
                }
            )

    return binp.mapInPandas(
        extract, schema="doc_id long, byte_len long, n_frames long, first_byte int, last_byte int"
    )


def frame_sample(spark: SparkSession, sf_dir: str, n_frames: int = 4) -> DataFrame:
    """Frame sampling: split each payload into n evenly-spaced chunks.

    ≙ video frame-sampling plumbing: one input row fans out to n
    (doc_id, frame_idx, frame_bytes) rows inside the Arrow batch.
    """
    import pandas as pd

    binp = attach_binary(load_table(spark, sf_dir, "documents"))

    def sample(batches):
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                if len(p) < n_frames:  # too small to sample
                    continue
                step = len(p) // n_frames
                for i in range(n_frames):
                    chunk = p[i * step : i * step + step]
                    out.append((doc_id, i, len(chunk)))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_bytes"])

    return binp.mapInPandas(sample, schema="doc_id long, frame_idx int, frame_bytes long")


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan: filters/aggregates on meta without touching
    payloads (the cheap path a 100 TB media table must support)."""
    binp = attach_binary(load_table(spark, sf_dir, "documents"))
    return (
        binp.select("doc_id", "meta.mime", "meta.n_bytes", "meta.lang")
        .groupBy("mime", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").cast("long").alias("max_bytes"),
        )
    )


def corpus_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the text/vector twin tables —
    the ops check a multimodal store runs after every ingest: documents
    without an embedding row, embeddings without a document, id-space
    stats (range + gap count) on each side, and dimension consistency.

    One full outer join on the shared id plus two bounded aggregates;
    at 100 TB both sides are id-sorted parquet, so the join is a
    sort-merge over co-partitioned scans and the output is ONE row.
    """
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.size("embedding").alias("dim")
    )
    joined = docs.withColumn("has_doc", F.lit(1)).join(
        emb.withColumn("has_vec", F.lit(1)), "id", "full_outer"
    )
    return joined.agg(
        F.count("*").alias("n_ids"),
        F.sum(F.when(F.col("has_vec").isNull(), 1).otherwise(0)).alias("docs_without_vec"),
        F.sum(F.when(F.col("has_doc").isNull(), 1).otherwise(0)).alias("vecs_without_doc"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
        (F.max("id") - F.min("id") + 1 - F.count("*")).alias("id_gaps"),
        F.count_distinct(F.col("dim")).alias("n_distinct_dims"),
    )
