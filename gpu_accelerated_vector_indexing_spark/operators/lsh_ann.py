"""LSH-bucketed approximate nearest-neighbor search (EXT, SURVEY.md §2.3).

The IVF operators (operators/ivf.py) are the reference's own pruning
strategy (IVF.cpp:271-435); this module is the *alternative* scale path:
random-hyperplane (SimHash) bucketing. Each vector gets an ``n_planes``-
bit signature (bit j = sign of ⟨v, Hⱼ⟩); the query probes its own bucket
plus all buckets at Hamming distance <= 2 (multi-probe LSH), candidates are
fetched by an **equi-join on the bucket id** (hash shuffle / partition
pruning when the table is written bucketed-by-signature — never a scan),
and the final top-k is an exact cosine re-rank of the candidates.

Determinism across engines: hyperplane weights are INTEGERS from a
fixed-constant LCG (exact in float64 products), and the signature dot
product uses the same sequential left-fold as the cosine path, so Spark
and the DuckDB oracle compute bit-identical signs — the candidate sets
match exactly, not just statistically.

100 TB posture: signatures are computed once at write time in a real
deployment (column + bucket layout); probing touches ``n_planes + 1``
buckets ≈ (n_planes+1)/2^n_planes of the data, the candidate re-rank is
a ``TakeOrderedAndProject``, and the probe list (≤ n_planes+1 rows) is
broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_accelerated_vector_indexing_spark.functions.vector import (
    as_double_array,
    cosine_similarity,
    dot_product,
    lit_double_array,
)
from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

N_PLANES = 8
DIM = 64
SCORE_SCALE = 6
QUANT = 1048576.0  # 2^20: quantization scale for exact signature math


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[int]]:
    """Deterministic integer hyperplanes from a 64-bit LCG (MMIX
    constants). Integer weights in [-512, 512) keep every product
    float32 × int exactly representable in float64."""
    x = 0x9E3779B97F4A7C15
    planes: list[list[int]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            x = (6364136223846793005 * x + 1442695040888963407) % (1 << 64)
            row.append(int((x >> 40) % 1024) - 512)
        planes.append(row)
    return planes


def quantize(vec: Column) -> Column:
    """floor(x · 2^20) as integer-valued doubles: every signature
    product/sum then stays < 2^53 and is EXACT in IEEE float64, so the
    sign — and hence the bucket id — is identical in any engine and any
    summation order (no boundary flakiness)."""
    return F.transform(vec, lambda x: F.floor(x * F.lit(QUANT)).cast("double"))


def signature(vec: Column, planes: list[list[int]]) -> Column:
    """n-bit SimHash bucket id: bit j set iff ⟨quantize(vec), Hⱼ⟩ >= 0."""
    qv = quantize(vec)
    bits = [
        F.when(
            dot_product(qv, lit_double_array([float(w) for w in row])) >= 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
        for j, row in enumerate(planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("bigint")


# The signed corpus is INDEX STATE — "signatures are computed once at
# write time in a real deployment" (module docstring); memoized+cached
# per (session, corpus, n_planes) so queries probe, not re-sign.
_SIGNED_CACHE: dict[tuple[SparkSession, str, int], DataFrame] = {}


def _signed(spark: SparkSession, sf_dir: str, planes: list[list[int]]) -> DataFrame:
    key = (spark, sf_dir, len(planes))
    if key not in _SIGNED_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        df = emb.select(
            "vec_id",
            "embedding",
            signature(as_double_array("embedding"), planes).alias("bucket"),
        ).cache()
        df.count()
        _SIGNED_CACHE[key] = df
    return _SIGNED_CACHE[key]


def knn_lsh(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 5,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Multi-probe LSH ANN: probe the query bucket + every bucket within
    Hamming distance 2, exact-cosine re-rank of the candidates, top-k."""
    planes = hyperplanes(n_planes)
    signed = _signed(spark, sf_dir, planes)
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == query_id)
        .select(
            as_double_array("embedding").alias("qvec"),
            signature(as_double_array("embedding"), planes).alias("qbucket"),
        )
    )
    # multi-probe list: qbucket plus every 1- and 2-bit flip
    # (1 + n + n(n-1)/2 buckets — 37 of 256 at n_planes=8); still a
    # tiny broadcast relation, and recall@5 roughly doubles vs 1-bit
    masks = [0] + [1 << j for j in range(n_planes)] + [
        (1 << j) | (1 << l) for j in range(n_planes) for l in range(j + 1, n_planes)
    ]
    probes = q.select(
        "qvec",
        F.explode(
            F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)).cast("bigint") for m in masks])
        ).alias("bucket"),
    )
    candidates = signed.join(F.broadcast(probes), "bucket")
    return (
        candidates.select(
            "vec_id",
            F.round(
                cosine_similarity(as_double_array("embedding"), F.col("qvec")),
                SCORE_SCALE,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc("vec_id"))
        .limit(k)
    )


def lsh_bucket_stats(
    spark: SparkSession, sf_dir: str, n_planes: int = N_PLANES
) -> DataFrame:
    """Bucket-occupancy histogram of the signature space — the skew
    diagnostic that decides n_planes at scale (a hot bucket = a hot
    shuffle partition)."""
    planes = hyperplanes(n_planes)
    per_bucket = _signed(spark, sf_dir, planes).groupBy("bucket").agg(
        F.count("*").alias("n_vectors")
    )
    return per_bucket.agg(
        F.count("*").alias("n_buckets"),
        F.sum("n_vectors").alias("n_total"),
        F.max("n_vectors").alias("max_bucket"),
        F.min("n_vectors").alias("min_bucket"),
    )


def lsh_recall(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 5,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """recall@k of LSH ANN vs exact brute force (≙ the IVF recall
    contract, SURVEY.md §5.2)."""
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce

    exact = knn_bruteforce(spark, sf_dir, query_id=query_id, k=k).select("vec_id")
    approx = knn_lsh(spark, sf_dir, query_id=query_id, k=k, n_planes=n_planes)
    hits = approx.select("vec_id").join(exact, "vec_id", "left_semi")
    return hits.agg(
        F.count("*").alias("n_hits"),
        F.round(F.count("*") / F.lit(float(k)), 6).alias("recall"),
    )
