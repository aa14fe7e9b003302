"""Sketch aggregates and deterministic sampling (EXT, SURVEY.md §2.3).

At 100 TB, exact ``count(DISTINCT ...)`` forces a full shuffle of every
distinct value; the engine therefore exposes the sketch path
(HyperLogLog++ via ``approx_count_distinct``, KLL-style quantiles via
``percentile_approx``) — both are single-pass, mergeable, partial-
aggregable, and bounded-memory. Sketches are approximate, so their
oracle checks are *property* checks (error within bound → boolean
flag), not value equality.

Sampling is done with a **portable multiplicative hash** instead of
``df.sample``: ``(id * A + B) mod M`` with constants small enough that
the arithmetic stays exact in 64-bit integers in every engine. That
makes the sample deterministic, reproducible across engines (exact
DuckDB oracle), stable under repartitioning, and — unlike seeded
``sample()`` — independent of partition layout, which is what a
training-data pipeline needs for train/test splits at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

# multiplicative-hash constants (Knuth 2654435761; modulus a prime).
# max |hash input| = max_id * A + B ≈ 5e5 * 2.7e9 ≈ 1.3e15 < 2^63: exact.
HASH_A = 2654435761
HASH_B = 12345
HASH_M = 1000003

# hll flag bound: 3x the default HLL++ rsd (0.05)
HLL_REL_ERR = 0.15
# approx-median rank must land in the central band
P50_RANK_LO, P50_RANK_HI = 0.4, 0.6

TRAIN_FRAC, VAL_FRAC = 0.8, 0.1
STRATA_FRACS = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "ja": 0.25}
DEFAULT_FRAC = 0.2


def portable_hash_unit(id_col: Column) -> Column:
    """Deterministic hash of an id to [0, 1): same value in any engine."""
    return ((id_col.cast("bigint") * HASH_A + HASH_B) % HASH_M) / F.lit(float(HASH_M))


def sketch_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact distinct users, plus two sketch property
    flags — HLL cardinality within 15% of exact, and the approximate
    median's true rank within [0.4, 0.6]. The flags (not the sketch
    values) are the cross-engine contract."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact_users"),
        F.approx_count_distinct("user_id").alias("hll_users"),
        F.percentile_approx("value", 0.5).alias("p50_approx"),
        F.count("*").alias("n_events"),
    )
    # true rank of the approximate median: one more aggregate pass
    ranked = (
        ev.join(
            F.broadcast(per_type.select("event_type", "p50_approx")), "event_type"
        )
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.when(F.col("value") <= F.col("p50_approx"), 1).otherwise(0))
                / F.count("*")
            ).alias("p50_rank")
        )
    )
    return (
        per_type.join(ranked, "event_type")
        .select(
            "event_type",
            "n_exact_users",
            "n_events",
            (
                F.abs(F.col("hll_users") - F.col("n_exact_users"))
                / F.col("n_exact_users")
                <= HLL_REL_ERR
            ).alias("hll_ok"),
            (
                (F.col("p50_rank") >= P50_RANK_LO) & (F.col("p50_rank") <= P50_RANK_HI)
            ).alias("p50_ok"),
        )
    )


def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of the documents
    table by hash bucket — reproducible on any engine, any partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    u = portable_hash_unit(F.col("doc_id"))
    split = (
        F.when(u < TRAIN_FRAC, "train")
        .when(u < TRAIN_FRAC + VAL_FRAC, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", "lang", split.alias("split"))


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sample: each stratum keeps its own
    hash-threshold fraction (en down-weighted vs the rest is the classic
    LLM-corpus rebalance). Exact row-level oracle — no RNG involved."""
    docs = load_table(spark, sf_dir, "documents")
    u = portable_hash_unit(F.col("doc_id"))
    frac = F.lit(DEFAULT_FRAC)
    for lang, f in STRATA_FRACS.items():
        frac = F.when(F.col("lang") == lang, F.lit(f)).otherwise(frac)
    return docs.filter(u < frac).select("doc_id", "lang", "source")


CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 256  # buckets per row
# 2-universal hash family h_d(u) = ((u mod P)·A_d + B_d mod P) mod W —
# the textbook CMS construction (Cormode & Muthukrishnan '05 §2), in
# plain BIGINT arithmetic every engine reproduces exactly: P < 2³¹ keeps
# each product < 2⁶², so nothing overflows an int64 anywhere.
CMS_P = 2**31 - 1
CMS_AS = (1_000_003, 1_000_033, 1_000_037, 1_000_039)
CMS_BS = (12_345, 54_321, 98_765, 56_789)


def _cms_bucket(key, d: int):
    return F.pmod(
        F.pmod(F.pmod(key, F.lit(CMS_P)) * F.lit(CMS_AS[d]) + F.lit(CMS_BS[d]), F.lit(CMS_P)),
        F.lit(CMS_WIDTH),
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str, top_n: int = 20) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) heavy hitters:
    estimated event counts per user from a d×w = 4×256 counter table,
    beside the exact count so the one-sided error (estimate ≥ truth,
    inflated only by collisions) is visible in the output.

    The sketch is the scale story: the counter table is d·w rows
    REGARDLESS of key cardinality — at 100 TB a per-key exact count
    shuffles billions of keys, the sketch shuffles 1024 counters (the
    update explode is map-side partial-aggregated). Estimation joins
    each candidate's d (row, bucket) coordinates against the tiny
    broadcast sketch. The hash family is the portable 2-universal
    construction (constants above), so the WHOLE sketch — counters,
    estimates, collisions — replays in ANSI SQL and the query carries a
    full value oracle (r3; it was rows-only while the buckets came from
    the engine-specific xxhash64). The ≥-truth invariant and top-set
    quality remain pinned in tests.
    """
    ev = load_table(spark, sf_dir, "events")
    coords = ev.select(
        "user_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("row"),
                    _cms_bucket(F.col("user_id"), d).alias("bucket"),
                )
                for d in range(CMS_DEPTH)
            ])
        ).alias("c"),
    ).select("user_id", "c.row", "c.bucket")
    sketch = coords.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact"))
    est = (
        exact.select("user_id", "exact")
        .select(
            "user_id",
            "exact",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(d).alias("row"),
                        _cms_bucket(F.col("user_id"), d).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ])
            ).alias("c"),
        )
        .select("user_id", "exact", "c.row", "c.bucket")
        .join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("user_id", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    return (
        est.orderBy(F.desc("exact"), F.desc("user_id"))
        .limit(top_n)
        .select("user_id", "exact", "est")
    )
