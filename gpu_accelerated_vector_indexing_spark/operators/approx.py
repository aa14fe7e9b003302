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

import math

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
    """Deterministic hash of an id to [0, 1): same value in any engine.

    Mod-reduce BEFORE the multiply: ``((id % M) · A + B) % M`` equals
    ``(id·A + B) % M`` in exact arithmetic, but the reduced form's
    product stays < 2⁶² for ANY id — the raw form silently wraps int64
    past id ≈ 3.5e9 (exactly the 100 TB regime this hash exists for).
    """
    h = (id_col.cast("bigint") % HASH_M) * HASH_A + HASH_B
    return (h % HASH_M) / F.lit(float(HASH_M))


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


def _cms_coords(ev: DataFrame, *keep_cols: str) -> DataFrame:
    """One ``(…keep_cols, row, bucket)`` coordinate row per (event,
    hash-row) — the single definition of the CMS update fan-out, shared
    by :func:`cms_heavy_hitters` and :func:`cms_merge` so a hash-family
    retune cannot leave the two sketches computing different buckets."""
    return ev.select(
        *keep_cols,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("row"),
                    _cms_bucket(F.col("user_id"), d).alias("bucket"),
                )
                for d in range(CMS_DEPTH)
            ])
        ).alias("c"),
    ).select(*keep_cols, "c.row", "c.bucket")


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
    coords = _cms_coords(ev, "user_id")
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


# --- deterministic HyperLogLog (full value oracle) ----------------------------
# The distinct-count workhorse at 100 TB: registers are mergeable
# map-side partials (groupBy(key, bucket).max — one tiny shuffle), and
# because the hash is the engine-portable modular family the whole
# sketch — registers AND estimate — replays exactly in ANSI SQL, so
# unlike approx_count_distinct (whose HLL++ internals are JVM-private,
# hence the flag-only contract in sketch_functions) this one sits under
# a full value hash.
HLL_M = 256  # registers (2^8): rsd ≈ 1.04/√m = 6.5%
HLL_REST_BITS = 23  # hash bits above the bucket index feeding the rank
# affine → QUADRATIC → affine, all mod CMS_P. A chain of affine rounds
# composes into another affine map (still a lattice for sequential ids
# — measured ×1.7 bias in the rank statistic); the h² step breaks the
# linearity, and the measured worst-case estimate error over
# sequential-id windows drops to 11% (< the 15% bound). Every product
# stays < 2⁶² — exact BIGINT in any engine.
HLL_A, HLL_B = 1_000_081, 24_683
HLL_A2, HLL_B2 = 1_000_099, 777_777

# Linear-counting lookup: zeros (empty registers) is an INTEGER in
# [1, m-1], so m·ln(m/zeros) is tabulated ONCE here (pre-floor-scaled)
# and both engines read the identical literal doubles — no engine libm
# ln() on any path, whose 1-ULP differences could flip the floor.
_HLL_LC_TABLE: list[float] = [
    math.floor(HLL_M * math.log(HLL_M / z) * 10000) / 10000 for z in range(1, HLL_M)
]
# bare decimal literals parse as DECIMAL in both engines — force DOUBLE
HLL_LC_VALUES = ", ".join(repr(v) for v in _HLL_LC_TABLE)  # oracle (::DOUBLE[] cast)
HLL_LC_VALUES_SPARK = ", ".join(f"{v!r}D" for v in _HLL_LC_TABLE)  # D-suffixed


def _hll_rho(rest: Column) -> Column:
    """Rank = leading zeros of ``rest`` in a HLL_REST_BITS-wide field,
    plus 1 — pure integer comparisons (no log/bit ops), identical in any
    engine: rest ∈ [2^(W-1), 2^W) → 1; rest = 0 → W + 1."""
    lz = sum(
        F.when(rest < F.lit(1 << (HLL_REST_BITS - i)), 1).otherwise(0)
        for i in range(1, HLL_REST_BITS + 1)
    )
    return (lz + F.lit(1)).alias("rho")


def _hll_hashed(ev: DataFrame) -> DataFrame:
    """``(event_type, bucket, rho)`` — the single definition of the HLL
    hash chain (affine → quadratic → affine mod CMS_P, then bucket/rank
    split), shared by :func:`hll_distinct` and :func:`hll_merge` so a
    mixing retune (it changed once already, the r3 quadratic fix)
    cannot leave the two sketches silently computing different hashes."""
    h1 = F.pmod(
        F.pmod(F.col("user_id").cast("bigint"), F.lit(CMS_P)) * F.lit(HLL_A)
        + F.lit(HLL_B),
        F.lit(CMS_P),
    )
    h = F.pmod(F.pmod(h1 * h1, F.lit(CMS_P)) * F.lit(HLL_A2) + F.lit(HLL_B2), F.lit(CMS_P))
    return ev.select(
        "event_type",
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        _hll_rho(F.floor(h / F.lit(HLL_M)).cast("bigint")),
    )


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact distinct users vs a from-scratch
    deterministic HLL estimate (Flajolet et al. 2007), with the relative
    error and the ≤``HLL_REL_ERR`` acceptance flag.

    Estimator: raw = α·m² / (Σ 2^(−reg) + zeros), with the standard
    linear-counting fallback for the small range (dead on the fixture —
    every register fills — but replayed in the oracle all the same).
    2^(−reg) is computed as 1/shiftleft(1,reg): exact powers of two,
    no transcendental calls on the hot path.
    """
    ev = load_table(spark, sf_dir, "events")
    hashed = _hll_hashed(ev)
    regs = hashed.groupBy("event_type", "bucket").agg(F.max("rho").alias("reg"))
    alpha = f"0.7213 / (1.0 + 1.079 / {HLL_M}.0)"  # α_m, same double fold both engines
    per_type = regs.groupBy("event_type").agg(
        F.count("*").alias("n_buckets"),
        # 2^(−reg) as 1/(1<<reg): exact dyadic doubles — reg ≤ 24
        # (HLL_REST_BITS + 1) so every term's lsb ≥ 2^−24, and the
        # ≤256-term sum needs ≤ 8+24 mantissa bits: exact in ANY order
        F.sum(F.expr("1.0 / shiftleft(CAST(1 AS BIGINT), CAST(reg AS INT))")).alias("s"),
    )
    # floor-scaling, not round(): floor on a double is EXACT in every
    # engine, while round(double, n) half-up semantics differ at
    # shortest-repr boundaries (observed: 4516.36625 → .3662 vs .3663)
    est = per_type.selectExpr(
        "event_type",
        f"CAST({HLL_M} - n_buckets AS INT) AS zeros",
        f"({alpha}) * {HLL_M} * {HLL_M} / (s + ({HLL_M} - n_buckets)) AS raw",
    ).selectExpr(
        "event_type",
        f"CASE WHEN raw <= 2.5 * {HLL_M} AND zeros > 0"
        f" THEN element_at(array({HLL_LC_VALUES_SPARK}), zeros)"
        " ELSE floor(raw * 10000) / 10000 END AS hll_est",
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        exact.join(est, "event_type")
        .selectExpr(
            "event_type",
            "n_exact",
            "hll_est",
            "floor(abs(hll_est - n_exact) / n_exact * 1000000) / 1000000 AS rel_err",
            f"abs(hll_est - n_exact) / n_exact <= {HLL_REL_ERR} AS hll_ok",
        )
        .orderBy("event_type")
    )


def _hll_estimate(regs: DataFrame, name: str) -> DataFrame:
    """One-row ``(name: double)`` estimate from a ``(bucket, reg)``
    register relation — the estimator stage of :func:`hll_distinct`
    factored out so merged and directly-built sketches share it
    verbatim. Same exactness argument: ``2^(−reg)`` terms are dyadic
    doubles with lsb ≥ 2⁻²⁴, so the ≤256-term sum is exact in ANY
    accumulation order."""
    alpha = f"0.7213 / (1.0 + 1.079 / {HLL_M}.0)"
    agg = regs.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.expr("1.0 / shiftleft(CAST(1 AS BIGINT), CAST(reg AS INT))")).alias("s"),
    )
    return agg.selectExpr(
        f"CAST({HLL_M} - n_buckets AS INT) AS zeros",
        f"({alpha}) * {HLL_M} * {HLL_M} / (s + ({HLL_M} - n_buckets)) AS raw",
    ).selectExpr(
        f"CASE WHEN raw <= 2.5 * {HLL_M} AND zeros > 0"
        f" THEN element_at(array({HLL_LC_VALUES_SPARK}), zeros)"
        f" ELSE floor(raw * 10000) / 10000 END AS {name}"
    )


def hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register-wise HLL merge — THE property that makes sketches the
    100 TB distinct-count path: per-slice sketches (here one per
    event_type) union into the global sketch by register-wise MAX
    without ever re-reading raw data, which is how a 1000-executor
    cluster folds per-partition partials into one answer (and how
    daily sketches roll up into monthly ones for free).

    Both routes are computed — merge(per-type registers) and the
    directly-built global sketch — and must agree EXACTLY:
    ``max_type(max_rows_in_type(rho)) = max_all_rows(rho)`` register by
    register, hence bit-identical estimates. ``merge_exact`` pins that
    algebra cross-engine; ``rel_err``/``hll_ok`` grade the estimate
    against the exact global distinct count (same 15% bound as
    :func:`hll_distinct`)."""
    ev = load_table(spark, sf_dir, "events")
    hashed = _hll_hashed(ev)
    per_type = hashed.groupBy("event_type", "bucket").agg(F.max("rho").alias("reg"))
    merged_regs = per_type.groupBy("bucket").agg(F.max("reg").alias("reg"))
    direct_regs = hashed.groupBy("bucket").agg(F.max("rho").alias("reg"))
    est_d = _hll_estimate(direct_regs, "est_direct")
    est_m = _hll_estimate(merged_regs, "est_merged")
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        exact.crossJoin(F.broadcast(est_d))
        .crossJoin(F.broadcast(est_m))
        .selectExpr(
            "n_exact",
            "est_direct",
            "est_merged",
            "est_merged = est_direct AS merge_exact",
            "floor(abs(est_direct - n_exact) / n_exact * 1000000) / 1000000 AS rel_err",
            f"abs(est_direct - n_exact) / n_exact <= {HLL_REL_ERR} AS hll_ok",
        )
    )


def cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-wise count-min-sketch merge — the sketch family's remaining
    mergeability contract (r4 verdict #7; the CMS analog of
    :func:`hll_merge`): per-slice sketches (one per event_type) folded
    by cell-wise SUM must equal the sketch built directly over all
    rows, cell for cell. Sum-mergeability is what lets a 1000-executor
    cluster build per-partition CMS partials map-side and fold them in
    one d·w-row shuffle — and lets daily sketches roll up into monthly
    ones without re-reading raw events.

    One output row: the direct sketch's cell count, total mass
    (= CMS_DEPTH · n_events) and position-weighted integer checksum
    (Σ (row·WIDTH + bucket + 1) · cnt — order-free exact BIGINT), the
    number of cells where merged ≠ direct (full-outer per-cell
    compare over the two ≤d·w-row sketches — tiny), and the
    ``merge_exact`` flag. Full value oracle: the hash family is the
    portable 2-universal construction, so DuckDB replays both routes.
    """
    ev = load_table(spark, sf_dir, "events")
    # Each sketch is MATERIALIZED (tiny: ≤ slices·d·w resp. d·w rows) so
    # the several downstream branches (merged, the aggregates, the
    # per-cell compare, n_slices) read the finished counter tables
    # instead of re-running the corpus-sized 4× explode per reference —
    # the per-slice route and the direct route each scan events exactly
    # ONCE, which is the point of the contract being cheap to verify.
    per_slice = (
        _cms_coords(ev, "event_type")
        .groupBy("event_type", "row", "bucket")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    merged = per_slice.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt_m"))
    direct = (
        _cms_coords(ev)
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt_d"))
        .localCheckpoint(eager=True)
    )
    n_slices = per_slice.select("event_type").distinct().agg(
        F.count("*").alias("n_slices")
    )
    return (
        n_slices.crossJoin(F.broadcast(cms_cell_summary(direct, "cnt_d")))
        .crossJoin(F.broadcast(cms_cell_mismatch(direct, "cnt_d", merged, "cnt_m")))
        .selectExpr(
            "n_slices",
            "n_cells",
            "total_count",
            "cell_checksum",
            "n_mismatch_cells",
            "n_mismatch_cells = 0 AS merge_exact",
        )
    )


def cms_cell_summary(sketch: DataFrame, cnt: str) -> DataFrame:
    """(n_cells, total_count, cell_checksum) over a (row, bucket, cnt)
    counter table — the position-weighted checksum is an order-free
    exact BIGINT (Σ (row·WIDTH + bucket + 1)·cnt). Shared by
    :func:`cms_merge` and the streaming twin so the fingerprint recipe
    exists once."""
    pos = (F.col("row") * F.lit(CMS_WIDTH) + F.col("bucket") + F.lit(1)).cast("bigint")
    return sketch.agg(
        F.count("*").alias("n_cells"),
        F.sum(cnt).alias("total_count"),
        F.sum(pos * F.col(cnt)).alias("cell_checksum"),
    )


def cms_cell_mismatch(a: DataFrame, ca: str, b: DataFrame, cb: str) -> DataFrame:
    """Per-cell full-outer compare of two counter tables → one row
    (n_mismatch_cells). Both sides are ≤ d·w rows — tiny."""
    return (
        a.join(b, ["row", "bucket"], "full_outer")
        .select(
            F.when(F.coalesce(ca, F.lit(-1)) != F.coalesce(cb, F.lit(-1)), 1)
            .otherwise(0)
            .alias("bad")
        )
        .agg(F.sum("bad").alias("n_mismatch_cells"))
    )


def quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable exact-quantile sketch — the third sketch-family merge
    contract (HLL: register MAX; CMS: cell SUM; here: value-histogram
    bin SUM): per-slice cents-histograms (one per event_type) folded by
    bin-wise SUM must equal the directly-built global histogram bin for
    bin, and the percentile_disc quantiles read off the merged
    histogram must equal the direct ones. This is how a 1000-executor
    cluster computes exact p50/p90/p99 over 100 TB — per-partition
    histograms merge in one bins-bounded shuffle; raw rows are never
    globally sorted (the ``quantiles_histogram`` recipe, made
    distributive explicitly).

    One output row: slice/bin/row counts, the merged-histogram
    quantiles, the per-bin mismatch count (full-outer compare of two
    bins-bounded relations) and the two equality flags. Full value
    oracle: integer cents, integer thresholds, both routes replayed.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    per_slice = (
        ev.groupBy("event_type", "v")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    merged = per_slice.groupBy("v").agg(F.sum("cnt").alias("cnt_m"))
    direct = (
        ev.groupBy("v").agg(F.count("*").alias("cnt_d")).localCheckpoint(eager=True)
    )
    mismatch = (
        direct.join(merged, ["v"], "full_outer")
        .select(
            F.when(
                F.coalesce("cnt_d", F.lit(-1)) != F.coalesce("cnt_m", F.lit(-1)), 1
            )
            .otherwise(0)
            .alias("bad")
        )
        .agg(F.sum("bad").alias("n_mismatch_bins"))
    )

    def quantiles(hist: DataFrame, cnt: str, tag: str) -> DataFrame:
        # global cumulative window over the BINS relation — bounded by
        # the distinct cents domain, never by row count
        from pyspark.sql import Window as W

        cum = hist.select(
            "v",
            F.sum(cnt).over(W.orderBy("v")).alias("cum"),
            F.sum(cnt).over(W.partitionBy()).alias("n"),
        )

        def disc(p: float) -> Column:
            return F.min(F.when(F.col("cum") >= F.ceil(F.lit(p) * F.col("n")), F.col("v")))

        return cum.agg(
            F.max("n").alias(f"n_rows_{tag}"),
            disc(0.5).alias(f"p50_{tag}"),
            disc(0.9).alias(f"p90_{tag}"),
            disc(0.99).alias(f"p99_{tag}"),
        )

    qm = quantiles(merged, "cnt_m", "m")
    qd = quantiles(direct, "cnt_d", "d")
    n_slices = per_slice.select("event_type").distinct().agg(
        F.count("*").alias("n_slices")
    )
    n_bins = direct.agg(F.count("*").alias("n_bins"))
    return (
        n_slices.crossJoin(F.broadcast(n_bins))
        .crossJoin(F.broadcast(qm))
        .crossJoin(F.broadcast(qd))
        .crossJoin(F.broadcast(mismatch))
        .selectExpr(
            "n_slices",
            "n_bins",
            "n_rows_m AS n_rows",
            # D-suffixed literals: bare 100.0 parses as DECIMAL in Spark
            # and the division would come out DECIMAL(…,6), not DOUBLE
            "p50_m / 100.0D AS p50",
            "p90_m / 100.0D AS p90",
            "p99_m / 100.0D AS p99",
            "n_mismatch_bins",
            "n_mismatch_bins = 0 AS merge_exact",
            "p50_m = p50_d AND p90_m = p90_d AND p99_m = p99_d AS quantiles_equal",
        )
    )


# --- weighted PPS sampling (exact integer inclusion test) ---------------------
PPS_TARGET = 400  # expected sample size


def sample_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson probability-proportional-to-size document sample:
    inclusion probability ∝ document length (the curation move that
    keeps long documents from being under-represented by uniform
    row sampling when the budget is measured in TOKENS, not rows).

    ``p_i = TARGET · w_i / W`` is tested as the cross-multiplied INTEGER
    inequality ``h_i · W < TARGET · w_i · M`` (h = portable modular
    hash, mod-reduced before the multiply so the hash itself never
    wraps int64 at any doc_id) — no floats anywhere, so the sampled
    id-set is bit-identical in any engine, under any partitioning. The
    cross-multiplication routes through DECIMAL(38,0): at 100 TB, W
    (total corpus chars) times a 7-digit hash overflows int64, exactly
    like the moment sums (relational.moment_sums) this recipe mirrors.

    Cap semantics (standard Poisson-PPS): the inclusion test silently
    caps ``p_i`` at 1 — any document with ``w_i > W/TARGET`` is ALWAYS
    sampled (its right-hand side exceeds every possible ``h·W``). On a
    length-skewed corpus the realized expected sample size therefore
    falls below ``PPS_TARGET`` by ``Σ_capped (TARGET·w_i/W − 1)``, and
    capped documents are deterministically included rather than
    included with the nominal ``p_i``. This is the textbook behavior of
    uncorrected Poisson PPS; pipelines that need the expected size to
    track TARGET exactly on skewed weights should iterate the Sampford
    cap-and-redistribute adjustment upstream (out of scope here). At
    the fixture (TARGET=400 of 500 docs) the cap genuinely binds —
    docs longer than 1.25× the mean are always included — and tests
    pin exactly that: every capped doc appears in the sample.
    """
    docs = load_table(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id", "lang", F.length("text").cast("bigint").alias("weight")
    )
    total = weighted.agg(F.sum("weight").alias("w_total"))
    h = ((F.col("doc_id").cast("bigint") % HASH_M) * HASH_A + HASH_B) % HASH_M
    return (
        weighted.join(F.broadcast(total))
        .filter(
            h.cast("decimal(38,0)") * F.col("w_total")
            < F.lit(PPS_TARGET).cast("decimal(38,0)") * F.col("weight") * F.lit(HASH_M)
        )
        .select("doc_id", "lang", "weight")
    )
