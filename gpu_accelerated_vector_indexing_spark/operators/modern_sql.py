"""Modern Spark SQL surface: LATERAL subqueries, the VARIANT
semi-structured type, recursive CTEs, and multi-dimensional (Z-order)
layout keys.

The reference has none of these (its whole query language is one KNN
shape, SURVEY.md §2.1) — this module is EXT surface in the same spirit
as §2.3: the operations a 100 TB lakehouse query layer is expected to
answer, expressed through the Spark-4-native features built for them
rather than through workarounds:

* ``LATERAL`` correlated subqueries (SQL-standard per-row subquery —
  the declarative form of "for each outer row, run this dependent
  query"); Catalyst decorrelates them into joins, so the physical plan
  is shuffle-equivalent to the window form while the intent stays
  readable.
* ``VARIANT`` (Spark 4): an open-schema binary-encoded semi-structured
  value. ``parse_json`` once at ingest, ``variant_get`` typed paths at
  query time — the lakehouse answer to schema-drifting event payloads
  (vs the STRING + repeated ``get_json_object`` re-parse, which decodes
  the JSON text per extraction).
* ``WITH RECURSIVE`` (Spark 4): iteration inside one SQL plan. Used
  here for time-spine densification (gap-filling a monthly revenue
  series) — the canonical BI shape Spark previously needed
  ``sequence()+explode`` driver tricks for.
* Z-order keys: bit-interleaving two join/filter dimensions into one
  clustering key so a single ``repartitionByRange + sortWithinPartitions``
  write gives min/max file skipping on BOTH dimensions at once — the
  data-layout technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``,
  computed with pure codegen'd bit arithmetic (no UDF).
* SQL scripting (ANSI SQL/PSM, Spark 4): BEGIN…END blocks with
  DECLAREd session variables bound from scalar subqueries — the
  parameterized-report pattern without driver-side glue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table


def lateral_topk_customers(spark: SparkSession, sf_dir: str, k: int = 2) -> DataFrame:
    """Per nation, its top-``k`` customers by account balance via a
    LATERAL correlated subquery — ``for each nation: SELECT ... ORDER BY
    ... LIMIT k`` stated directly.

    Catalyst decorrelates the LATERAL LIMIT into a partitioned window
    under the hood, so at 100 TB this costs exactly one shuffle of the
    customer relation keyed by nation — identical to the hand-written
    ``row_number() <= k`` plan, with the per-group intent in the query
    text instead of in window plumbing.
    """
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        f"""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n,
        LATERAL (
          SELECT c_name, c_acctbal
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey DESC
          LIMIT {int(k)}
        ) t
        """
    )


def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the ``events.props`` JSON payload through the
    VARIANT type: ``parse_json`` decodes each payload ONCE into the
    binary Variant encoding, then ``variant_get`` extracts typed paths
    without re-parsing text — the Spark-4 replacement for repeated
    ``get_json_object`` string scans.

    At 100 TB the decode-once property is the point: a payload read by
    ten extractions is parsed one time, and Variant's binary form
    pushes through shuffles/spills at a fraction of JSON-text width.
    Aggregates are integer-only, so the result is bit-exact against an
    oracle that extracts from the original JSON text.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k")
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


def revenue_monthly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled monthly revenue: a recursive-CTE month spine from the
    first to the last order month, left-joined to per-month revenue so
    months with no orders appear as explicit zero rows — the
    densification step every downstream time-series model needs.

    The spine is WITH RECURSIVE (Spark 4): anchor = min month, step =
    +1 month while ≤ max month — iteration bounded by the date range,
    inside one plan (no driver loop, no collect). The END bound rides
    along as a recursion column: computing it in the step's WHERE as a
    scalar subquery would rescan ``orders`` once per month (measured
    ~85 scans at bench scale); carried as a column, the bounds scan
    happens exactly once in the anchor. The spine relation is
    months-sized (corpus-independent) and broadcasts; revenue is one
    groupBy over orders. Money sums in DECIMAL(18,2).

    Recursion bound: Spark caps recursive-CTE depth at
    ``spark.sql.cteRecursionLevelLimit`` (default 100 — fine for the
    ~80-month fixtures but fatal for a longer order history), so the
    limit is raised here to cover any plausible date range (10 000
    months ≈ 833 years; the spine stays a tiny relation either way).
    DELIBERATE session-level side effect: the conf must hold at
    EXECUTION time of the returned lazy DataFrame, so it cannot be
    set/restored around this builder — callers sharing the session
    inherit the raised ceiling for their own recursive CTEs.
    """
    if int(spark.conf.get("spark.sql.cteRecursionLevelLimit", "100")) < 10_000:
        spark.conf.set("spark.sql.cteRecursionLevelLimit", "10000")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE spine(month_start, hi) AS (
          SELECT date_trunc('MONTH', min(o_orderdate)),
                 date_trunc('MONTH', max(o_orderdate)) FROM orders
          UNION ALL
          SELECT month_start + INTERVAL 1 MONTH, hi FROM spine
          WHERE month_start < hi
        ),
        monthly AS (
          SELECT date_trunc('MONTH', o_orderdate) AS month_start,
                 count(*) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1
        )
        SELECT CAST(s.month_start AS TIMESTAMP) AS month_start,
               coalesce(m.n_orders, 0) AS n_orders,
               coalesce(m.revenue, 0.0) AS revenue
        FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
        """
    )


# Z-order bit budget: 12 bits per dimension → 24-bit interleaved key.
# Sized to the fixture domains (≤4096 custkeys / days at bench SFs) so
# the bucket prefix actually splits on populated high bits; a production
# layout sizes this to the real dimension cardinalities the same way.
ZORDER_BITS = 12


def _zvalue(x: F.Column, y: F.Column) -> F.Column:
    """Interleave the low ``ZORDER_BITS`` bits of two non-negative
    integer columns (x → even bit positions, y → odd) — one codegen'd
    higher-order fold, no UDF.

    Built from the passed Column objects (``getbit`` with a lambda-bound
    position, weighted by a literal power-of-two array), so callers are
    free to pass any expression — nothing binds to literal column
    names, and the per-bit work is an integer shift + multiply (a
    ``pow``-per-bit variant measured ~1.8× slower end-to-end).
    """
    bits = F.sequence(F.lit(0), F.lit(ZORDER_BITS - 1))

    def interleave(col: F.Column, offset: int) -> F.Column:
        weights = F.array(
            *[F.lit(1 << (2 * i + offset)).cast("long") for i in range(ZORDER_BITS)]
        )
        return F.aggregate(
            F.zip_with(
                F.transform(bits, lambda i: F.getbit(col, i).cast("long")),
                weights,
                lambda b, w: b * w,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    return interleave(x, 0) + interleave(y, 1)


def zorder_layout(spark: SparkSession, sf_dir: str, n_buckets: int = 16) -> DataFrame:
    """Z-order clustering audit over orders: interleave customer key and
    order day into one Z-value, then summarize each of ``n_buckets``
    equal Z-ranges (row count + min/max of both source dimensions).

    Why this exists at 100 TB: a table range-partitioned and sorted by
    ``zval`` gives every file a tight min/max envelope on BOTH
    ``o_custkey`` AND ``o_orderdate`` simultaneously, so either
    predicate prunes files (the curse of single-column sort layouts is
    that the second dimension's min/max spans everything). The write
    path is ``repartitionByRange(zval).sortWithinPartitions(zval)`` —
    this query is the audit relation: per Z-range, the dimension
    envelopes that would become Parquet footer stats. Bucketing by
    ``zval >> (2·BITS − log2(n_buckets))`` keeps the output
    bucket-sized, corpus-independent.
    """
    shift = 2 * ZORDER_BITS - (n_buckets - 1).bit_length()
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        (F.col("o_custkey") % (1 << ZORDER_BITS)).alias("x"),
        (F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("long")
         % (1 << ZORDER_BITS)).alias("y"),
    ).select("x", "y", _zvalue(F.col("x"), F.col("y")).alias("zval"))
    return (
        keyed.groupBy(F.shiftright(F.col("zval"), shift).alias("zbucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
            F.min("x").alias("custkey_min"),
            F.max("x").alias("custkey_max"),
            F.min("y").alias("day_min"),
            F.max("y").alias("day_max"),
        )
    )


def scripted_threshold_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4, ANSI SQL/PSM): a BEGIN…END procedural
    block that DECLAREs session variables, binds them from scalar
    subqueries, and returns the final statement's relation — the
    parameterized-report shape that previously needed driver-side glue
    (collect the threshold, format it into the next query).

    Inside one script the variable binding happens plan-side, so the
    whole report stays in Spark: recent high-value orders per priority,
    where "high-value" = above the corpus mean (decimal-exact) and
    "recent" = the last 90 days of order dates. At scale the two SET
    statements are tiny aggregate jobs whose scalar results feed the
    main scan as literals — exactly what the hand-rolled
    collect-then-inline pattern does, minus the driver round-trips in
    user code.
    """
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        BEGIN
          DECLARE avg_price DOUBLE;
          DECLARE cutoff TIMESTAMP;
          SET avg_price = (
            SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
            FROM orders
          );
          SET cutoff = (SELECT max(o_orderdate) - INTERVAL 90 DAYS FROM orders);
          SELECT o_orderpriority,
                 count(*) AS n_recent_above,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM orders
          WHERE o_totalprice > avg_price AND o_orderdate >= cutoff
          GROUP BY o_orderpriority;
        END
        """
    )


def write_zorder_layout(
    spark: SparkSession, sf_dir: str, out_path: str, n_files: int = 8
) -> str:
    """Materialize the Z-ordered layout ``zorder_layout`` audits:
    orders written as ``n_files`` range-partitioned, internally-sorted
    parquet files keyed by the interleaved Z-value.

    Every output file then carries a tight footer min/max envelope on
    BOTH ``o_custkey`` and ``o_orderdate`` — a reader filtering on
    either column skips most files (verified from real parquet footer
    statistics in tests). This is the write half of the
    OPTIMIZE-ZORDER-BY story: one extra range shuffle at write time
    buys two-dimensional data skipping for every read after.

    Buckets are EXACT ntile ranks over a total (zval, o_orderkey)
    order, not ``repartitionByRange`` samples: the sampled range
    partitioner draws a fresh seed per run, so its file boundaries —
    and therefore the footer envelopes — drift run to run and can
    land a marginal file across a bucket edge. Exact ranks make the
    layout a pure function of the data. (The global ntile window is a
    one-task sort — fine for a fixture-scale write utility; at corpus
    scale the exact rank comes from the distributed prefix-sum kernel
    the sequence packers already use, `text_analysis.range_prefix_sum`.)
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    keyed = (
        orders.withColumn("x", F.col("o_custkey") % (1 << ZORDER_BITS))
        .withColumn(
            "y",
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("long")
            % (1 << ZORDER_BITS),
        )
        .withColumn("zval", _zvalue(F.col("x"), F.col("y")))
        .withColumn(
            "zbucket", F.ntile(n_files).over(W.orderBy("zval", "o_orderkey"))
        )
    )
    (
        keyed.repartition("zbucket")
        .sortWithinPartitions("zval")
        .drop("x", "y", "zval")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(out_path)
    )
    return out_path
