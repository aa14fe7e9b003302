"""Modern-SQL surface (operators/modern_sql.py): LATERAL, VARIANT,
recursive CTE, Z-order — parity plus the plan/semantic properties the
family claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import assert_parity


def _names():
    from gpu_accelerated_vector_indexing_spark.queries import modern_q

    return sorted(modern_q.QUERIES)


@pytest.mark.parametrize("name", _names())
def test_modern_parity_smoke(spark, duck, name):
    assert_parity(spark, duck, name, SF_SMOKE)


@pytest.mark.parametrize("name", _names())
def test_modern_parity_sf001(spark, duck, name):
    assert_parity(spark, duck, name, SF_CORRECT)


def test_lateral_decorrelates_to_single_shuffle(spark):
    """Catalyst must decorrelate the LATERAL LIMIT subquery — the plan
    may shuffle the customer relation once (by nation key) but must not
    re-execute the subquery per outer row (no nested-loop of scans)."""
    from gpu_accelerated_vector_indexing_spark.operators.modern_sql import lateral_topk_customers

    plan = (
        lateral_topk_customers(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_variant_extraction_type(spark):
    """variant_get returns the requested primitive type (INT here), so
    downstream aggregation is integer-exact — no JSON-string drift."""
    from gpu_accelerated_vector_indexing_spark.operators.modern_sql import variant_props_stats

    schema = dict(variant_props_stats(spark, SF_SMOKE).dtypes)
    assert schema["sum_k"] == "bigint"
    assert schema["min_k"] == "int"


def test_gapfill_spine_is_contiguous(spark):
    """Every month between min and max appears exactly once; gap months
    carry explicit zeros."""
    from gpu_accelerated_vector_indexing_spark.operators.modern_sql import revenue_monthly_gapfill

    rows = revenue_monthly_gapfill(spark, SF_SMOKE).orderBy("month_start").collect()
    months = [r.month_start for r in rows]
    assert len(set(months)) == len(months)
    for prev, cur in zip(months, months[1:]):
        nxt = (prev.year, prev.month % 12 + 1) if prev.month < 12 else (prev.year + 1, 1)
        assert (cur.year, cur.month) == nxt, (prev, cur)
    assert all(r.n_orders >= 0 for r in rows)


def test_zorder_buckets_partition_the_table(spark):
    """Z-bucket populations must sum to the table row count (the key is
    total — every row lands in exactly one Z-range)."""
    from gpu_accelerated_vector_indexing_spark.operators.modern_sql import zorder_layout
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    total = load_table(spark, SF_SMOKE, "orders").count()
    agg = zorder_layout(spark, SF_SMOKE).agg(F.sum("n_rows").alias("s")).collect()[0]
    assert agg.s == total


def test_zorder_locality_beats_single_dim_sort(spark):
    """The point of Z-order: bucket envelopes are tight on BOTH
    dimensions. With a single-column sort, every bucket's second-dim
    envelope spans ~the full domain; Z-buckets must do strictly better
    on average for the interleaved pair."""
    from gpu_accelerated_vector_indexing_spark.operators.modern_sql import zorder_layout
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    buckets = zorder_layout(spark, SF_CORRECT).collect()
    orders = load_table(spark, SF_CORRECT, "orders")
    dom = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("cust_span"),
        (F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))).alias("day_span"),
    ).collect()[0]
    avg_cust_span = sum(b.custkey_max - b.custkey_min for b in buckets) / len(buckets)
    avg_day_span = sum(b.day_max - b.day_min for b in buckets) / len(buckets)
    # each dimension's average per-bucket envelope is narrower than the
    # full domain — both dimensions skip files, which a 1-D sort cannot do
    assert avg_cust_span < dom.cust_span, (avg_cust_span, dom.cust_span)
    assert avg_day_span < dom.day_span, (avg_day_span, dom.day_span)


def test_zorder_write_gives_two_dim_file_skipping(spark, tmp_path):
    """The written layout's parquet FOOTER stats must give usable min/max
    envelopes on BOTH dimensions: for each of o_custkey and o_orderdate,
    the average per-file span is well under the full domain, so a filter
    on either column skips files. A single-column sort cannot do this
    for the second column."""
    import glob

    import pyarrow.parquet as pq

    from gpu_accelerated_vector_indexing_spark.operators.modern_sql import write_zorder_layout
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    out = str(tmp_path / "orders_zorder")
    write_zorder_layout(spark, SF_CORRECT, out, n_files=8)
    files = sorted(glob.glob(out + "/zbucket=*/part-*.parquet"))
    assert len(files) == 8  # exact ntile buckets: one directory per bucket

    spans = {"o_custkey": [], "o_orderdate": []}
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for col in spans:
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                for ci in range(meta.num_columns):
                    c = meta.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        mins.append(c.statistics.min)
                        maxs.append(c.statistics.max)
            assert mins, f"no footer stats for {col} in {f}"
            spans[col].append((min(mins), max(maxs)))

    dom = load_table(spark, SF_CORRECT, "orders").agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_orderdate"), F.max("o_orderdate")
    ).collect()[0]
    cust_domain = dom[1] - dom[0]
    day_domain = (dom[3] - dom[2]).total_seconds()
    avg_cust = sum(hi - lo for lo, hi in spans["o_custkey"]) / len(files)
    avg_day = sum((hi - lo).total_seconds() for lo, hi in spans["o_orderdate"]) / len(files)
    # both dimensions' envelopes are materially narrower than the domain
    assert avg_cust < 0.8 * cust_domain, (avg_cust, cust_domain)
    assert avg_day < 0.8 * day_domain, (avg_day, day_domain)
