from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import assert_parity


def _names():
    from gpu_accelerated_vector_indexing_spark.queries import relational_q

    # oracle-backed names only: rows-only entries (copurchase_pagerank)
    # are invariant-tested separately
    return sorted(n for n in relational_q.QUERIES if n in relational_q.ORACLES)


@pytest.mark.parametrize("name", _names())
def test_relational_parity_smoke(spark, duck, name):
    assert_parity(spark, duck, name, SF_SMOKE)


@pytest.mark.parametrize("name", _names())
def test_relational_parity_sf001(spark, duck, name):
    assert_parity(spark, duck, name, SF_CORRECT)


def test_filtered_scan_pushdown(spark):
    """The filter + projection must reach the parquet scan."""
    from gpu_accelerated_vector_indexing_spark.operators.relational import filtered_scan

    plan = filtered_scan(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(o_orderstatus)" in plan
    # pruned read schema: only the referenced columns
    assert "o_comment" not in plan


def test_multiway_join_broadcasts_dims(spark):
    from gpu_accelerated_vector_indexing_spark.operators.relational import join_multiway

    plan = join_multiway(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_copurchase_pagerank_invariants(spark):
    """PageRank invariants: every rank >= the (1-d) floor, total mass
    ~= |V| (no dangling leakage in the bidirectional edge list), the
    head is deterministic across runs, and ranking is non-trivial."""
    from gpu_accelerated_vector_indexing_spark.operators.graph import (
        DAMPING,
        copurchase_edges,
        copurchase_pagerank,
    )

    n_nodes = copurchase_edges(spark, SF_CORRECT).select("src").distinct().count()
    rows = copurchase_pagerank(spark, SF_CORRECT, top_n=10_000_000).collect()
    assert len(rows) == n_nodes
    assert all(r.rank >= (1 - DAMPING) - 1e-6 for r in rows)
    total = sum(r.rank for r in rows)
    assert abs(total - n_nodes) / n_nodes < 1e-3
    head = [(r.part, r.rank) for r in rows[:10]]
    rerun = [
        (r.part, r.rank)
        for r in copurchase_pagerank(spark, SF_CORRECT, top_n=10).collect()
    ]
    assert head == rerun
    assert rows[0].rank > rows[-1].rank


def test_stats_exact_moments_partition_invariant(spark):
    """The order-independence claim: the statistics must be BIT-identical
    under different partitionings of the input (float moment aggregates
    are not — that is the point of the exact power-sum form)."""
    from gpu_accelerated_vector_indexing_spark.operators.relational import (
        moment_stats,
        moment_sums,
        stats_exact_moments,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    base = {r.l_returnflag: r for r in stats_exact_moments(spark, SF_CORRECT).collect()}
    # recompute through the same operator body on a hostile partitioning
    # (37 partitions keyed on an unrelated column) and push the
    # repartitioned sums through the same closed-form stage: every
    # statistic must be BIT-identical, not just the row counts
    li = load_table(spark, SF_CORRECT, "lineitem").repartition(37, "l_partkey")
    again = {r.l_returnflag: r for r in moment_stats(moment_sums(li)).collect()}
    assert base.keys() == again.keys()
    for flag, r in base.items():
        a = again[flag]
        assert a.n == r.n
        assert (r.mean_qty, r.stddev_qty, r.corr_qty_price, r.skew_qty) == (
            a.mean_qty, a.stddev_qty, a.corr_qty_price, a.skew_qty
        )


def test_bloom_probe_prunes_without_dropping_matches(spark):
    """The Bloom pre-filter must keep every true match (no false
    negatives), prune most non-matching fact rows, and stay a tiny
    broadcastable relation (≤ n_bits/64 words)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.relational import (
        BLOOM_BITS,
        bloom_build,
        bloom_probe,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    part = load_table(spark, SF_CORRECT, "part")
    li = load_table(spark, SF_CORRECT, "lineitem").select("l_partkey")
    dim = part.filter(F.col("p_size") >= 48).select("p_partkey")
    bloom = bloom_build(dim, "p_partkey")
    assert bloom.count() <= BLOOM_BITS // 64
    candidates = bloom_probe(li, "l_partkey", bloom)
    true_matches = li.join(dim, li.l_partkey == dim.p_partkey, "left_semi")
    n_cand, n_true, n_total = candidates.count(), true_matches.count(), li.count()
    assert n_true <= n_cand < n_total
    # no true match is dropped: the candidate set ⊇ the semi-join result
    assert true_matches.join(candidates, "l_partkey", "left_anti").count() == 0


def test_triangle_counts_match_bruteforce(spark):
    """Degree-oriented enumeration must agree with the naive a<b<c
    triple join — per node, not just in total."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.graph import (
        copurchase_edges,
        triangle_counts,
    )

    und = copurchase_edges(spark, SF_CORRECT).filter(F.col("src") < F.col("dst"))
    und.createOrReplaceTempView("tri_und")
    brute = spark.sql(
        """
        WITH t AS (
          SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
          FROM tri_und e1
          JOIN tri_und e2 ON e1.dst = e2.src
          JOIN tri_und e3 ON e3.src = e1.src AND e3.dst = e2.dst
        ),
        corners AS (
          SELECT a AS node FROM t
          UNION ALL SELECT b FROM t
          UNION ALL SELECT c FROM t
        )
        SELECT node, count(*) AS n_tri FROM corners GROUP BY node
        ORDER BY n_tri DESC, node ASC LIMIT 20
        """
    ).collect()
    fast = triangle_counts(spark, SF_CORRECT).collect()
    assert [(r.node, r.n_tri) for r in fast] == [(r.node, r.n_tri) for r in brute]


def test_triangle_counts_scale_path_no_closure_broadcast(spark):
    """Above the size gate the closure join must be a SHUFFLE hash join
    (Bloom-prefiltered), never a driver-side |E| broadcast — and the
    result must be identical to the broadcast path."""
    from gpu_accelerated_vector_indexing_spark.operators.graph import triangle_counts

    scale = triangle_counts(spark, SF_CORRECT, broadcast_edge_limit=0)
    plan = scale._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    default = triangle_counts(spark, SF_CORRECT)
    assert [(r.node, r.n_tri) for r in scale.collect()] == [
        (r.node, r.n_tri) for r in default.collect()
    ]


def test_kcore_trajectory_monotone(spark):
    """Peeling only removes nodes: n_alive non-increasing, iter 0 is
    the full node set, digests internally consistent (empty core sums
    to zero)."""
    from gpu_accelerated_vector_indexing_spark.operators.graph import (
        copurchase_edges,
        kcore_trajectory,
    )

    rows = kcore_trajectory(spark, SF_CORRECT).collect()
    n_nodes = copurchase_edges(spark, SF_CORRECT).select("src").distinct().count()
    assert rows[0].n_alive == n_nodes
    alive = [r.n_alive for r in rows]
    assert all(a >= b for a, b in zip(alive, alive[1:]))
    assert all(r.node_id_sum == 0 for r in rows if r.n_alive == 0)


def test_writer_starttime_identity():
    """(pid, starttime) writer identity: our own pid yields a stable
    int, a positively-dead pid yields None — the prune's recycled-pid
    disambiguator (r5 advisor)."""
    import os
    import subprocess

    from gpu_accelerated_vector_indexing_spark.operators.relational import (
        _proc_starttime,
    )

    own = _proc_starttime(os.getpid())
    assert isinstance(own, int) and own > 0
    assert _proc_starttime(os.getpid()) == own  # stable across reads
    # a child that has exited: its pid (after reaping) is inspectable
    # as None or, if recycled, yields a DIFFERENT starttime than ours
    p = subprocess.Popen(["true"])
    p.wait()
    got = _proc_starttime(p.pid)
    assert got is None or got != own


def test_deletion_variants_radius_one_complete(spark):
    """The max_del=1 rung of deletion_variants must be a COMPLETE
    candidate filter for levenshtein <= 1: over a small word set,
    pairs meeting on a shared <=1-deletion variant and verified at
    dist <= 1 equal the brute-force all-pairs answer (the same
    exactness contract the max_del=2 rung carries via the
    fuzzy/typo oracles)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.relational import (
        deletion_variants,
    )

    words = [
        "cat", "cart", "car", "care", "bare", "bore", "bone",
        "scan", "scans", "span", "plan", "clan", "claim",
    ]

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    truth = {
        (a, b)
        for i, a in enumerate(words)
        for b in words[i + 1 :]
        if lev(a, b) <= 1
    }
    truth = {tuple(sorted(p)) for p in truth}

    df = spark.createDataFrame([(w,) for w in words], "w string")
    v = df.select("w", F.explode(deletion_variants(F.col("w"), max_del=1)).alias("variant"))
    a = v.select("variant", F.col("w").alias("wa"))
    b = v.select("variant", F.col("w").alias("wb"))
    got = {
        (r.wa, r.wb)
        for r in a.join(b, "variant")
        .filter(F.col("wa") < F.col("wb"))
        .select("wa", "wb")
        .distinct()
        .withColumn("d", F.levenshtein("wa", "wb"))
        .filter(F.col("d") <= 1)
        .collect()
    }
    assert got == truth, f"missing={truth - got} extra={got - truth}"


def test_rfm_segments_partition_customers(spark):
    """Quartile cells partition the customer base exactly: counts and
    spend conserve, quartile sizes differ by ≤1 per metric (the ntile
    contract), codes are in 1..4."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.relational import rfm_segments
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    rows = rfm_segments(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    total_c = orders.agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
    ).collect()[0][0]
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["segment_spend_c"] for r in rows) == total_c
    for dim in ("r_q", "f_q", "m_q"):
        per_q = {}
        for r in rows:
            assert 1 <= r[dim] <= 4
            per_q[r[dim]] = per_q.get(r[dim], 0) + r["n_customers"]
        assert max(per_q.values()) - min(per_q.values()) <= 1


def test_supplier_concentration_invariants(spark):
    """HHI bounds: 1/n ≤ hhi ≤ 1 (equality at perfect spread /
    monopoly); top_share ≤ 1 and top_share² ≤ hhi (the max share's own
    square is part of the sum); one row per nation with suppliers."""
    from gpu_accelerated_vector_indexing_spark.operators.relational import (
        supplier_concentration,
    )
    from tests.conftest import SF_SMOKE

    rows = supplier_concentration(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        n = r["n_suppliers"]
        assert 0 < r["top_share"] <= 1.0
        assert (1.0 / n) - 1e-6 <= r["hhi"] <= 1.0
        assert r["top_share"] ** 2 <= r["hhi"] + 1e-6


def test_lineitem_profile_matches_direct_stats(spark):
    """lineitem_profile (r8): one row per profiled column; n_rows is
    the table count everywhere; spot-check n_nulls/n_distinct against
    direct recomputation for a low- and a high-cardinality column."""
    from gpu_accelerated_vector_indexing_spark.operators.relational import (
        PROFILE_COLS,
        table_profile,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    rows = {r["column_name"]: r for r in table_profile(spark, SF_SMOKE).collect()}
    assert set(rows) == set(PROFILE_COLS)
    from pyspark.sql import functions as F

    li = load_table(spark, SF_SMOKE, "lineitem")
    n = li.count()
    assert all(r["n_rows"] == n for r in rows.values())
    for c in ("l_returnflag", "l_orderkey"):
        direct_distinct = li.select(c).distinct().count()
        direct_nulls = li.filter(F.col(c).isNull()).count()
        assert rows[c]["n_distinct"] == direct_distinct, c
        assert rows[c]["n_nulls"] == direct_nulls, c
