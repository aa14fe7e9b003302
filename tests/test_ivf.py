from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import assert_parity

IVF_NAMES = [
    "ann_compression_error",
    "filtered_method_recall",
    "ivf_centroids",
    "knn_ivf_combined",
    "knn_ivf_sequential",
    "ivf_recall",
    "multi_query_knn_ivf",
    "engine_full_probe",
    "knn_ivf_np1",
    "knn_ivf_np5",
    "knn_ivf_np10",
    "ivf_recall_sweep",
    "ivf_rebalance_plan",
    "ivf_delete_compact",
    "knn_with_deletes",
    "knn_ivf_pq_residual",
    "contrastive_triplets",
    "embedding_drift",
    "ivf_centroid_refresh",
    "retrieval_ndcg",
    "knn_ivf_shard_merge",
    "ivf_shard_state_roundtrip",
    "embedding_outliers",
    "knn_ivf_adaptive",
    "ivf_adaptive_sweep",
]


def test_knn_with_deletes_excludes_tombstones(spark):
    """No tombstoned vec_id in the result; the result differs from the
    undeleted top-k exactly when a tombstoned vector was in it."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import DELETE_MOD, knn_with_deletes
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce

    kept = [r["vec_id"] for r in knn_with_deletes(spark, SF_CORRECT, query_id=1).collect()]
    assert kept and all(v % DELETE_MOD != 0 for v in kept)
    full = [r["vec_id"] for r in knn_bruteforce(spark, SF_CORRECT, query_id=1, k=5).collect()]
    survivors = [v for v in full if v % DELETE_MOD != 0]
    assert kept[: len(survivors)] == survivors


def test_delete_compact_plan_accounts_every_vector(spark):
    from gpu_accelerated_vector_indexing_spark.operators.ivf import delete_compact_plan
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    rows = delete_compact_plan(spark, SF_CORRECT).collect()
    total = load_table(spark, SF_CORRECT, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == total
    for r in rows:
        assert r["n_live"] + r["n_deleted"] == r["n_vectors"]
        assert r["compact"] == (r["tombstone_frac"] >= 0.15)


def test_rebalance_plan_consistent(spark):
    """Verdicts follow the thresholds; merge targets are real other clusters."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        REBALANCE_MERGE_RATIO,
        REBALANCE_SPLIT_RATIO,
        rebalance_plan,
    )

    rows = rebalance_plan(spark, SF_CORRECT).collect()
    labels = {r["label"] for r in rows}
    assert {r["action"] for r in rows} == {"split", "merge", "keep"}
    for r in rows:
        if r["action"] == "split":
            assert r["ratio"] > REBALANCE_SPLIT_RATIO and r["n_splits"] >= 2
            assert r["merge_into"] is None
        elif r["action"] == "merge":
            assert r["ratio"] < REBALANCE_MERGE_RATIO
            assert r["merge_into"] in labels and r["merge_into"] != r["label"]
            assert r["n_splits"] is None
        else:
            assert r["merge_into"] is None and r["n_splits"] is None


@pytest.mark.parametrize("name", IVF_NAMES)
def test_ivf_oracle_parity_smoke(spark, duck, name):
    assert_parity(spark, duck, name, SF_SMOKE)


@pytest.mark.parametrize("name", IVF_NAMES)
def test_ivf_oracle_parity_sf001(spark, duck, name):
    assert_parity(spark, duck, name, SF_CORRECT)


def test_ivf_full_probe_equals_bruteforce(spark):
    """n_probe = n_clusters ⇒ IVF ≡ exact search (SURVEY.md §5.2)."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import knn_ivf
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce

    ivf_ids = [r.vec_id for r in knn_ivf(spark, SF_SMOKE, query_id=3, k=5, n_probe=10).collect()]
    exact_ids = [r.vec_id for r in knn_bruteforce(spark, SF_SMOKE, query_id=3, k=5).collect()]
    assert ivf_ids == exact_ids


def test_sequential_equals_combined(spark):
    """Two physical strategies, one logical query (O16 ≡ O17)."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import knn_ivf

    seq = knn_ivf(spark, SF_SMOKE, query_id=2, k=5, n_probe=4, sequential=True).collect()
    com = knn_ivf(spark, SF_SMOKE, query_id=2, k=5, n_probe=4, sequential=False).collect()
    assert [(r.vec_id, r.score) for r in seq] == [(r.vec_id, r.score) for r in com]


def test_kmeans_invariants(spark):
    from gpu_accelerated_vector_indexing_spark.operators.index_build import cluster_invariants

    row = cluster_invariants(spark, SF_SMOKE, k=10, seed=42).collect()[0]
    assert row.n_clusters == 10
    assert row.n_rows == 500
    assert row.n_nearest_ok == row.n_rows


def test_assignment_invariants_exact_on_equidistant_rows(spark):
    """The hybrid matmul-with-exact-recheck audit must not mis-flag
    EXACTLY equidistant rows (where the expanded matmul's cancellation
    error could pick either side): a point midway between two centroids
    must resolve to the LOWEST cluster id — the row_number tie-break
    contract — and a correct assignment to it must audit clean."""
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        assignment_invariants,
    )

    # centroids at ±1 on axis 0; rows exactly midway (all-zero), plus
    # unambiguous rows near each centroid, assigned correctly with the
    # midway rows on the LOWEST id (cluster 0)
    centroids = spark.createDataFrame(
        [(0, [-1.0, 0.0]), (1, [1.0, 0.0])], "cluster int, centroid array<double>"
    )
    assigned = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),  # exact tie -> lowest id wins
            (0, [0.0, 7.5]),  # exact tie farther out
            (0, [-0.9, 0.1]),
            (1, [1.1, -0.2]),
        ],
        "cluster int, embedding array<double>",
    )
    row = assignment_invariants(assigned, centroids).collect()[0]
    assert row.n_rows == 4
    assert row.n_nearest_ok == 4, row  # ties resolved to cluster 0, not 1


def test_partitioned_index_prunes(spark, tmp_path_factory):
    """The partitioned layout + IN-filter must read only probed partitions."""
    import os

    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.index_build import build_partitioned_index

    out = "/root/repo/.tmp/index_sf0001"
    emb_path, cent_path = build_partitioned_index(spark, SF_SMOKE, out, k=10, seed=42)
    assert len([d for d in os.listdir(emb_path) if d.startswith("cluster=")]) == 10
    pruned = spark.read.parquet(emb_path).filter(F.col("cluster").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    n_full = spark.read.parquet(emb_path).count()
    assert 0 < pruned.count() < n_full


def test_ivf_pq_recall_floor_and_full_margin(spark):
    """IVF×PQ at the default candidate margin: recall@5 ≥ 3/5 vs the
    exact IVF fine search on every probe query; at full margin (the
    candidate stage passes the whole probed set) the exact rescore must
    reproduce the exact fine search bit-for-bit."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import knn_ivf
    from gpu_accelerated_vector_indexing_spark.operators.quantize import knn_ivf_pq

    for qid in (0, 3):
        exact = {
            (r.vec_id, r.score)
            for r in knn_ivf(spark, SF_CORRECT, query_id=qid, k=5, n_probe=3).collect()
        }
        got = [
            (r.vec_id, r.score)
            for r in knn_ivf_pq(spark, SF_CORRECT, query_id=qid, k=5, n_probe=3).collect()
        ]
        assert len(got) == 5
        hits = sum(1 for g in got if g in exact)
        assert hits >= 3, f"q{qid}: recall {hits}/5, got={got}"

    exact_full = [
        (r.vec_id, r.score)
        for r in knn_ivf(spark, SF_CORRECT, query_id=7, k=5, n_probe=3).collect()
    ]
    pq_full = [
        (r.vec_id, r.score)
        for r in knn_ivf_pq(
            spark, SF_CORRECT, query_id=7, k=5, n_probe=3, n_candidates=10_000
        ).collect()
    ]
    assert pq_full == exact_full


def test_contrastive_triplets_contract(spark):
    """Per anchor: exactly one positive with the ANCHOR's label, n_neg
    negatives with OTHER labels, self never present, and the positive's
    score ≥ is not required (a hard negative may outrank it — that is
    the point) but negatives are rank-ordered by score."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.mining import (
        ANCHOR_IDS,
        N_NEG,
        contrastive_triplets,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, SF_CORRECT, "embeddings")
        .select("vec_id", "label")
        .filter(F.col("vec_id").isin(list(ANCHOR_IDS)))
        .collect()
    }
    rows = contrastive_triplets(spark, SF_CORRECT).collect()
    by_anchor: dict[int, list] = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, []).append(r)
        assert r.vec_id != r.anchor_id
    assert set(by_anchor) == set(ANCHOR_IDS)
    for aid, group in by_anchor.items():
        pos = [r for r in group if r.role == "pos"]
        neg = sorted((r for r in group if r.role == "neg"), key=lambda r: r.rank)
        assert len(pos) == 1 and pos[0].label == labels[aid]
        assert len(neg) == N_NEG
        assert all(r.label != labels[aid] for r in neg)
        scores = [r.score for r in neg]
        assert scores == sorted(scores, reverse=True)


def test_embedding_drift_contract(spark):
    """Every label present; counts partition the corpus; cos_dist in
    [0, 2]; l2_shift ≥ 0; growth = n_t1/n_t0."""
    from gpu_accelerated_vector_indexing_spark.operators.mining import embedding_drift
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    rows = embedding_drift(spark, SF_CORRECT).collect()
    n_total = load_table(spark, SF_CORRECT, "embeddings").count()
    assert len(rows) == 10
    assert sum(r.n_t0 + r.n_t1 for r in rows) == n_total
    for r in rows:
        assert 0.0 <= r.cos_dist <= 2.0
        assert r.l2_shift >= 0.0
        assert abs(r.growth - r.n_t1 / r.n_t0) < 1e-6


def test_ivf_pq_residual_recall_floor_and_full_margin(spark):
    """IVFADC (residual encoding): same contract as the raw-code PQ path
    — recall@5 ≥ 3/5 vs the exact IVF fine search at the default
    candidate margin; bit-equal to the exact fine search at full margin
    (every probed vector survives to the exact rescore)."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import knn_ivf
    from gpu_accelerated_vector_indexing_spark.operators.quantize import (
        knn_ivf_pq_residual,
    )

    for qid in (0, 3):
        exact = {
            (r.vec_id, r.score)
            for r in knn_ivf(spark, SF_CORRECT, query_id=qid, k=5, n_probe=3).collect()
        }
        got = [
            (r.vec_id, r.score)
            for r in knn_ivf_pq_residual(
                spark, SF_CORRECT, query_id=qid, k=5, n_probe=3
            ).collect()
        ]
        assert len(got) == 5
        hits = sum(1 for g in got if g in exact)
        assert hits >= 3, f"q{qid}: recall {hits}/5, got={got}"

    exact_full = [
        (r.vec_id, r.score)
        for r in knn_ivf(spark, SF_CORRECT, query_id=7, k=5, n_probe=3).collect()
    ]
    pqr_full = [
        (r.vec_id, r.score)
        for r in knn_ivf_pq_residual(
            spark, SF_CORRECT, query_id=7, k=5, n_probe=3, n_candidates=10_000
        ).collect()
    ]
    assert pqr_full == exact_full


def test_ivf_pq_residual_candidate_boundary_margin(spark):
    """The cross-engine soundness argument for the registered residual
    query, MEASURED (ADVICE r3): every final top-k vector must rank
    well inside the candidate cut, with an approx-score gap to the
    rank-n_candidates boundary far above the 1e-6 rounding quantum —
    so a ULP-level float-association difference between the Spark LUT
    decomposition and the oracle's reconstructed-vector fold cannot
    move a top-k vector across the cut on either engine."""
    from gpu_accelerated_vector_indexing_spark.operators.quantize import (
        knn_ivf_pq_residual,
        residual_approx_scores,
    )

    k, n_probe, qid = 5, 3, 0  # the registered config
    # client-side sort with the SAME tie-break as the candidate cut
    # (approx_score DESC, vec_id DESC) so ranks are order-stable even
    # among 6-d.p.-tied scores
    ranked = sorted(
        residual_approx_scores(spark, SF_CORRECT, query_id=qid, n_probe=n_probe).collect(),
        key=lambda r: (-r.approx_score, -r.vec_id),
    )
    # At the gate corpus the registered n_candidates=150 exceeds the
    # probed pool, so the cut admits EVERY probed vector — both engines
    # trivially share the candidate set and the boundary concern is
    # vacuous at gate scale. Pin that fact…
    assert len(ranked) <= 150
    # …then measure the margin where a cut genuinely binds (the shape
    # a larger corpus would face), at a harsher n_candidates:
    n_candidates = 50
    assert len(ranked) > n_candidates  # the harsher cut must bind
    rank_of = {r.vec_id: i for i, r in enumerate(ranked)}
    boundary_score = ranked[n_candidates - 1].approx_score
    topk = knn_ivf_pq_residual(
        spark, SF_CORRECT, query_id=qid, k=k, n_probe=n_probe, n_candidates=n_candidates
    ).collect()
    assert len(topk) == k
    for r in topk:
        # inside the cut with ≥20% rank slack…
        assert rank_of[r.vec_id] <= n_candidates * 0.8, (r.vec_id, rank_of[r.vec_id])
        # …and separated from the boundary by ≫ the rounding quantum
        gap = ranked[rank_of[r.vec_id]].approx_score - boundary_score
        assert gap >= 1e-4, (r.vec_id, gap)


def test_ann_method_comparison_bounds(spark):
    """The cross-method recall harness: exact-contract methods (sq8, bq)
    must hit recall 1.0; every method stays within [0,1] with every
    registered method present."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import ann_method_comparison

    rows = {r.method: r.recall for r in ann_method_comparison(spark, SF_CORRECT).collect()}
    assert set(rows) == {
        "ivf_np3", "lsh", "sq8", "sq4", "ivf_sq8", "ivf_sq4", "pq",
        "ivf_pq", "bq", "ivf_bq", "mrl", "ivf_mrl", "graph_beam",
        "graph_beam_bq",
    }
    assert rows["sq8"] == 1.0  # exact-equality contract
    assert rows["sq4"] == 1.0  # exact-equality contract (wider margin)
    assert rows["bq"] == 1.0  # exact-equality contract (margin-backed)
    assert all(0.0 <= v <= 1.0 for v in rows.values())


def test_ivf_bq_equals_exact_fine_search(spark):
    """IVF×BQ at the default margin must reproduce the exact IVF fine
    search bit-for-bit on several probe queries (the shared-oracle
    contract), and stay equal when the margin shrinks to 3·k."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import knn_ivf
    from gpu_accelerated_vector_indexing_spark.operators.quantize import knn_ivf_bq

    for qid in (0, 3, 7):
        exact = [
            (r.vec_id, r.score)
            for r in knn_ivf(spark, SF_CORRECT, query_id=qid, k=5, n_probe=3).collect()
        ]
        got = [
            (r.vec_id, r.score)
            for r in knn_ivf_bq(spark, SF_CORRECT, query_id=qid, k=5, n_probe=3).collect()
        ]
        assert got == exact, f"q{qid}: {got} != {exact}"
    tight = [
        (r.vec_id, r.score)
        for r in knn_ivf_bq(
            spark, SF_CORRECT, query_id=0, k=5, n_probe=3, n_candidates=15
        ).collect()
    ]
    assert len(tight) == 5  # tighter margin still returns a full k set


def test_driver_coarse_probes_match_dataframe_coarse(spark):
    """The fixture path's driver-side coarse search (probe_labels over
    memoized centroid rows) must select the SAME probe set as the
    DataFrame coarse_search for every (query, n_probe) config — same
    folds, same rounding, same tie-break, two implementations."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        coarse_probes,
        coarse_search,
        fixture_centroids,
    )
    from gpu_accelerated_vector_indexing_spark.operators.knn import query_vectors

    cents = fixture_centroids(spark, SF_CORRECT)
    for qid in (0, 3, 17):
        q = query_vectors(spark, SF_CORRECT, [qid])
        for n_probe in (1, 3, 10):
            df_probes = sorted(
                r.label
                for r in coarse_search(cents, q, n_probe).select("label").collect()
            )
            assert df_probes == sorted(coarse_probes(spark, SF_CORRECT, qid, n_probe))


def test_append_to_index_searchable_without_rebuild(spark, tmp_path):
    """Continuous-ingest contract: vectors appended to an existing
    index (nearest-centroid assignment, partition-directory append)
    must be found by the engine immediately, existing results must be
    unchanged for untouched clusters, and the appended rows land in
    exactly one cluster directory each."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.engine import IVFEngine
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        append_to_index,
        build_partitioned_index,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    idx = str(tmp_path / "index")
    build_partitioned_index(spark, SF_SMOKE, idx, k=4, seed=42)

    # a new vector = an existing corpus vector, re-idd: its nearest
    # centroid is that vector's own cluster, and a full-probe search for
    # it must now return BOTH copies at score 1.0
    probe = load_table(spark, SF_SMOKE, "embeddings").filter(F.col("vec_id") == 7).first()
    new_id = 1_000_000
    new_emb = spark.createDataFrame(
        [(new_id, probe.embedding, probe.label)],
        "vec_id long, embedding array<float>, label int",
    )
    before = spark.read.parquet(f"{idx}/embeddings_indexed").count()
    assert append_to_index(spark, idx, new_emb) == 1
    after_df = spark.read.parquet(f"{idx}/embeddings_indexed")
    assert after_df.count() == before + 1
    assert after_df.filter(F.col("vec_id") == new_id).count() == 1

    eng = IVFEngine.from_pretrained(spark, idx, n_probe=4)
    top = eng.search([float(x) for x in probe.embedding], k=2).collect()
    assert sorted(r.vec_id for r in top) == sorted([7, new_id])
    assert all(abs(r.score - 1.0) < 1e-6 for r in top)


def test_centroid_refresh_lloyd_monotone(spark):
    """One Lloyd step must not increase total within-cluster SSE
    (k-means' defining monotonicity), populations must partition the
    corpus, and shifts are finite non-negative."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.functions.vector import as_double_array
    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        centroid_refresh,
        fixture_centroid_rows,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    rows = centroid_refresh(spark, SF_CORRECT).collect()
    emb = load_table(spark, SF_CORRECT, "embeddings")
    assert sum(r.n_assigned for r in rows) == emb.count()
    assert all(r.l2_shift is None or r.l2_shift >= 0.0 for r in rows)

    # SSE before (fixture labels vs their centroids) ≥ SSE after one step
    cents = {label: c for label, c in fixture_centroid_rows(spark, SF_CORRECT)}
    import numpy as np

    data = emb.select("vec_id", "label", as_double_array("embedding").alias("v")).collect()
    V = np.asarray([r.v for r in data])
    C = np.asarray([cents[r.label] for r in data])
    sse_before = float(((V - C) ** 2).sum())
    # after: nearest-centroid assignment, then per-cluster means
    allc = np.asarray([cents[i] for i in sorted(cents)])
    d2 = ((V[:, None, :] - allc[None, :, :]) ** 2).sum(axis=2)
    assign = np.round(d2, 6).argmin(axis=1)
    sse_after = 0.0
    for j in sorted(cents):
        members = V[assign == j]
        if len(members):
            mu = np.round(members.mean(axis=0), 8)
            sse_after += float(((members - mu) ** 2).sum())
    assert sse_after <= sse_before + 1e-6


def test_pq_state_roundtrip_search_parity(spark):
    """Searching straight off the PERSISTED PQ state must reproduce the
    memoized-path ADC ranking: reload the parquet codes, rebuild the
    ADC score from the persisted codebooks, and the resulting top
    candidates must equal knn_pq's own candidate stage."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.quantize import (
        _PQ_STATE_DIR,
        knn_pq,
        pq_state_roundtrip,
    )

    # materialize the state (memoized dir)
    row = pq_state_roundtrip(spark, SF_CORRECT).collect()[0]
    assert row.n_codewords == 128 and row.n_code_rows == 500
    out = _PQ_STATE_DIR[(spark, SF_CORRECT)]
    codes = spark.read.parquet(f"{out}/codes")
    # the persisted codes must cover the corpus 1:1 with 8 subspace ids
    assert codes.count() == 500
    assert codes.select(F.size("codes")).distinct().collect()[0][0] == 8
    # and the normal query path still works alongside the persisted state
    assert len(knn_pq(spark, SF_CORRECT).collect()) == 5


# --- r7: ranking-aware eval + shard-merged build ---------------------------


def test_retrieval_ndcg_full_probe_is_perfect(spark):
    """n_probe = n_clusters prunes nothing, so the IVF ranking IS the
    exact ranking: recall = mrr = ndcg = 1.0 — the rank-quality twin of
    ivf_recall's full-probe invariant (reference check_cos_sim.cpp:72)."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import retrieval_ndcg

    rows = retrieval_ndcg(spark, SF_SMOKE, n_probes=(10,)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["recall"], r["mrr"], r["ndcg"]) == (1.0, 1.0, 1.0)


def test_retrieval_ndcg_bounds_and_recall_consistency(spark):
    """Metrics land in [0, 1]; ndcg ≤ recall-implied ceiling (ndcg = 1
    only at full recall); the recall column ties out with ivf_recall
    at the same knob value."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import ivf_recall, retrieval_ndcg

    rows = {r["n_probe"]: r for r in retrieval_ndcg(spark, SF_CORRECT).collect()}
    assert set(rows) == {1, 3, 5}
    for r in rows.values():
        for m in ("recall", "mrr", "ndcg"):
            assert 0.0 <= r[m] <= 1.0
        if r["recall"] < 1.0:
            assert r["ndcg"] < 1.0
    recall3 = ivf_recall(spark, SF_CORRECT, n_probe=3).collect()[0]["recall"]
    assert rows[3]["recall"] == recall3


def test_dcg_term_rounding_parity_with_duckdb():
    """The only float arithmetic the NDCG oracle and the Spark side
    compute INDEPENDENTLY is round(1/log2(rank+1), 12). Pin all ranks
    the fixture can produce (1..10) to the same 12-d.p. decimal in
    Python (= the IDCG constant) and DuckDB (= the oracle terms); the
    JVM side is pinned transitively by the gate's value hash."""
    import duckdb

    from gpu_accelerated_vector_indexing_spark.operators.ivf import _dcg_contribution

    got = duckdb.sql(
        "SELECT i, round(1.0 / log2(i + 1), 12) AS c FROM range(1, 11) t(i) ORDER BY i"
    ).fetchall()
    for rank, c in got:
        assert float(_dcg_contribution(int(rank))) == c, rank


def test_shard_merged_centroids_match_single_build(spark):
    """Merged (sum, count) sufficient statistics reproduce the one-pass
    per-label means at the shared 8-d.p. rounding — for any shard
    count, so the merge is associativity-safe."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        fixture_centroid_rows,
        merged_centroid_rows,
    )

    single = dict(fixture_centroid_rows(spark, SF_SMOKE))
    for n_shards in (2, 3):
        merged = dict(merged_centroid_rows(spark, SF_SMOKE, n_shards=n_shards))
        assert merged.keys() == single.keys()
        for lab, cent in merged.items():
            assert cent == pytest.approx(single[lab], abs=2e-8), (n_shards, lab)


def test_shard_merge_invariant_to_shard_count(spark):
    """The merged centroid state is EXACTLY identical for any shard
    count — not approximately: the component sums are DECIMAL(38,20)
    folds (ADVICE r7), and decimal addition is associative, so
    regrouping the same addends cannot move any component."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import merged_centroid_rows

    base = dict(merged_centroid_rows(spark, SF_SMOKE, n_shards=1))
    for n_shards in (2, 3, 5):
        assert dict(merged_centroid_rows(spark, SF_SMOKE, n_shards=n_shards)) == base


def test_shard_state_dir_memoizes_per_shard_count(spark):
    """Different n_shards must get different persisted partials
    (ADVICE r7: the memo used to ignore n_shards and silently reuse
    the first count's state)."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import shard_state_dir

    d2 = shard_state_dir(spark, SF_SMOKE, n_shards=2)
    d3 = shard_state_dir(spark, SF_SMOKE, n_shards=3)
    assert d2 != d3
    assert d2 == shard_state_dir(spark, SF_SMOKE, n_shards=2)
    n2 = spark.read.parquet(f"{d2}/stats").select("shard").distinct().count()
    n3 = spark.read.parquet(f"{d3}/stats").select("shard").distinct().count()
    assert (n2, n3) == (2, 3)


def test_knn_ivf_shard_merge_equals_single_build(spark):
    """The search through the merged index is row-identical to the
    single-build knn_ivf — the merge is invisible to the read path."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import knn_ivf, knn_ivf_shard_merge

    for qid in (0, 2):
        a = knn_ivf_shard_merge(spark, SF_CORRECT, query_id=qid).collect()
        b = knn_ivf(spark, SF_CORRECT, query_id=qid).collect()
        assert [(r.vec_id, r.score) for r in a] == [(r.vec_id, r.score) for r in b]


def test_ivf_merge_serve_equals_shard_merge(spark):
    """Serving through the PERSISTED merged layout (shard partials →
    parquet → merge from disk → standard engine layout → facade
    search) is row-identical to the in-session shard-merge search —
    the whole handoff is value-neutral (the IVF twin of
    graph_merge_serve's contract)."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        ivf_merge_serve,
        knn_ivf_shard_merge,
    )

    for qid in (0, 2):
        a = ivf_merge_serve(spark, SF_CORRECT, query_id=qid).collect()
        b = knn_ivf_shard_merge(spark, SF_CORRECT, query_id=qid).collect()
        assert [(r.vec_id, r.score) for r in a] == [(r.vec_id, r.score) for r in b]


def test_cli_serves_merged_ivf_index(spark, tmp_path, capsys):
    """``--index ivf`` over the merged-shard layout: the CLI binds the
    standard directory layout, so a merged index serves through the
    reference-flag binary unchanged — and prints exactly the
    shard-merge search's rows (VERDICT r7 #4)."""
    import numpy as np

    from gpu_accelerated_vector_indexing_spark.engine import main
    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        fixture_qvec,
        knn_ivf_shard_merge,
        merged_ivf_index,
    )

    idx = merged_ivf_index(spark, SF_SMOKE)
    qvec = fixture_qvec(spark, SF_SMOKE, 0)
    np.asarray(qvec, dtype=np.float32).tofile(tmp_path / "qmerged.bin")
    main(
        [
            "--index_dir", idx,
            "--query_bin", str(tmp_path / "qmerged.bin"),
            "--dim", str(len(qvec)),
            "--k", "5",
            "--n_probe", "3",
        ]
    )
    out = capsys.readouterr().out
    got = [line for line in out.splitlines() if line.startswith("(")]
    want = [
        f"({r.score:.6f}, {r.vec_id})"
        for r in knn_ivf_shard_merge(spark, SF_SMOKE).collect()
    ]
    assert got == want


def test_embedding_outliers_accounts_every_cluster(spark):
    """One row per cluster; counts conserve (outliers ≤ members, worst
    member's d2 ≥ the mean — the max of any nonempty set bounds its
    mean); the flagged count matches a direct recount at the factor."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import embedding_outliers
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    rows = embedding_outliers(spark, SF_SMOKE).collect()
    emb = load_table(spark, SF_SMOKE, "embeddings")
    assert len(rows) == emb.select("label").distinct().count()
    assert sum(r["n_members"] for r in rows) == emb.count()
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n_members"]
        assert r["worst_d2"] >= r["mean_d2"]


def test_adaptive_probe_bounds_and_fullprobe_limit(spark):
    """The adaptive probe set always contains the best cluster
    (nonempty), never exceeds the cluster count, and at delta = 2 (the
    full score range) probes EVERYTHING — so the adaptive search equals
    brute force there (the full-probe invariant's adaptive twin)."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        adaptive_probe_labels,
        fixture_centroid_rows,
        fixture_qvec,
        knn_ivf_adaptive,
        probe_labels,
    )
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce

    rows = fixture_centroid_rows(spark, SF_SMOKE)
    qv = fixture_qvec(spark, SF_SMOKE, 0)
    probes = adaptive_probe_labels(rows, qv, 0.1)
    assert 1 <= len(probes) <= len(rows)
    assert probe_labels(rows, qv, 1)[0] in probes  # best cluster always probed
    full = knn_ivf_adaptive(spark, SF_SMOKE, query_id=3, delta=2.0).collect()
    exact = knn_bruteforce(spark, SF_SMOKE, query_id=3, k=5).collect()
    assert [(r.vec_id, r.score) for r in full] == [(r.vec_id, r.score) for r in exact]


def test_adaptive_sweep_monotone_in_delta(spark):
    """Wider gaps probe at least as many clusters and can only add
    candidates, so n_probes and recall are both non-decreasing in
    delta — the defining property of the knob's trade-off curve."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import ivf_adaptive_sweep

    rows = ivf_adaptive_sweep(spark, SF_CORRECT).collect()
    assert [r["delta"] for r in rows] == sorted(r["delta"] for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a["n_probes"] <= b["n_probes"]
        assert a["recall"] <= b["recall"]


# --- r9: CDC → incremental index refresh --------------------------------------


def test_cdc_refresh_equals_scratch_rebuild(spark):
    """The composition's core claim: full-probe reads over the CDC-
    refreshed index ≡ a from-scratch rebuild on the new snapshot —
    EXACTLY (full probe is brute force over live rows, so differing
    KMeans centroids between the two builds cannot matter)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.functions.embedder import embed_queries
    from gpu_accelerated_vector_indexing_spark.functions.vector import (
        as_double_array,
        cosine_similarity,
    )
    from gpu_accelerated_vector_indexing_spark.operators.curation import snapshot_new_docs
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        CDC_QUERY_TEXT,
        _snapshot_emb,
        index_refresh_cdc,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    refreshed = [
        (r.doc_id, r.score) for r in index_refresh_cdc(spark, SF_SMOKE).collect()
    ]

    # from-scratch "rebuild": full-probe reads ≡ brute force over the
    # re-embedded new snapshot, whatever centroids a rebuild would pick
    docs = load_table(spark, SF_SMOKE, "documents")
    scratch_emb = _snapshot_emb(snapshot_new_docs(docs), gen=0)
    q = embed_queries(spark, [CDC_QUERY_TEXT])
    scratch = [
        (r.doc_id, r.score)
        for r in (
            scratch_emb.join(F.broadcast(q))
            .select(
                F.col("vec_id").alias("doc_id"),
                F.round(
                    cosine_similarity(as_double_array("embedding"), F.col("qvec")), 6
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.desc("doc_id"))
            .limit(5)
        ).collect()
    ]
    assert refreshed == scratch


def test_cdc_refresh_accounting_and_live_set(spark):
    """Refresh cost is O(|delta|): appends = |added| + |changed|,
    tombstones = |removed| + |changed|, and the live row set is exactly
    the new snapshot's doc ids."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        corpus_snapshot_diff,
        snapshot_new_docs,
    )
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        _CDC_REFRESH_STATE,
        _live_index_rows,
        cdc_refreshed_index,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    idx_dir = cdc_refreshed_index(spark, SF_SMOKE)
    stats = _CDC_REFRESH_STATE[(spark, SF_SMOKE)]
    by_status = {
        r.status: r.n
        for r in corpus_snapshot_diff(spark, SF_SMOKE)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert stats["n_appended"] == by_status.get("added", 0) + by_status.get("changed", 0)
    assert stats["n_tombstoned"] == by_status.get("removed", 0) + by_status.get("changed", 0)
    assert by_status.get("changed", 0) > 0  # the edit slice must exercise re-embedding

    live_ids = {
        r.vec_id for r in _live_index_rows(spark, idx_dir).select("vec_id").collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    new_ids = {r.doc_id for r in snapshot_new_docs(docs).select("doc_id").collect()}
    assert live_ids == new_ids


def test_cdc_edit_moves_the_embedding(spark):
    """The ' rev2' marker exists so edited docs genuinely re-embed (the
    featurizer lowercases, so a case-only edit would be a no-op): an
    edited doc's gen-1 vector must differ from its gen-0 vector."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        SNAP_EDIT_MOD,
        SNAP_EDIT_REM,
    )
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        cdc_refreshed_index,
    )
    from tests.conftest import SF_SMOKE

    idx_dir = cdc_refreshed_index(spark, SF_SMOKE)
    idx = spark.read.parquet(f"{idx_dir}/embeddings_indexed")
    edited = idx.filter(
        (F.col("vec_id") % SNAP_EDIT_MOD == SNAP_EDIT_REM)
    )
    pairs = (
        edited.filter(F.col("gen") == 0)
        .select("vec_id", F.col("embedding").alias("e0"))
        .join(
            edited.filter(F.col("gen") == 1).select(
                "vec_id", F.col("embedding").alias("e1")
            ),
            "vec_id",
        )
        .collect()
    )
    assert pairs, "edit slice must intersect both snapshots"
    assert all(list(p.e0) != list(p.e1) for p in pairs)


def test_streaming_refresh_equals_batch_refresh(spark):
    """The streaming fold and the nightly batch job must maintain the
    SAME index: drained-stream serve rows ≡ batch refresh serve rows."""
    from gpu_accelerated_vector_indexing_spark.operators.index_build import index_refresh_cdc
    from gpu_accelerated_vector_indexing_spark.streaming.index_stream import (
        streaming_index_refresh,
    )
    from tests.conftest import SF_SMOKE

    batch = [(r.doc_id, r.score) for r in index_refresh_cdc(spark, SF_SMOKE).collect()]
    stream = [
        (r.doc_id, r.score) for r in streaming_index_refresh(spark, SF_SMOKE).collect()
    ]
    assert stream == batch


def test_compaction_preserves_serving_and_empties_tombstones(spark):
    """Compaction is value-neutral (serve rows identical to the masked
    refresh) and actually reclaims: the tombstone list is empty, no
    gen-0 row named by the old list survives, and untouched clusters'
    files are byte-identical (never rewritten)."""
    import os

    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        compact_refreshed_index,
        index_refresh_cdc,
        index_refresh_compacted,
        cdc_refreshed_index,
    )
    from tests.conftest import SF_SMOKE

    masked = [(r.doc_id, r.score) for r in index_refresh_cdc(spark, SF_SMOKE).collect()]
    compacted = [
        (r.doc_id, r.score) for r in index_refresh_compacted(spark, SF_SMOKE).collect()
    ]
    assert compacted == masked

    cdir = compact_refreshed_index(spark, SF_SMOKE)
    assert spark.read.parquet(f"{cdir}/tombstones").count() == 0
    # the set of live rows matches the (still-tombstoned) refresh memo's
    rdir = cdc_refreshed_index(spark, SF_SMOKE)
    from gpu_accelerated_vector_indexing_spark.operators.index_build import _live_index_rows

    live_ref = {r.vec_id for r in _live_index_rows(spark, rdir).select("vec_id").collect()}
    rows_comp = {
        r.vec_id
        for r in spark.read.parquet(f"{cdir}/embeddings_indexed").select("vec_id").collect()
    }
    assert rows_comp == live_ref
    # old tombstoned ids are physically gone from gen-0 files
    tomb_ids = {r.vec_id for r in spark.read.parquet(f"{rdir}/tombstones").collect()}
    gen0 = {
        r.vec_id
        for r in spark.read.parquet(f"{cdir}/embeddings_indexed")
        .filter(F.col("gen") == 0)
        .select("vec_id")
        .collect()
    }
    assert not (gen0 & tomb_ids)


def test_compaction_rewrites_only_affected_partitions(spark):
    """Compaction cost scales with DAMAGE, not index size: on a
    caller-owned refreshed copy, every unaffected cluster's file set
    (names + sizes) is byte-identical before and after compaction —
    a regression to whole-index rewrites (dropping the affected filter
    or the dynamic-overwrite option) fails here."""
    import os

    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        apply_cdc_refresh,
        build_base_snapshot_index,
        compact_index_dir,
    )
    from tests.conftest import SF_SMOKE

    out = build_base_snapshot_index(spark, SF_SMOKE)
    apply_cdc_refresh(spark, SF_SMOKE, out)

    def listing(root):
        snap = {}
        for d in os.listdir(root):
            if d.startswith("cluster="):
                snap[d] = {
                    (f, os.path.getsize(f"{root}/{d}/{f}"))
                    for f in os.listdir(f"{root}/{d}")
                    if f.endswith(".parquet")
                }
        return snap

    before = listing(f"{out}/embeddings_indexed")
    affected = compact_index_dir(spark, out)
    after = listing(f"{out}/embeddings_indexed")

    assert affected, "the fixture delta must damage at least one cluster"
    affected_dirs = {f"cluster={c}" for c in affected}
    untouched = set(before) - affected_dirs
    assert untouched, "some cluster must be undamaged for the test to bite"
    for d in untouched:
        assert after[d] == before[d], f"{d} was rewritten without damage"
    for d in affected_dirs & set(after):
        assert after[d], f"{d} left empty by compaction"


def test_streaming_classifier_matches_snapshot_diff(spark):
    """The stream's row-local CDC classification restates curation's
    snapshot definition as pure predicates — pin the two against each
    other so an edit-rule change cannot drift one without the other."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import corpus_snapshot_diff
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from gpu_accelerated_vector_indexing_spark.streaming.index_stream import _classified
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    row_local = {
        (r.doc_id, r.status) for r in _classified(docs).select("doc_id", "status").collect()
    }
    via_diff = {
        (r.doc_id, r.status)
        for r in corpus_snapshot_diff(spark, SF_SMOKE).select("doc_id", "status").collect()
    }
    assert row_local == via_diff


# --- r10: generation 2 — the refresh as a LOOP ---------------------------------


def test_gen2_refresh_equals_scratch_rebuild_on_v3(spark):
    """After TWO refresh cycles, full-probe reads ≡ a from-scratch
    rebuild on snapshot N+2 — the VERDICT r9 #1 pin, iterated: two
    stacked tombstone generations + two append generations must leave
    exactly v3's embeddings live, whatever centroids partition them."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.functions.embedder import embed_queries
    from gpu_accelerated_vector_indexing_spark.functions.vector import (
        as_double_array,
        cosine_similarity,
    )
    from gpu_accelerated_vector_indexing_spark.operators.curation import snapshot_v3_docs
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        CDC_QUERY_TEXT,
        _snapshot_emb,
        index_refresh_cdc_gen2,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    refreshed = [
        (r.doc_id, r.score) for r in index_refresh_cdc_gen2(spark, SF_SMOKE).collect()
    ]
    docs = load_table(spark, SF_SMOKE, "documents")
    scratch_emb = _snapshot_emb(snapshot_v3_docs(docs), gen=0)
    q = embed_queries(spark, [CDC_QUERY_TEXT])
    scratch = [
        (r.doc_id, r.score)
        for r in (
            scratch_emb.join(F.broadcast(q))
            .select(
                F.col("vec_id").alias("doc_id"),
                F.round(
                    cosine_similarity(as_double_array("embedding"), F.col("qvec")), 6
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.desc("doc_id"))
            .limit(5)
        ).collect()
    ]
    assert refreshed == scratch


def test_gen2_layout_exercises_every_lifecycle_edge(spark):
    """The v3 slices were designed to make cycle 2 retire cycle-1
    APPENDS — assert each edge actually fired in the layout (a slice
    drifting empty would quietly stop testing the design):
    (a) ≥1 gen-1 tombstone names a vec_id holding a gen-1 index row
    (tombstone-of-append); (b) ≥1 doc tombstoned at gen 0 in cycle 1
    is resurrected by a live gen-2 row; (c) ≥1 twice-edited doc holds
    gen-1 AND gen-2 rows with only gen-2 live; (d) live vec_ids ≡ v3
    doc ids exactly."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.curation import snapshot_v3_docs
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        _live_index_rows,
        cdc_refreshed_index_gen2,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    idx_dir = cdc_refreshed_index_gen2(spark, SF_SMOKE)
    idx = spark.read.parquet(f"{idx_dir}/embeddings_indexed")
    tombs = spark.read.parquet(f"{idx_dir}/tombstones")
    rows_by_gen = {
        g: {r.vec_id for r in idx.filter(F.col("gen") == g).collect()} for g in (0, 1, 2)
    }
    tombs_by_gen = {
        g: {r.vec_id for r in tombs.filter(F.col("gen") == g).collect()} for g in (0, 1)
    }
    live = {r.vec_id for r in _live_index_rows(spark, idx_dir).select("vec_id").collect()}

    # (a) tombstone-of-append
    assert tombs_by_gen[1] & rows_by_gen[1], "no cycle-1 append was retired"
    # (b) resurrection: cycle-1 tombstone, live gen-2 row
    resurrected = tombs_by_gen[0] & rows_by_gen[2] & live
    assert resurrected, "no doc removed in cycle 1 was re-added in cycle 2"
    # (c) twice-edited: gen-1 and gen-2 rows, only gen-2 live
    twice = rows_by_gen[1] & rows_by_gen[2]
    assert twice, "no doc was edited in both cycles"
    assert twice <= tombs_by_gen[1]  # their gen-1 rows are retired
    # (d) live set ≡ v3 exactly
    docs = load_table(spark, SF_SMOKE, "documents")
    v3_ids = {r.doc_id for r in snapshot_v3_docs(docs).select("doc_id").collect()}
    assert live == v3_ids


def test_gen2_compact_mid_sequence_preserves_state(spark):
    """base → cycle 1 → COMPACT → cycle 2 ends in the same live state
    as the uncompacted two-cycle layout: same live (vec_id, gen-class)
    rows, same serve result — maintenance can interleave with refresh
    cycles at any point."""
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        _live_index_rows,
        cdc_refreshed_index_gen2,
        compact_mid_sequence_index,
        index_refresh_cdc_gen2,
        index_refresh_gen2_compact_mid,
    )
    from tests.conftest import SF_SMOKE

    a = [(r.doc_id, r.score) for r in index_refresh_cdc_gen2(spark, SF_SMOKE).collect()]
    b = [
        (r.doc_id, r.score)
        for r in index_refresh_gen2_compact_mid(spark, SF_SMOKE).collect()
    ]
    assert a == b
    live_a = {
        r.vec_id
        for r in _live_index_rows(spark, cdc_refreshed_index_gen2(spark, SF_SMOKE))
        .select("vec_id")
        .collect()
    }
    live_b = {
        r.vec_id
        for r in _live_index_rows(spark, compact_mid_sequence_index(spark, SF_SMOKE))
        .select("vec_id")
        .collect()
    }
    assert live_a == live_b


def test_streaming_fold_replay_is_idempotent(spark):
    """foreachBatch is at-least-once: replaying a micro-batch (same
    batch_id, same rows — the recovery case ADVICE r9 flagged) must
    leave the layout byte-for-byte equivalent, not double-appended."""
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        build_base_snapshot_index,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from gpu_accelerated_vector_indexing_spark.streaming.index_stream import (
        fold_micro_batch,
    )
    from tests.conftest import SF_SMOKE

    out = build_base_snapshot_index(spark, SF_SMOKE, batch_layout=True)
    docs = load_table(spark, SF_SMOKE, "documents")

    def state():
        idx = spark.read.parquet(f"{out}/embeddings_indexed")
        tombs = spark.read.parquet(f"{out}/tombstones")
        return (
            sorted((r.vec_id, r.gen, r.batch) for r in idx.select("vec_id", "gen", "batch").collect()),
            sorted((r.vec_id, r.gen, r.batch) for r in tombs.select("vec_id", "gen", "batch").collect()),
        )

    fold_micro_batch(spark, out, docs, batch_id=0)
    first = state()
    assert first[0] and first[1], "fold must have written appends and tombstones"
    fold_micro_batch(spark, out, docs, batch_id=0)  # the replay
    assert state() == first


def test_streaming_gen2_equals_batch_gen2(spark):
    """The gen-2 stream (two drained change feeds, cycle-keyed batch
    dirs) and the batch gen-2 loop must maintain the SAME index: serve
    rows identical."""
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        index_refresh_cdc_gen2,
    )
    from gpu_accelerated_vector_indexing_spark.streaming.index_stream import (
        streaming_index_refresh_gen2,
    )
    from tests.conftest import SF_SMOKE

    batch = [
        (r.doc_id, r.score) for r in index_refresh_cdc_gen2(spark, SF_SMOKE).collect()
    ]
    stream = [
        (r.doc_id, r.score)
        for r in streaming_index_refresh_gen2(spark, SF_SMOKE).collect()
    ]
    assert stream == batch


# --- r10 cont.: time travel / delete-where / rebalance-apply -----------------


def test_asof_gen2_slice_equals_latest_serve(spark):
    """The asof-2 slice of the time-travel read must be value-identical
    to the gen-2 refresh serve — latest-generation time travel IS the
    ordinary masked read."""
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        index_read_asof_gen,
        index_refresh_cdc_gen2,
    )

    asof = {
        (r.doc_id, r.score)
        for r in index_read_asof_gen(spark, SF_SMOKE).collect()
        if r.asof_gen == 2
    }
    latest = {
        (r.doc_id, r.score)
        for r in index_refresh_cdc_gen2(spark, SF_SMOKE).collect()
    }
    assert asof == latest


def test_asof_live_counts_match_snapshot_sizes(spark):
    """Visibility windows reconstruct each snapshot's exact row count:
    |asof 0| = |base|, |asof 1| = |N+1|, |asof 2| = |N+2|."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        snapshot_new_docs,
        snapshot_old_docs,
        snapshot_v3_docs,
    )
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        _live_index_rows_asof,
        cdc_refreshed_index_gen2,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    idx_dir = cdc_refreshed_index_gen2(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    expected = [
        snapshot_old_docs(docs).count(),
        snapshot_new_docs(docs).count(),
        snapshot_v3_docs(docs).count(),
    ]
    got = [_live_index_rows_asof(spark, idx_dir, v).count() for v in (0, 1, 2)]
    assert got == expected


def test_delete_where_purges_exactly_the_predicate(spark):
    """No served id may belong to a purged source, and the live set
    shrinks by exactly the victim count."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import snapshot_old_docs
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        DELETE_WHERE_SOURCES,
        _live_index_rows,
        delete_where_index,
        index_delete_where,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    old_ids = snapshot_old_docs(docs).select("doc_id")
    victims = {
        r.doc_id
        for r in docs.join(old_ids, "doc_id", "left_semi")
        .filter(F.col("source").isin(*DELETE_WHERE_SOURCES))
        .collect()
    }
    assert victims, "fixture must exercise the purge slice"
    served = {r.doc_id for r in index_delete_where(spark, SF_SMOKE).collect()}
    assert not served & victims
    idx_dir = delete_where_index(spark, SF_SMOKE)
    assert _live_index_rows(spark, idx_dir).count() == old_ids.count() - len(victims)


def test_rebalance_apply_preserves_membership_and_splits(spark):
    """The rewritten layout holds exactly the fixture's vec_ids once
    each; every split produced two non-empty sides; hot clusters got
    strictly smaller."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        REBALANCE_SPLIT_RATIO,
        rebalance_split_assignments,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = rebalance_split_assignments(spark, SF_SMOKE)
    assert rows.count() == emb.count()
    assert rows.select("vec_id").distinct().count() == emb.count()

    before = {r.label: r.n for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()}
    target = sum(before.values()) / len(before)
    hot = {lbl for lbl, n in before.items() if n / target > REBALANCE_SPLIT_RATIO}
    assert hot, "fixture must exercise the split path"
    after = {r.cluster: r.n for r in rows.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert len(after) == len(before) + len(hot)
    for lbl in hot:
        assert 0 < after[lbl] < before[lbl]
    for lbl, n in before.items():
        if lbl not in hot:
            assert after[lbl] == n


def test_rebalance_serve_is_value_identical_to_bruteforce(spark):
    """Full-probe serving through the rebalanced layout returns exactly
    the brute-force top-k — the split moved no vector."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import ivf_rebalance_serve
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce

    got = {(r.vec_id, r.score) for r in ivf_rebalance_serve(spark, SF_SMOKE).collect()}
    want = {(r.vec_id, r.score) for r in knn_bruteforce(spark, SF_SMOKE, query_id=0, k=5).collect()}
    assert got == want


def test_rebalance_merge_preserves_membership_and_drains_cold(spark):
    """The post-merge relation holds exactly the fixture's vec_ids once
    each; every cold cluster is gone as a label; its target grew by at
    least its donation (unless the target itself merged away)."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        REBALANCE_MERGE_RATIO,
        rebalance_merge_assignments,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = rebalance_merge_assignments(spark, SF_SMOKE)
    assert rows.count() == emb.count()
    assert rows.select("vec_id").distinct().count() == emb.count()

    before = {r.label: r.n for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()}
    target = sum(before.values()) / len(before)
    cold = {lbl for lbl, n in before.items() if n / target < REBALANCE_MERGE_RATIO}
    assert cold, "fixture must exercise the merge path"
    after = {r.cluster: r.n for r in rows.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert not cold & set(after)
    assert sum(after.values()) == sum(before.values())


def test_rebalance_merge_serve_is_value_identical_to_bruteforce(spark):
    from gpu_accelerated_vector_indexing_spark.operators.ivf import ivf_rebalance_merge_serve
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce

    got = {(r.vec_id, r.score) for r in ivf_rebalance_merge_serve(spark, SF_SMOKE).collect()}
    want = {(r.vec_id, r.score) for r in knn_bruteforce(spark, SF_SMOKE, query_id=0, k=5).collect()}
    assert got == want


def test_history_stats_ledger_balances(spark):
    """Each cycle's tombstones retire exactly one live row apiece
    (removed/changed docs have one live row by construction), so the
    ledger balances: live(v) = live(v-1) + written(v) - retired(v)."""
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        index_history_stats,
    )

    rows = {r.gen: r for r in index_history_stats(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].n_retired == 0
    assert rows[0].n_live == rows[0].n_written
    for v in (1, 2):
        assert (
            rows[v].n_live
            == rows[v - 1].n_live + rows[v].n_written - rows[v].n_retired
        )


def test_refresh_rebalance_composition_preserves_live_set(spark):
    """The maintenance rewrite holds exactly the gen-2 live rows once
    each, with MORE clusters than before (the split actually fired on
    the skew the appends introduced) and no tombstone list left."""
    import os

    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        _live_index_rows,
        cdc_refreshed_index_gen2,
        rebalanced_refreshed_index,
    )

    live = _live_index_rows(spark, cdc_refreshed_index_gen2(spark, SF_SMOKE))
    out = rebalanced_refreshed_index(spark, SF_SMOKE)
    reb = spark.read.parquet(f"{out}/embeddings_indexed")
    assert reb.count() == live.count()
    assert reb.select("vec_id").distinct().count() == live.count()
    n_before = live.select("cluster").distinct().count()
    n_after = reb.select("cluster").distinct().count()
    assert n_after > n_before
    assert not os.path.exists(f"{out}/tombstones")


def test_streaming_delete_fold_replay_is_idempotent(spark):
    """The delete feed's fold is tombstone-only and idempotent per
    batch_id: a replay leaves the layout equivalent, and index files
    are never touched."""
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        build_base_snapshot_index,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from gpu_accelerated_vector_indexing_spark.streaming.index_stream import (
        fold_delete_batch,
    )

    out = build_base_snapshot_index(spark, SF_SMOKE, batch_layout=True)
    docs = load_table(spark, SF_SMOKE, "documents")

    def state():
        idx = spark.read.parquet(f"{out}/embeddings_indexed")
        tombs = spark.read.parquet(f"{out}/tombstones")
        return (
            sorted((r.vec_id, r.gen) for r in idx.select("vec_id", "gen").collect()),
            sorted((r.vec_id, r.gen, r.batch) for r in tombs.select("vec_id", "gen", "batch").collect()),
        )

    base_rows = state()[0]
    fold_delete_batch(spark, out, docs, batch_id=0)
    first = state()
    assert first[1], "fold must have written tombstones"
    assert first[0] == base_rows, "delete folds must not touch index rows"
    fold_delete_batch(spark, out, docs, batch_id=0)  # the replay
    assert state() == first


def test_gated_refresh_rejects_failing_upserts(spark):
    """The quality gate must actually fire: some upserts fail the
    filter and are absent from the gated layout's live rows, while
    every admitted upsert passes."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        corpus_snapshot_diff,
        quality_flags,
        snapshot_new_docs,
    )
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        _live_index_rows,
        quality_gated_refresh_index,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    diff = corpus_snapshot_diff(spark, SF_SMOKE)
    upsert_ids = {
        r.doc_id
        for r in diff.filter(F.col("status").isin("added", "changed")).collect()
    }
    keep = {
        r.doc_id
        for r in quality_flags(snapshot_new_docs(docs))
        .filter(F.col("keep"))
        .collect()
    }
    rejected = upsert_ids - keep
    assert rejected, "fixture must exercise the gate"
    live = {
        r.vec_id
        for r in _live_index_rows(
            spark, quality_gated_refresh_index(spark, SF_SMOKE)
        ).collect()
    }
    assert not live & rejected
    assert (upsert_ids & keep) <= live


def test_filtered_planner_picks_both_branches(spark):
    """'fr' (~15% of docs) must plan pre-filter; 'en' (~43%) must plan
    post-filter — both branches of the planner are exercised, and the
    post-filter branch's rows come from probed clusters only."""
    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        coarse_probes,
        knn_filtered_planned,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    narrow = knn_filtered_planned(spark, SF_SMOKE, lang="fr").collect()
    broad = knn_filtered_planned(spark, SF_SMOKE, lang="en").collect()
    assert {r.strategy for r in narrow} == {"prefilter"}
    assert {r.strategy for r in broad} == {"postfilter"}
    probes = set(coarse_probes(spark, SF_SMOKE, 0, 5))
    emb = load_table(spark, SF_SMOKE, "embeddings")
    labels = {
        r.label
        for r in emb.filter(
            F.col("vec_id").isin([r.vec_id for r in broad])
        ).collect()
    }
    assert labels <= probes


def test_embedder_migration_changes_geometry_and_serves_both(spark):
    """v2 is a genuinely different model: its ranking differs from
    v1's; each version's slice is a full top-k; and v1 serving equals
    the un-migrated refresh family's base ranking oracle-side (both
    gated), so here we pin the Spark-side shape."""
    from gpu_accelerated_vector_indexing_spark.operators.index_build import (
        index_embedder_migration,
    )

    rows = index_embedder_migration(spark, SF_SMOKE).collect()
    by_version = {}
    for r in rows:
        by_version.setdefault(r.version, []).append((r.doc_id, r.score))
    assert set(by_version) == {"v1", "v2"}
    assert len(by_version["v1"]) == len(by_version["v2"]) == 5
    assert by_version["v1"] != by_version["v2"]
