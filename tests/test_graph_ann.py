from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import assert_parity

NAMES = [
    "graph_ann_build",
    "knn_graph_beam",
    "knn_graph_beam_bq",
    "knn_graph_beam_filtered",
    "knn_graph_beam_with_deletes",
    "graph_state_roundtrip",
    "graph_search_with_docs",
    "graph_recall_sweep",
    "graph_ann_recall",
    "graph_ann_insert",
    "graph_shard_merge_search",
    "graph_retrieval_ndcg",
    "graph_merge_serve",
]


@pytest.mark.parametrize("name", NAMES)
def test_graph_ann_oracle_parity_smoke(spark, duck, name):
    assert_parity(spark, duck, name, SF_SMOKE)


@pytest.mark.parametrize("name", NAMES)
def test_graph_ann_oracle_parity_sf001(spark, duck, name):
    assert_parity(spark, duck, name, SF_CORRECT)


def test_graph_contract(spark):
    """k edges per node, no self loops, no duplicate edges, scores
    rounded and within [-1, 1]."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import K_GRAPH, fixture_graph

    g = fixture_graph(spark, SF_SMOKE)
    per_node = g.groupBy("node").agg(
        F.count("*").alias("deg"), F.countDistinct("nbr").alias("dnbr")
    )
    bad = per_node.filter((F.col("deg") != K_GRAPH) | (F.col("dnbr") != K_GRAPH)).count()
    assert bad == 0
    assert g.filter(F.col("node") == F.col("nbr")).count() == 0
    assert g.filter((F.col("score") < -1.0) | (F.col("score") > 1.0)).count() == 0


def test_dot_kernel_bit_exact_vs_jvm_fold(spark):
    """The Arrow build kernel must match the JVM sequential fold
    BIT-FOR-BIT (same float association) — this is what licenses using
    it inside a value-hash-oracled build."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.functions.vector import (
        as_double_array,
        dot_product,
        dot_product_seq_pandas,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = emb.select(F.col("vec_id").alias("ia"), as_double_array("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), as_double_array("embedding").alias("vb"))
    pairs = a.crossJoin(b)
    n = pairs.count()
    same = pairs.select(
        (dot_product_seq_pandas(F.col("va"), F.col("vb"))
         == dot_product(F.col("va"), F.col("vb"))).alias("eq")
    ).filter("eq").count()
    assert same == n, f"kernel diverged from fold on {n - same}/{n} pairs"


def test_beam_recall_floor(spark):
    """Beam search must land most of the exact top-k — the ANN quality
    contract (graph quality × navigability), floor well under the
    measured ~0.9 so fixture noise can't flake it."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import knn_graph_beam
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce

    hits = total = 0
    for qid in (0, 1):
        exact = {r.vec_id for r in knn_bruteforce(spark, SF_CORRECT, query_id=qid, k=5).collect()}
        got = {r.vec_id for r in knn_graph_beam(spark, SF_CORRECT, query_id=qid, k=5).collect()}
        hits += len(exact & got)
        total += 5
    assert hits / total >= 0.6, f"recall@5 {hits}/{total}"


def test_beam_bq_recall_floor(spark):
    """The compressed (1-bit navigation + exact rescore-all) walk must
    stay near the float beam's quality — measured 0.87 at the fixture;
    floor at 0.6 so noise can't flake it."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import knn_graph_beam_bq
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce

    hits = total = 0
    for qid in (0, 1):
        exact = {r.vec_id for r in knn_bruteforce(spark, SF_CORRECT, query_id=qid, k=5).collect()}
        got = {r.vec_id for r in knn_graph_beam_bq(spark, SF_CORRECT, query_id=qid, k=5).collect()}
        hits += len(exact & got)
        total += 5
    assert hits / total >= 0.6, f"recall@5 {hits}/{total}"


def test_sweep_batched_walk_matches_per_beam_walks(spark):
    """The r10 batched SWEEP (beam width travels per member through
    ``multi_beam_visited_over(beams=...)``) must match the per-beam
    single-query walk exactly at every width — the beam-knob twin of
    the multi-query batching-parity pin below."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        _member_topk,
        _sweep_visited,
        knn_graph_beam,
    )

    beams = (8, 24, 48)
    visited = _sweep_visited(spark, SF_CORRECT, 0, beams)
    for b in beams:
        batched = sorted(
            (r.vec_id, r.score) for r in _member_topk(visited, b, 5).collect()
        )
        single = sorted(
            (r.vec_id, r.score)
            for r in knn_graph_beam(spark, SF_CORRECT, query_id=0, k=5, beam=b).collect()
        )
        assert batched == single, f"beam {b} diverged"


def test_multi_query_graph_beam_batched_parity_and_jobs(spark):
    """The batched walk (query_id in the frontier) must (a) match the
    per-query walk's top-k exactly and (b) cost a job count INDEPENDENT
    of |Q| — the VERDICT r5 #5 acceptance (previously one full walk's
    jobs per query)."""
    import uuid

    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        knn_graph_beam,
        multi_query_graph_beam,
    )

    # warm the memoized adjacency/normed state so job counts below
    # measure the walk, not the one-time build
    multi_query_graph_beam(spark, SF_CORRECT, query_ids=(0,)).collect()

    # (a) value parity vs the single-query walk
    batched = multi_query_graph_beam(spark, SF_CORRECT, query_ids=(0, 3, 7)).collect()
    by_q = {}
    for r in batched:
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.score))
    for qid in (0, 3, 7):
        single = [
            (r.vec_id, r.score)
            for r in knn_graph_beam(spark, SF_CORRECT, query_id=qid, k=5).collect()
        ]
        assert sorted(by_q[qid]) == sorted(single), f"query {qid} diverged"

    # (b) jobs per batch do not grow with |Q| — pre-warm every qvec so
    # both measurements are walk-only (a cold id costs one fetch job,
    # which would silently consume the assertion's tolerance)
    from gpu_accelerated_vector_indexing_spark.operators.ivf import fixture_qvecs

    fixture_qvecs(spark, SF_CORRECT, (0, 1, 3, 5, 7, 9))

    def jobs(query_ids):
        group = f"jobcount-{uuid.uuid4()}"
        spark.sparkContext.setJobGroup(group, "multi-beam job count")
        try:
            multi_query_graph_beam(spark, SF_CORRECT, query_ids=query_ids).collect()
        finally:
            spark.sparkContext.setJobGroup(None, None)
        return len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))

    j2, j6 = jobs((0, 3)), jobs((0, 1, 3, 5, 7, 9))
    assert j6 <= j2 + 1, f"jobs grew with |Q|: {j2} -> {j6}"


def test_graph_relink_after_deletes_shape(spark):
    """Repair digest invariants: ranks are 1..K, every affected node
    fills rank 1 (counts non-increasing in rank), and the repaired
    edge set is tombstone-free by construction (nbr_id_sum would carry
    a multiple-of-DELETE_MOD contribution only by collision — checked
    structurally instead: rank-1 count equals the affected-node count
    recomputed from the graph state)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        DELETE_MOD,
        K_GRAPH,
        fixture_graph,
        graph_relink_after_deletes,
    )

    rows = graph_relink_after_deletes(spark, SF_CORRECT).collect()
    assert [r.rk for r in rows] == list(range(1, K_GRAPH + 1))
    counts = [r.n_edges for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    g = fixture_graph(spark, SF_CORRECT)
    n_affected = (
        g.filter((F.col("node") % DELETE_MOD != 0) & (F.col("nbr") % DELETE_MOD == 0))
        .select("node")
        .distinct()
        .count()
    )
    assert counts[0] == n_affected  # every damaged node got a rank-1 edge


def test_graph_engine_batch_search_matches_in_session(spark):
    """Persisted-index facade batch search ≡ the in-session batched
    walk: persistence and the facade path must both be value-neutral."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        graph_engine_batch_search,
        multi_query_graph_beam,
    )

    a = sorted(
        (r.query_id, r.vec_id, r.score)
        for r in graph_engine_batch_search(spark, SF_CORRECT, query_ids=(0, 3, 7)).collect()
    )
    b = sorted(
        (r.query_id, r.vec_id, r.score)
        for r in multi_query_graph_beam(spark, SF_CORRECT, query_ids=(0, 3, 7)).collect()
    )
    assert a == b


def test_graph_index_stats_invariants(spark):
    """One health row: n_edges = n_nodes * K, reciprocity in (0, 1],
    micro digest ordered min <= max, reciprocal count <= edges."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        K_GRAPH,
        graph_index_stats,
    )

    r = graph_index_stats(spark, SF_CORRECT).collect()[0]
    assert r.n_edges == r.n_nodes * K_GRAPH
    assert 0 < r.n_reciprocal <= r.n_edges
    assert 0 < r.reciprocity_micro <= 1_000_000
    assert r.score_min_micro <= r.score_max_micro


def test_single_walk_job_count_bounded(spark):
    """The driver-resident walk's job budget is structural: one entry
    collect + one entry scoring + 2 jobs per hop (expansion lookup,
    scoring lookup) + the final top-k — a regression back to per-hop
    checkpoints/broadcast-exchanges would blow this bound."""
    import uuid

    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        BEAM_HOPS,
        knn_graph_beam,
    )

    knn_graph_beam(spark, SF_CORRECT).collect()  # warm memoized state
    group = f"walkjobs-{uuid.uuid4()}"
    spark.sparkContext.setJobGroup(group, "single walk job count")
    try:
        knn_graph_beam(spark, SF_CORRECT).collect()
    finally:
        spark.sparkContext.setJobGroup(None, None)
    jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))
    assert jobs <= 2 * BEAM_HOPS + 4, f"walk scheduled {jobs} jobs"


def test_search_batch_chunking_value_neutral(spark):
    """VERDICT r6 #3 acceptance: at |Q| >= 50 the chunked batch walk
    (fixed queries-per-walk, visited unions, one final cut) returns
    EXACTLY the unchunked result — each query's walk dataflow is
    independent, so chunk membership cannot change any visited set —
    while driver state per walk is bounded by the chunk size."""
    from gpu_accelerated_vector_indexing_spark.engine import GraphEngine
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        fixture_graph_index,
    )
    from gpu_accelerated_vector_indexing_spark.operators.ivf import fixture_qvecs

    qids = tuple(range(50))
    queries = fixture_qvecs(spark, SF_CORRECT, qids)
    idx = fixture_graph_index(spark, SF_CORRECT)

    one_walk = GraphEngine.from_pretrained(spark, idx)
    one_walk.BATCH_CHUNK = 1000  # instance override: all 50 in one walk
    chunked = GraphEngine.from_pretrained(spark, idx)
    chunked.BATCH_CHUNK = 8  # 7 walks of <= 8 queries

    a = sorted(
        (r.query_id, r.vec_id, r.score)
        for r in one_walk.search_batch(queries, k=5).collect()
    )
    b = sorted(
        (r.query_id, r.vec_id, r.score)
        for r in chunked.search_batch(queries, k=5).collect()
    )
    assert len(a) == 5 * len(qids)
    assert a == b


def test_graph_serve_after_repair_live_only_topk(spark):
    """The served result comes from the persisted REPAIRED index: k
    rows, every one live (the repaired layout contains no tombstone
    node), scores sorted the engine way. Value correctness vs the full
    build→mask→repair→walk replay is the DuckDB oracle's job
    (serve_after_repair_sql)."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        DELETE_MOD,
        graph_serve_after_repair,
    )

    rows = graph_serve_after_repair(spark, SF_CORRECT, query_id=1, k=5).collect()
    assert len(rows) == 5
    assert all(r.vec_id % DELETE_MOD != 0 for r in rows)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


# --- r7: shard-parallel build + merge ---------------------------------------


def test_merged_graph_contract_and_cross_links(spark):
    """The merged graph keeps the full-build contract (k distinct
    neighbors per node, no self loops) AND contains cross-shard edges —
    the links a bare union of shard graphs can never have (each shard
    build only ever sees its own half)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        K_GRAPH,
        fixture_merged_graph,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    g = fixture_merged_graph(spark, SF_SMOKE)
    n = load_table(spark, SF_SMOKE, "embeddings").count()
    per_node = g.groupBy("node").agg(
        F.count("*").alias("deg"), F.countDistinct("nbr").alias("dnbr")
    )
    assert per_node.count() == n  # every node of BOTH shards is covered
    assert per_node.filter((F.col("deg") != K_GRAPH) | (F.col("dnbr") != K_GRAPH)).count() == 0
    assert g.filter(F.col("node") == F.col("nbr")).count() == 0
    cross = g.filter((F.col("node") % 2) != (F.col("nbr") % 2)).count()
    assert cross > 0, "merge produced no cross-shard edges"


def test_merged_graph_beam_recall_floor(spark):
    """Serving through the merged index must stay near the full-build
    walk's quality — the merge is useful only if the touch-up rounds
    recover the cross-shard neighborhoods (measured 0.8 at both fixture
    scales; floored at 0.6 like test_beam_recall_floor)."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import knn_graph_beam_merged
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce

    hits = total = 0
    for qid in (0, 1):
        exact = {r.vec_id for r in knn_bruteforce(spark, SF_CORRECT, query_id=qid, k=5).collect()}
        got = {r.vec_id for r in knn_graph_beam_merged(spark, SF_CORRECT, query_id=qid, k=5).collect()}
        hits += len(exact & got)
        total += 5
    assert hits / total >= 0.6, f"merged recall@5 {hits}/{total}"


def test_merge_beats_bare_union(spark):
    """The cross-seeded merge must strictly add value over the bare
    union of shard graphs: a walk over the union alone cannot leave the
    entry points' shard components, so its recall is capped; the merged
    walk must find at least as many true neighbors."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        BEAM_HOPS,
        BEAM_WIDTH,
        beam_visited_over,
        build_knn_graph_over,
        fixture_normed,
        fixture_qvec,
        knn_graph_beam_merged,
    )
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    emb_n = fixture_normed(spark, SF_SMOKE)
    union = None
    for i in (0, 1):
        half = build_knn_graph_over(
            emb.filter(F.col("vec_id") % 2 == i), emb_n.filter(F.col("vec_id") % 2 == i)
        ).select("node", "nbr")
        union = half if union is None else union.union(half)
    exact = {r.vec_id for r in knn_bruteforce(spark, SF_SMOKE, query_id=0, k=5).collect()}
    bare_visited = beam_visited_over(
        union, emb, emb_n, fixture_qvec(spark, SF_SMOKE, 0), BEAM_WIDTH, BEAM_HOPS
    )
    bare = {
        r.vec_id
        for r in bare_visited.orderBy(F.desc("score"), F.desc("vec_id")).limit(5).collect()
    }
    merged = {r.vec_id for r in knn_graph_beam_merged(spark, SF_SMOKE, query_id=0, k=5).collect()}
    assert len(merged & exact) >= len(bare & exact)


def test_graph_ndcg_recall_ties_out_with_recall_sweep(spark):
    """graph_retrieval_ndcg's recall column must equal
    graph_recall_sweep's at the same beam widths (one metric kernel,
    two sweeps), and rank metrics must be bounded and consistent
    (mrr, ndcg ∈ [0,1]; perfect recall ⇒ ndcg ≤ 1 with equality only
    when the ranking is exact-ordered)."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        graph_recall_sweep,
        graph_retrieval_ndcg,
    )

    ndcg_rows = {r["beam"]: r for r in graph_retrieval_ndcg(spark, SF_SMOKE).collect()}
    recall_rows = {r["beam"]: r for r in graph_recall_sweep(spark, SF_SMOKE).collect()}
    assert set(ndcg_rows) == set(recall_rows) == {8, 24, 48}
    for b in ndcg_rows:
        assert ndcg_rows[b]["recall"] == recall_rows[b]["recall"]
        for m in ("recall", "mrr", "ndcg"):
            assert 0.0 <= ndcg_rows[b][m] <= 1.0


def test_graph_merge_serve_matches_in_session(spark):
    """Persisted-merged-index facade search ≡ the in-session merged
    walk: persistence and the facade path must both be value-neutral
    (the merge family's twin of
    test_graph_engine_batch_search_matches_in_session)."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        graph_merge_serve,
        knn_graph_beam_merged,
    )

    served = [(r.vec_id, r.score) for r in graph_merge_serve(spark, SF_SMOKE).collect()]
    walked = [(r.vec_id, r.score) for r in knn_graph_beam_merged(spark, SF_SMOKE).collect()]
    assert served == walked


def test_single_serve_walk_job_count_bounded(spark):
    """VERDICT r9 wrong #2's cheap insurance: the SERVE path (engine
    over a persisted repaired index) gets the same per-hop job pin as
    the raw walk — one entry scoring + 2 jobs per hop + the final
    top-k once the serving memo is warm; silent re-accretion of
    per-hop actions fails here instead of showing up as bench drift
    two rounds later."""
    import uuid

    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        BEAM_HOPS,
        graph_serve_after_repair,
    )

    graph_serve_after_repair(spark, SF_CORRECT).collect()  # warm serving memo
    group = f"servejobs-{uuid.uuid4()}"
    spark.sparkContext.setJobGroup(group, "single serve walk job count")
    try:
        graph_serve_after_repair(spark, SF_CORRECT).collect()
    finally:
        spark.sparkContext.setJobGroup(None, None)
    jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))
    assert jobs <= 2 * BEAM_HOPS + 4, f"serve walk scheduled {jobs} jobs"


def test_graph_cdc_refresh_lifecycle(spark):
    """Structural pins on the CDC-refreshed graph layout (the oracle
    already value-certifies the served walk): the persisted corpus is
    exactly the live snapshot, changed nodes carry their REPLACED
    (reversed) vector, no edge touches a dead node, and every
    delta-new node got attached with a full out-neighborhood."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        K_GRAPH,
        _cdc_dead,
        _cdc_in_new,
        _cdc_new_node,
        cdc_refreshed_graph_index,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    idx_dir = cdc_refreshed_graph_index(spark, SF_SMOKE)
    corpus = spark.read.parquet(f"{idx_dir}/corpus_normed")
    edges = spark.read.parquet(f"{idx_dir}/edges")
    emb = load_table(spark, SF_SMOKE, "embeddings")

    live_ids = {
        r.vec_id for r in emb.filter(_cdc_in_new(F.col("vec_id"))).select("vec_id").collect()
    }
    assert {r.vec_id for r in corpus.select("vec_id").collect()} == live_ids

    # changed nodes: persisted vector == reversed original
    changed = (
        corpus.select("vec_id", "v")
        .join(emb.select("vec_id", F.reverse("embedding").alias("rev")), "vec_id")
        .filter(_cdc_dead(F.col("vec_id")) & _cdc_in_new(F.col("vec_id")))
        .collect()
    )
    assert changed, "the changed slice must be populated"
    for r in changed:
        assert [round(float(x), 5) for x in r.v] == [round(float(x), 5) for x in r.rev]

    # no edge touches a dead node; every new node has K_GRAPH out-edges
    dead_touch = edges.filter(
        ~F.col("node").isin(list(live_ids)) | ~F.col("nbr").isin(list(live_ids))
    ).count()
    assert dead_touch == 0
    new_ids = {
        r.vec_id
        for r in emb.filter(_cdc_new_node(F.col("vec_id"))).select("vec_id").collect()
    }
    deg = {
        r.node: r.n
        for r in edges.groupBy("node").agg(F.count("*").alias("n")).collect()
    }
    assert new_ids, "the delta-new slice must be populated"
    for nid in new_ids:
        assert deg.get(nid, 0) == K_GRAPH, f"new node {nid} degree {deg.get(nid, 0)}"


def test_graph_cdc_gen2_lifecycle(spark):
    """The graph CDC loop LOOPING — structural pins on the cycle-2
    layout: corpus ≡ the v3 snapshot, a twice-changed node's persisted
    vector is negate∘reverse of its original, at least one cycle-1
    ATTACH was retired by delta 2, and every delta-2 new node got a
    full out-neighborhood."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        K_GRAPH,
        _cdc2_dead,
        _cdc2_new_node,
        _cdc_changed,
        _cdc2_changed,
        _cdc_in_v3,
        _cdc_new_node,
        cdc_refreshed_graph_index_gen2,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    idx2 = cdc_refreshed_graph_index_gen2(spark, SF_SMOKE)
    corpus = spark.read.parquet(f"{idx2}/corpus_normed")
    edges = spark.read.parquet(f"{idx2}/edges")
    emb = load_table(spark, SF_SMOKE, "embeddings")

    v3_ids = {
        r.vec_id for r in emb.filter(_cdc_in_v3(F.col("vec_id"))).select("vec_id").collect()
    }
    assert {r.vec_id for r in corpus.select("vec_id").collect()} == v3_ids

    twice = (
        corpus.select("vec_id", "v")
        .join(
            emb.select(
                "vec_id",
                F.transform(F.reverse("embedding"), lambda x: -x).alias("nr"),
            ),
            "vec_id",
        )
        .filter(_cdc_changed(F.col("vec_id")) & _cdc2_changed(F.col("vec_id")))
        .collect()
    )
    assert twice, "twice-changed slice must be populated"
    for r in twice:
        assert [round(float(x), 5) for x in r.v] == [round(float(x), 5) for x in r.nr]

    # a cycle-1 attach REMOVED by delta 2 (not changed — changed nodes
    # re-attach) is gone from the cycle-2 state entirely
    retired_attach = {
        r.vec_id
        for r in emb.filter(
            _cdc_new_node(F.col("vec_id"))
            & _cdc2_dead(F.col("vec_id"))
            & ~_cdc_in_v3(F.col("vec_id"))
        ).select("vec_id").collect()
    }
    assert retired_attach, "delta 2 must remove some cycle-1 attaches"
    assert not (retired_attach & v3_ids)
    node_set = {r.node for r in edges.select("node").distinct().collect()}
    assert not (retired_attach & node_set)

    new2 = {
        r.vec_id
        for r in emb.filter(_cdc2_new_node(F.col("vec_id"))).select("vec_id").collect()
    } & v3_ids
    deg = {r.node: r.n for r in edges.groupBy("node").agg(F.count("*").alias("n")).collect()}
    assert new2
    for nid in new2:
        assert deg.get(nid, 0) == K_GRAPH, f"delta-2 node {nid} degree {deg.get(nid, 0)}"


def test_comparison_pair_walk_matches_standalone(spark):
    """The r11 lockstep pair walk serving ann_method_comparison's two
    graph members (one adjacency lookup + one union scoring action per
    hop for BOTH walks) must return exactly the standalone queries'
    results — the heterogeneous-scorer twin of the batching-parity pins
    above."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        graph_comparison_members,
        knn_graph_beam,
        knn_graph_beam_bq,
    )

    fmember, bmember = graph_comparison_members(spark, SF_CORRECT, 0, 5)
    assert [(r.vec_id, r.score) for r in fmember.collect()] == [
        (r.vec_id, r.score)
        for r in knn_graph_beam(spark, SF_CORRECT, query_id=0, k=5).collect()
    ]
    assert [(r.vec_id, r.score) for r in bmember.collect()] == [
        (r.vec_id, r.score)
        for r in knn_graph_beam_bq(spark, SF_CORRECT, query_id=0, k=5).collect()
    ]
