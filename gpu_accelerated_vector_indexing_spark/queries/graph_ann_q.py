"""Graph-ANN query family: NN-descent build digest + beam search.

Both carry FULL value oracles — queries/_graph_ann_oracle.py replays
the cluster-seeded NN-descent build and the bounded-hop beam search as
staged CTEs, so every edge of the built graph and every visited-set cut
of the search is value-checked against DuckDB.
"""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators import graph_ann
from gpu_accelerated_vector_indexing_spark.operators.ivf import DELETE_MOD
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (
    beam_bq_sql,
    beam_search_sql,
    build_digest_sql,
    insert_digest_sql,
    recall_beam_sweep_sql,
    recall_sql,
    search_with_docs_sql,
    state_roundtrip_sql,
)

QUERY_ID = 0
K = 5
RECALL_IDS = (0, 3)


def _build_digest(spark, sf_dir):
    return graph_ann.graph_build_digest(spark, sf_dir)


def _beam(spark, sf_dir):
    return graph_ann.knn_graph_beam(spark, sf_dir, query_id=QUERY_ID, k=K)


def _beam_bq(spark, sf_dir):
    return graph_ann.knn_graph_beam_bq(spark, sf_dir, query_id=QUERY_ID, k=K)


def _beam_filtered(spark, sf_dir):
    return graph_ann.knn_graph_beam_filtered(spark, sf_dir, query_id=QUERY_ID, k=K)


def _beam_with_deletes(spark, sf_dir):
    # query_id=1 and vec_id % DELETE_MOD == 0 tombstones — the
    # ivf.knn_with_deletes convention
    return graph_ann.knn_graph_beam_with_deletes(spark, sf_dir, query_id=1, k=K)


def _state_roundtrip(spark, sf_dir):
    return graph_ann.graph_state_roundtrip(spark, sf_dir)


def _search_with_docs(spark, sf_dir):
    return graph_ann.knn_graph_search_with_docs(spark, sf_dir, query_id=QUERY_ID, k=K)


def _recall_sweep(spark, sf_dir):
    return graph_ann.graph_recall_sweep(spark, sf_dir, query_id=QUERY_ID, k=K)


def _insert(spark, sf_dir):
    return graph_ann.graph_ann_insert(spark, sf_dir)


def _recall(spark, sf_dir):
    return graph_ann.graph_ann_recall(spark, sf_dir, query_ids=RECALL_IDS, k=K)


QUERIES = {
    "graph_ann_build": _build_digest,
    "knn_graph_beam": _beam,
    "knn_graph_beam_bq": _beam_bq,
    "knn_graph_beam_filtered": _beam_filtered,
    "knn_graph_beam_with_deletes": _beam_with_deletes,
    "graph_state_roundtrip": _state_roundtrip,
    "graph_search_with_docs": _search_with_docs,
    "graph_recall_sweep": _recall_sweep,
    "graph_ann_recall": _recall,
    "graph_ann_insert": _insert,
}

ORACLES = {
    "graph_ann_build": build_digest_sql(),
    "knn_graph_beam": beam_search_sql(query_id=QUERY_ID, k=K),
    "knn_graph_beam_bq": beam_bq_sql(query_id=QUERY_ID, k=K),
    "knn_graph_beam_filtered": beam_search_sql(query_id=QUERY_ID, k=K, lang="en"),
    "knn_graph_beam_with_deletes": beam_search_sql(
        query_id=1, k=K, delete_mod=DELETE_MOD
    ),
    "graph_state_roundtrip": state_roundtrip_sql(),
    "graph_search_with_docs": search_with_docs_sql(query_id=QUERY_ID, k=K),
    "graph_recall_sweep": recall_beam_sweep_sql(query_id=QUERY_ID, k=K),
    "graph_ann_recall": recall_sql(RECALL_IDS, k=K),
    "graph_ann_insert": insert_digest_sql(),
}


# batch retrieval through the graph index (multi-query matrix complete:
# brute / IVF / prenorm / graph all have a multi-query row)
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    multi_beam_sql,
)

MULTI_IDS = (0, 3, 7)


def _multi_beam(spark, sf_dir):
    return graph_ann.multi_query_graph_beam(spark, sf_dir, query_ids=MULTI_IDS, k=K)


QUERIES["multi_query_graph_beam"] = _multi_beam
ORACLES["multi_query_graph_beam"] = multi_beam_sql(MULTI_IDS, k=K)


# --- r6: neighborhood repair after delete-compaction --------------------------
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    relink_digest_sql,
)


def _relink(spark, sf_dir):
    return graph_ann.graph_relink_after_deletes(spark, sf_dir)


QUERIES["graph_relink_after_deletes"] = _relink
ORACLES["graph_relink_after_deletes"] = relink_digest_sql()


# --- r6: batched retrieval through the persisted-index facade ------------------
def _engine_batch(spark, sf_dir):
    return graph_ann.graph_engine_batch_search(spark, sf_dir, query_ids=MULTI_IDS, k=K)


QUERIES["graph_engine_batch_search"] = _engine_batch
# same full oracle as the in-session per-query walks: persistence AND
# batching must both be value-neutral
ORACLES["graph_engine_batch_search"] = multi_beam_sql(MULTI_IDS, k=K)


# --- r6: graph-index health observability --------------------------------------
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    index_stats_sql,
)


def _index_stats(spark, sf_dir):
    return graph_ann.graph_index_stats(spark, sf_dir)


QUERIES["graph_index_stats"] = _index_stats
ORACLES["graph_index_stats"] = index_stats_sql()


# --- r7: repair → persist → serve (the delete story closed end to end) --------
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    serve_after_repair_sql,
)


def _serve_after_repair(spark, sf_dir):
    return graph_ann.graph_serve_after_repair(spark, sf_dir, query_id=1, k=K)


QUERIES["graph_serve_after_repair"] = _serve_after_repair
ORACLES["graph_serve_after_repair"] = serve_after_repair_sql(query_id=1, k=K)


# --- r7: before/after-repair recall (the delete story's observability row) -----
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    repair_recall_sql,
)


def _repair_recall(spark, sf_dir):
    # query 10: a query whose masked walk demonstrably LOSES a true
    # neighbor to severed bridge edges and whose repaired walk gets it
    # back (4/5 -> 5/5 at sf0.01) — the row shows what repair buys
    return graph_ann.graph_repair_recall(spark, sf_dir, query_id=10, k=K)


QUERIES["graph_repair_recall"] = _repair_recall
ORACLES["graph_repair_recall"] = repair_recall_sql(query_id=10, k=K)


# --- r7: shard-parallel graph build + merge --------------------------------


def _beam_merged(spark, sf_dir):
    """Beam search served through the graph MERGED from two half-corpus
    builds (graph_ann.merge_graph_shards) — the build-shards → merge →
    serve lifecycle under one full value oracle."""
    return graph_ann.knn_graph_beam_merged(spark, sf_dir, query_id=QUERY_ID, k=K)


QUERIES["graph_shard_merge_search"] = _beam_merged
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    merged_beam_sql,
)

ORACLES["graph_shard_merge_search"] = merged_beam_sql(query_id=QUERY_ID, k=K)


def _graph_ndcg(spark, sf_dir):
    """Rank-quality sweep over beam widths — the graph twin of
    retrieval_ndcg (shared ranking_metric_rows kernel)."""
    return graph_ann.graph_retrieval_ndcg(spark, sf_dir, query_id=QUERY_ID, k=K)


QUERIES["graph_retrieval_ndcg"] = _graph_ndcg
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    ndcg_beam_sweep_sql,
)

ORACLES["graph_retrieval_ndcg"] = ndcg_beam_sweep_sql(query_id=QUERY_ID, k=K)


def _merge_serve(spark, sf_dir):
    """Persisted merged index served through the GraphEngine facade —
    shares the merged-walk oracle (persistence is value-neutral)."""
    return graph_ann.graph_merge_serve(spark, sf_dir, query_id=QUERY_ID, k=K)


QUERIES["graph_merge_serve"] = _merge_serve
ORACLES["graph_merge_serve"] = ORACLES["graph_shard_merge_search"]


# --- r10: CDC refresh for the graph index (the IVF lifecycle's symmetry) ------
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    graph_refresh_cdc_sql,
)


def _graph_refresh_cdc(spark, sf_dir):
    """One snapshot delta drives delete-repair AND attach in a single
    maintenance pass over the OLD-snapshot graph, served through the
    persisted GraphEngine layout — the oracle replays build → mask →
    repair → attach → walk, so the whole pass is value-certified."""
    return graph_ann.graph_refresh_cdc(
        spark, sf_dir, query_id=graph_ann.GRAPH_CDC_QUERY_ID, k=K
    )


QUERIES["graph_refresh_cdc"] = _graph_refresh_cdc
ORACLES["graph_refresh_cdc"] = graph_refresh_cdc_sql(
    query_id=graph_ann.GRAPH_CDC_QUERY_ID, k=K
)


# --- r10: the graph CDC loop LOOPING (second delta over the cycle-1 index) ----
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    graph_refresh_cdc_gen2_sql,
)


def _graph_refresh_cdc_gen2(spark, sf_dir):
    """The SECOND snapshot delta applied to the PERSISTED cycle-1 graph
    index (read from disk, exactly what a fresh nightly job sees):
    delta-2 mask (incl. cycle-1 attaches), damage-bounded repair,
    batch-bounded attach over the v3 corpus, serve. The oracle replays
    both cycles stage for stage."""
    return graph_ann.graph_refresh_cdc_gen2(
        spark, sf_dir, query_id=graph_ann.GRAPH_CDC_QUERY_ID, k=K
    )


QUERIES["graph_refresh_cdc_gen2"] = _graph_refresh_cdc_gen2
ORACLES["graph_refresh_cdc_gen2"] = graph_refresh_cdc_gen2_sql(
    query_id=graph_ann.GRAPH_CDC_QUERY_ID, k=K
)
