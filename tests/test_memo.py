"""memo.clear_session_caches — the explicit eviction hook for the
package's per-SparkSession memo dicts (ADVICE r8, graph.py memo
family: entries keyed on the session were never released)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_clear_session_caches_evicts_and_unpersists(spark):
    from gpu_accelerated_vector_indexing_spark.memo import (
        _memo_dicts,
        clear_session_caches,
    )
    from gpu_accelerated_vector_indexing_spark.operators import graph

    # populate one real memoized relation (cached + counted inside)
    df = graph._pagerank_edges(spark, SF_SMOKE)
    assert (spark, SF_SMOKE) in graph._PR_EDGES_CACHE
    assert df.storageLevel.useMemory

    # a sentinel entry for a DIFFERENT "session" must survive a
    # session-scoped clear and fall to a global clear
    other = object()
    graph._PR_EDGES_CACHE[(other, "x")] = "sentinel"
    try:
        n = clear_session_caches(spark)
        assert n >= 1
        assert (spark, SF_SMOKE) not in graph._PR_EDGES_CACHE
        assert (other, "x") in graph._PR_EDGES_CACHE
        assert not df.storageLevel.useMemory  # unpersisted, not just dropped
    finally:
        clear_session_caches()  # global clear releases the sentinel too
    assert not graph._PR_EDGES_CACHE

    # discovery sees the convention-named dicts in imported modules
    assert any(d is graph._PR_EDGES_CACHE for d in _memo_dicts())


def test_clear_is_idempotent_and_scoped(spark):
    from gpu_accelerated_vector_indexing_spark.memo import clear_session_caches

    clear_session_caches(spark)
    assert clear_session_caches(spark) == 0
