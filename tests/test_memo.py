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
    # session-scoped clear (a global clear_session_caches() would also
    # remove it, but running one mid-suite would trash every OTHER
    # test's shared fixture state — pop it directly instead)
    other = object()
    graph._PR_EDGES_CACHE[(other, "x")] = "sentinel"
    try:
        n = clear_session_caches(spark)
        assert n >= 1
        assert (spark, SF_SMOKE) not in graph._PR_EDGES_CACHE
        assert (other, "x") in graph._PR_EDGES_CACHE
        assert not df.storageLevel.useMemory  # unpersisted, not just dropped
    finally:
        graph._PR_EDGES_CACHE.pop((other, "x"), None)

    # discovery sees the convention-named dicts in imported modules
    assert any(d is graph._PR_EDGES_CACHE for d in _memo_dicts())


def test_clear_reclaims_persisted_state_dirs(spark):
    """A _*DIR memo entry is the only handle to its mkdtemp layout —
    eviction must delete the directory, not just drop the path (the
    disk leak /code-review r9 flagged), and must leave foreign paths
    alone."""
    import os
    import tempfile

    from gpu_accelerated_vector_indexing_spark.memo import (
        _TEMP_DIR_PREFIX,
        clear_session_caches,
    )
    from gpu_accelerated_vector_indexing_spark.operators import graph_ann

    ours = tempfile.mkdtemp(prefix=_TEMP_DIR_PREFIX + "memotest_")
    foreign = tempfile.mkdtemp(prefix="unrelated_memotest_")
    fake = object()
    graph_ann._GRAPH_INDEX_DIR[(fake, "ours")] = ours
    graph_ann._GRAPH_INDEX_DIR[(fake, "foreign")] = foreign
    try:
        clear_session_caches(fake)
        assert not os.path.exists(ours)
        assert os.path.exists(foreign)  # not package-prefixed: untouched
    finally:
        graph_ann._GRAPH_INDEX_DIR.pop((fake, "ours"), None)
        graph_ann._GRAPH_INDEX_DIR.pop((fake, "foreign"), None)
        import shutil

        shutil.rmtree(foreign, ignore_errors=True)


def test_clear_is_idempotent_and_scoped(spark):
    from gpu_accelerated_vector_indexing_spark.memo import clear_session_caches

    clear_session_caches(spark)
    assert clear_session_caches(spark) == 0
