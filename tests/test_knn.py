from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import assert_parity

KNN_NAMES = ["knn_bruteforce", "knn_bruteforce_pandas", "knn_with_docs", "multi_query_knn"]
ROWS_ONLY = ["embed_and_search"]


@pytest.mark.parametrize("name", KNN_NAMES)
def test_knn_oracle_parity_smoke(spark, duck, name):
    assert_parity(spark, duck, name, SF_SMOKE)


@pytest.mark.parametrize("name", KNN_NAMES)
def test_knn_oracle_parity_sf001(spark, duck, name):
    assert_parity(spark, duck, name, SF_CORRECT)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    assert set(df.columns) == {"vec_id", "score", "snippet"}


def test_knn_self_match(spark):
    """The query vector's own row must be its top hit with score ~1."""
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce

    top = knn_bruteforce(spark, SF_SMOKE, query_id=7, k=1).collect()[0]
    assert top.vec_id == 7
    assert abs(top.score - 1.0) < 1e-4


def test_embed_and_search_rows(spark):
    """Rows-only check for the md5-hash embedding pipeline (no SQL twin):
    k rows, scores in [-1, 1], non-degenerate (top score > 0)."""
    from gpu_accelerated_vector_indexing_spark.queries import merged

    df = merged()[0]["embed_and_search"](spark, SF_CORRECT)
    rows = df.collect()
    assert len(rows) == 5
    assert all(-1.0 <= r.score <= 1.0 for r in rows)
    assert rows[0].score > 0
