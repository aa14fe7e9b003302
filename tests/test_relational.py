from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import assert_parity


def _names():
    from gpu_accelerated_vector_indexing_spark.queries import relational_q

    return sorted(relational_q.QUERIES)


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
