from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import assert_parity


def _names():
    from gpu_accelerated_vector_indexing_spark.queries import udx_q

    return sorted(udx_q.QUERIES)


@pytest.mark.parametrize("name", _names())
def test_udx_parity_smoke(spark, duck, name):
    assert_parity(spark, duck, name, SF_SMOKE)


@pytest.mark.parametrize("name", _names())
def test_udx_parity_sf001(spark, duck, name):
    assert_parity(spark, duck, name, SF_CORRECT)


def test_udtf_is_lateral_generator(spark):
    """The UDTF plan is a per-partition generator — no shuffle, no join:
    one-to-many expansion stays embarrassingly parallel at 100 TB."""
    from gpu_accelerated_vector_indexing_spark.operators.udx import udtf_sentences

    plan = udtf_sentences(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
