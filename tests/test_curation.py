"""Corpus-curation family: oracle parity + behavioral invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import assert_parity


def _names():
    from gpu_accelerated_vector_indexing_spark.queries import curation_q

    return sorted(n for n in curation_q.QUERIES if n in curation_q.ORACLES)


@pytest.mark.parametrize("name", _names())
def test_curation_parity_smoke(spark, duck, name):
    assert_parity(spark, duck, name, SF_SMOKE)


@pytest.mark.parametrize("name", _names())
def test_curation_parity_sf001(spark, duck, name):
    assert_parity(spark, duck, name, SF_CORRECT)


def test_decontaminate_hashed_equals_string_keyed(spark):
    """The xxhash64 scale path returns exactly the string-keyed results."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        decontaminate_hashed,
        decontaminate_ngram_overlap,
    )

    cols = ["doc_id", "shared_ngrams", "eval_docs_hit", "contaminated"]
    a = sorted(map(tuple, decontaminate_ngram_overlap(spark, SF_CORRECT).select(cols).collect()))
    b = sorted(map(tuple, decontaminate_hashed(spark, SF_CORRECT).select(cols).collect()))
    assert a == b and len(a) > 0


def test_pii_redact_actually_redacts(spark):
    from gpu_accelerated_vector_indexing_spark.operators.curation import pii_redact

    out = pii_redact(spark, SF_SMOKE)
    row = out.orderBy("doc_id").first()
    assert row["n_emails"] >= 1 and row["n_phones"] >= 1
    assert "<EMAIL>" in row["redacted_head"] and "@example.com" not in row["redacted_head"]


def test_decontaminate_excludes_eval_slice(spark):
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        DECON_EVAL_MOD,
        decontaminate_ngram_overlap,
    )

    out = decontaminate_ngram_overlap(spark, SF_SMOKE)
    assert out.filter(F.col("doc_id") % DECON_EVAL_MOD == 0).count() == 0


def test_mix_rebalance_weights_bounded(spark):
    from gpu_accelerated_vector_indexing_spark.operators.curation import corpus_mix_rebalance

    rows = corpus_mix_rebalance(spark, SF_SMOKE).collect()
    assert rows, "expected at least one source"
    for r in rows:
        assert 0.0 < r["weight"] <= 1.0
        assert r["expected_docs"] <= r["n_docs"]


def test_quality_filter_no_shuffle(spark):
    """The rule filter must stay a pure scan-side projection (no Exchange)."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import quality_filter

    plan = quality_filter(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
