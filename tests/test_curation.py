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


def test_repetition_signals_match_python_recount(spark):
    """Fold-computed top-bigram count must equal a direct Python count,
    and every fraction must live in [0, 1] with a live keep split."""
    import re
    from collections import Counter

    from gpu_accelerated_vector_indexing_spark.operators.curation import repetition_signals
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    sig = {r["doc_id"]: r for r in repetition_signals(spark, SF_CORRECT).collect()}
    docs = load_table(spark, SF_CORRECT, "documents").orderBy("doc_id").limit(25).collect()
    for d in docs:
        toks = re.findall("[A-Za-z0-9]+", d["text"].lower())
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        expect = max(Counter(bigrams).values()) if bigrams else 0
        assert sig[d["doc_id"]]["top_bigram_count"] == expect
    for r in sig.values():
        for c in ("top_bigram_frac", "dup_trigram_frac", "dup_token_frac"):
            assert 0.0 <= r[c] <= 1.0
    keeps = {r["keep"] for r in sig.values()}
    assert keeps == {True, False}, "thresholds should split the fixture corpus"


def test_repetition_signals_no_gram_shuffle(spark):
    """The sorted-array fold keeps the operator scan-shaped: the ONLY
    exchange is the fixture-split round-robin spread — no hash exchange
    (i.e. no gram explode/groupBy) anywhere in the plan."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import repetition_signals

    plan = repetition_signals(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert plan.count("Exchange") == plan.count("RoundRobinPartitioning") == 1


def test_semantic_decon_eval_excluded_and_verdict_consistent(spark):
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        DECON_EVAL_MOD,
        decontaminate_semantic,
    )

    out = decontaminate_semantic(spark, SF_SMOKE).collect()
    assert out
    for r in out:
        assert r["vec_id"] % DECON_EVAL_MOD != 0
        assert r["max_eval_sim"] <= 1.000001
        assert (r["n_eval_close"] > 0) == r["contaminated"]


def test_shard_manifest_covers_corpus_and_balances(spark):
    from gpu_accelerated_vector_indexing_spark.operators.curation import SHARD_N, shard_manifest
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    rows = shard_manifest(spark, SF_CORRECT).collect()
    n_docs_total = load_table(spark, SF_CORRECT, "documents").count()
    assert len(rows) == SHARD_N
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    assert sum(r["share"] for r in rows) == pytest.approx(1.0)
    # affine hash should balance shards: no shard more than 2x uniform
    assert max(r["n_docs"] for r in rows) <= 2 * n_docs_total / SHARD_N


def test_clean_corpus_manifest_attrition(spark):
    """Each stage must actually remove something: survivors < non-eval
    corpus; shards partition the survivor set."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        DECON_EVAL_MOD,
        SHARD_N,
        clean_corpus_manifest,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    rows = clean_corpus_manifest(spark, SF_CORRECT).collect()
    n_non_eval = (
        load_table(spark, SF_CORRECT, "documents")
        .filter(f"doc_id % {DECON_EVAL_MOD} != 0")
        .count()
    )
    survivors = sum(r["n_docs"] for r in rows)
    assert 0 < survivors < n_non_eval
    assert len(rows) <= SHARD_N
    assert sum(r["share"] for r in rows) == pytest.approx(1.0)


def test_nb_classifier_beats_majority_baseline(spark):
    """The in-plan NB classifier must (a) be internally consistent
    (pred_tgt ⇔ score > 0), (b) score every document exactly once, and
    (c) separate the target language better than always guessing the
    majority class — the minimum bar for a trained classifier."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        NB_TARGET_LANG,
        nb_language_classifier,
    )

    rows = nb_language_classifier(spark, SF_CORRECT).collect()
    n_docs = len({r.doc_id for r in rows})
    assert n_docs == len(rows), "one score row per document"
    correct = 0
    n_tgt = 0
    for r in rows:
        assert r.pred_tgt == (r.nb_score > 0)
        assert r.n_tokens >= 1
        is_tgt = r.lang == NB_TARGET_LANG
        n_tgt += is_tgt
        correct += r.pred_tgt == is_tgt
    majority = max(n_tgt, len(rows) - n_tgt) / len(rows)
    assert correct / len(rows) > majority, (
        f"accuracy {correct / len(rows):.3f} ≤ majority baseline {majority:.3f}"
    )


def test_temperature_mix_flattens_toward_uniform(spark):
    """α = 0.5 temperature: weights are a proper distribution (Σ = 1 up
    to the 1e-6 floor-scaling quantum per language), the head language
    is down-weighted vs its natural share, tail languages are
    up-weighted, and RELATIVE ordering is preserved (temperature
    flattens, never reorders). Budget allocation never exceeds the
    budget (floor division only loses remainders)."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        TEMP_BUDGET,
        temperature_mix,
    )

    rows = temperature_mix(spark, SF_CORRECT).collect()
    assert len(rows) >= 3
    assert abs(sum(r.temp_weight for r in rows) - 1.0) <= len(rows) * 1e-6
    assert sum(r.expected_docs for r in rows) <= TEMP_BUDGET
    by_share = sorted(rows, key=lambda r: r.share)
    head, tail = by_share[-1], by_share[0]
    assert head.temp_weight < head.share  # head flattened down
    assert tail.temp_weight > tail.share  # tail lifted up
    for lo, hi in zip(by_share, by_share[1:]):
        if lo.n_docs < hi.n_docs:
            assert lo.temp_weight <= hi.temp_weight  # order preserved


def test_dsir_model_and_selection_enrichment(spark):
    """DSIR bucket model invariants (t_b ≤ r_b, affinity in (0, 1e6]),
    memoized state identity, and the point of the operator: the
    selected set is ENRICHED toward the target language vs the corpus
    base rate."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        DSIR_BUCKETS,
        dsir_bucket_affinity,
        dsir_importance_sample,
    )
    from tests.conftest import SF_SMOKE

    model = dsir_bucket_affinity(spark, SF_SMOKE)
    assert model is dsir_bucket_affinity(spark, SF_SMOKE)  # memoized state
    mrows = model.collect()
    assert 0 < len(mrows) <= DSIR_BUCKETS
    for r in mrows:
        assert 0 <= r.t_b <= r.r_b
        assert 0 < r.aff_micro <= 1_000_000
    out = dsir_importance_sample(spark, SF_SMOKE).collect()
    assert out and all(
        r.affinity_micro_per_gram * r.n_grams <= r.affinity_micro_sum for r in out
    )
    base = sum(1 for r in out if r.lang == "en") / len(out)
    sel = [r for r in out if r.selected]
    assert sel, "selection kept nothing"
    en_share = sum(1 for r in sel if r.lang == "en") / len(sel)
    assert en_share > base, f"no target enrichment: {en_share} <= {base}"


def test_streaming_dsir_matches_batch(spark):
    """The drained stream scoring ≡ the batch operator row for row —
    the stream-static contract (static model sides, batch-local
    per-doc work)."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        dsir_importance_sample,
    )
    from gpu_accelerated_vector_indexing_spark.streaming.curation_stream import (
        streaming_dsir_score,
    )
    from tests.conftest import SF_SMOKE

    cols = ("doc_id", "lang", "n_grams", "affinity_micro_sum",
            "affinity_micro_per_gram", "selected")
    s = sorted(tuple(r[c] for c in cols) for r in streaming_dsir_score(spark, SF_SMOKE).collect())
    b = sorted(tuple(r[c] for c in cols) for r in dsir_importance_sample(spark, SF_SMOKE).collect())
    assert s == b


def test_curriculum_plan_partitions_corpus(spark):
    """Phases partition the corpus exactly (docs and tokens conserve),
    quality ranges are contiguous and descending (easy→hard), and no
    phase exceeds its token budget by more than one grid bucket's
    tokens (the documented resolution)."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        CURRICULUM_PHASES,
        corpus_curriculum_plan,
        quality_filter,
    )

    plan = corpus_curriculum_plan(spark, SF_SMOKE).collect()
    assert [r["phase"] for r in plan] == list(range(CURRICULUM_PHASES))
    totals = (
        quality_filter(spark, SF_SMOKE)
        .agg(F.count("*").alias("d"), F.sum("n_tokens").alias("t"))
        .collect()[0]
    )
    assert sum(r["n_docs"] for r in plan) == totals["d"]
    assert sum(r["tokens"] for r in plan) == totals["t"]
    for a, b in zip(plan, plan[1:]):
        assert a["quality_lo"] >= b["quality_hi"]  # descending, non-overlapping
    budget = -(-totals["t"] // CURRICULUM_PHASES)  # ceil-div, same as the plan's
    # every phase START respects the budget grid; sizes drift by at most
    # one bucket's tokens, so no phase (except a degenerate last) can
    # exceed budget + the largest single-bucket token mass
    assert max(r["tokens"] for r in plan) <= 2 * budget


def test_curriculum_pack_conserves_and_fills(spark):
    """The phase-aware packing manifest (r8 composition): chunks
    within a phase number contiguously from 0; every chunk except the
    phase's last carries exactly seq_len tokens; per-phase packed
    token totals equal the phase members' BPE-count totals (nothing
    lost at phase boundaries); phases are the curriculum plan's."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        _curriculum_doc_buckets,
        curriculum_bucket_phases,
        curriculum_pack_manifest,
    )
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        PACK_SEQ_LEN,
        _pack_counts_state,
    )

    rows = curriculum_pack_manifest(spark, SF_SMOKE).collect()
    by_phase: dict[int, list] = {}
    for r in rows:
        by_phase.setdefault(r["phase"], []).append(r)
    # expected per-phase BPE token masses, independently derived
    phases = curriculum_bucket_phases(spark, SF_SMOKE).select("bucket", "phase")
    want = {
        r["phase"]: r["t"]
        for r in _curriculum_doc_buckets(spark, SF_SMOKE)
        .join(phases, "bucket")
        .join(_pack_counts_state(spark, SF_SMOKE), "doc_id")
        .groupBy("phase")
        .agg(F.sum("n_toks").alias("t"))
        .collect()
    }
    assert set(by_phase) == {p for p, t in want.items() if t > 0}
    for phase, chunks in by_phase.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        assert all(c["n_tokens"] == PACK_SEQ_LEN for c in chunks[:-1])
        assert 0 < chunks[-1]["n_tokens"] <= PACK_SEQ_LEN
        assert sum(c["n_tokens"] for c in chunks) == want[phase]
        for c in chunks:
            assert 1 <= c["n_docs"] <= c["n_segments"]
            assert c["first_doc"] <= c["last_doc"]


def test_snapshot_diff_classifies_every_change_class(spark):
    """corpus_snapshot_diff (r8): statuses match an independent
    pure-Python reconstruction of the two snapshots (membership slices
    + the uppercase edit), every doc in either snapshot appears
    exactly once, and the four classes partition the diff."""
    import pyarrow.parquet as pq

    from gpu_accelerated_vector_indexing_spark.operators.curation import (
        SNAP_ADDED_MOD,
        SNAP_ADDED_REM,
        SNAP_EDIT_MOD,
        SNAP_EDIT_REM,
        SNAP_REMOVED_MOD,
        SNAP_REMOVED_REM,
        corpus_snapshot_diff,
    )

    got = {r["doc_id"]: r["status"] for r in corpus_snapshot_diff(spark, SF_SMOKE).collect()}
    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pylist()
    want = {}
    for d in docs:
        i, text = d["doc_id"], d["text"]
        in_old = i % SNAP_REMOVED_MOD != SNAP_REMOVED_REM
        in_new = i % SNAP_ADDED_MOD != SNAP_ADDED_REM
        # the ' rev2' suffix changes the md5 unconditionally, so every
        # edit-slice doc present in both snapshots is 'changed' (the old
        # upper()-only rule needed a lowercase letter to register)
        edited = i % SNAP_EDIT_MOD == SNAP_EDIT_REM
        if in_old and in_new:
            want[i] = "changed" if edited else "unchanged"
        elif in_old:
            want[i] = "removed"
        elif in_new:
            want[i] = "added"
    assert got == want
    assert set(got.values()) == {"added", "removed", "changed", "unchanged"}
