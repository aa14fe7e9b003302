from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import assert_parity


def _names():
    from gpu_accelerated_vector_indexing_spark.queries import dedup_q

    return sorted(dedup_q.QUERIES)


@pytest.mark.parametrize("name", _names())
def test_dedup_parity_smoke(spark, duck, name):
    assert_parity(spark, duck, name, SF_SMOKE)


@pytest.mark.parametrize("name", _names())
def test_dedup_parity_sf001(spark, duck, name):
    assert_parity(spark, duck, name, SF_CORRECT)


def test_minhash_finds_neardups(spark):
    """The fixture corpus contains engineered near-dup pairs; banded
    MinHash must surface at least one of them."""
    from gpu_accelerated_vector_indexing_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    lsh = minhash_lsh_pairs(spark, SF_CORRECT).collect()
    exact = ngram_jaccard_pairs(spark, SF_CORRECT).collect()
    assert len(exact) > 0, "expected engineered near-dup pairs in fixture"
    exact_pairs = {(r.doc_a, r.doc_b) for r in exact}
    lsh_pairs = {(r.doc_a, r.doc_b) for r in lsh}
    assert lsh_pairs & exact_pairs, "LSH should recover some exact near-dup pairs"


def test_simhash_low_distance_on_neardups(spark):
    from gpu_accelerated_vector_indexing_spark.operators.dedup import simhash_pairs

    rows = simhash_pairs(spark, SF_CORRECT, max_hamming=3).collect()
    for r in rows:
        assert 0 <= r.hamming <= 3


def test_components_partition_edges(spark):
    """Every near-dup edge joins two docs of the SAME component, the
    component id is the minimum member id, and members of one component
    are mutually reachable (transitivity of the closure)."""
    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        duplicate_components,
        ngram_jaccard_pairs,
    )
    from tests.conftest import SF_CORRECT

    comp = {
        r.doc_id: r.component
        for r in duplicate_components(spark, SF_CORRECT).collect()
    }
    pairs = ngram_jaccard_pairs(spark, SF_CORRECT).collect()
    assert pairs, "fixture should contain near-dup pairs"
    for p in pairs:
        assert comp[p.doc_a] == comp[p.doc_b], (p.doc_a, p.doc_b)
    # component id = min member id
    by_comp = {}
    for d, c in comp.items():
        by_comp.setdefault(c, []).append(d)
    for c, members in by_comp.items():
        assert c == min(members)


def test_positional_hash_equals_string_hash(spark):
    """The hot path hashes shingles straight from character positions;
    it must stay bit-identical to the definitional string route
    (char_shingles + shingle_hash)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        SHINGLE_LEN,
        _doc_shingle_hashes,
        char_shingles,
        load_table,
        shingle_hash,
    )

    docs = load_table(spark, SF_CORRECT, "documents").limit(200)
    fast = _doc_shingle_hashes(docs)
    slow = (
        docs.filter(F.length("text") >= SHINGLE_LEN)
        .select("doc_id", F.explode(char_shingles(F.col("text"))).alias("sh"))
        .select("doc_id", shingle_hash(F.col("sh")).alias("h"))
    )
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_incremental_dedup_contract(spark):
    """Batch spine complete; every match is an archive doc; the verdict
    agrees with the threshold; at least one live duplicate exists."""
    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        INCR_BATCH_MOD,
        INCR_BATCH_REM,
        INCR_THRESHOLD,
        incremental_dedup,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    rows = incremental_dedup(spark, SF_CORRECT).collect()
    n_batch = (
        load_table(spark, SF_CORRECT, "documents")
        .filter(f"doc_id % {INCR_BATCH_MOD} = {INCR_BATCH_REM}")
        .count()
    )
    assert len(rows) == n_batch
    assert any(r["is_duplicate"] for r in rows)
    for r in rows:
        assert r["new_doc_id"] % INCR_BATCH_MOD == INCR_BATCH_REM
        if r["best_match_doc_id"] is not None:
            assert r["best_match_doc_id"] % INCR_BATCH_MOD != INCR_BATCH_REM
        else:
            assert r["best_jaccard"] == 0.0
        assert r["is_duplicate"] == (r["best_jaccard"] >= INCR_THRESHOLD)


def test_substring_spans_detects_exact_dups(spark):
    """Fully-contained fixture docs must show dup_ratio 1.0; every row
    is internally consistent (dup windows never exceed totals); one
    fully-covered doc is brute-force re-verified window by window."""
    from gpu_accelerated_vector_indexing_spark.operators.dedup import substring_spans

    rows = substring_spans(spark, SF_CORRECT).collect()
    assert rows, "fixture has engineered duplicates; expected span hits"
    by_doc = {r.doc_id: r for r in rows}
    full = [r for r in rows if r.dup_ratio == 1.0]
    assert full, "exact duplicate docs must be fully covered by dup spans"
    for r in rows:
        assert 1 <= r.n_dup_windows <= r.n_windows

    # brute-force recheck one fully-covered doc (the containment case
    # doc-level hashing misses): every one of its 8-token windows must
    # occur verbatim in at least one OTHER document
    import re

    from gpu_accelerated_vector_indexing_spark.operators.dedup import SPAN_K
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    texts = {
        r.doc_id: re.findall("[A-Za-z0-9]+", r.text.lower())
        for r in load_table(spark, SF_CORRECT, "documents").collect()
    }
    probe = full[0].doc_id
    toks = texts[probe]
    other = {
        d: " ".join(t) for d, t in texts.items() if d != probe
    }
    for i in range(len(toks) - SPAN_K + 1):
        win = " ".join(toks[i : i + SPAN_K])
        assert any(win in t for t in other.values()), f"window {i} of doc {probe} not found elsewhere"


def test_substring_spans_hashed_equals_string_form_at_stride_1(spark):
    """The xxhash64 scale twin changes only the shuffle key: at
    stride 1 every per-doc count must equal the string-keyed form
    (collision odds ≈ |windows|²/2⁶⁴ — a mismatch means a logic bug,
    not bad luck). The registered stride-2 form must also be a
    consistent subsample: per-doc window totals ~halve and every
    doc flagged at stride 2 is flagged at stride 1."""
    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        substring_spans,
        substring_spans_hashed,
    )

    string_form = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ratio)
        for r in substring_spans(spark, SF_CORRECT).collect()
    }
    hashed_s1 = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ratio)
        for r in substring_spans_hashed(spark, SF_CORRECT, stride=1).collect()
    }
    assert hashed_s1 == string_form

    s2 = {r.doc_id: r for r in substring_spans_hashed(spark, SF_CORRECT).collect()}
    assert s2, "stride-2 subsample must still catch the engineered dups"
    for doc_id, r in s2.items():
        assert doc_id in string_form  # flagged at stride 2 ⇒ flagged at stride 1
        # DISTINCT windows over a sampled start grid: bounded by the
        # stride-1 distinct count (an exact ceil(n/2) identity would
        # only hold for docs with no internally repeated window)
        assert 1 <= r.n_dup_windows <= r.n_windows <= string_form[doc_id][0]


def test_corpus_overlap_estimates_track_exact_jaccard(spark):
    """Source-level MinHash overlap: every ELIGIBLE source pair (a
    source needs ≥1 document of shingle length — shorter ones have no
    shingle set on either engine) appears exactly once, the estimate is
    n_match/N_MINHASH in [0,1], a zero intersection forces a zero exact
    Jaccard (the converse can fail by floor quantization on huge
    unions), and the k=16 estimator stays within ~3σ (σ ≈ 0.125) of
    the exact value."""
    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        N_MINHASH,
        SHINGLE_LEN,
        corpus_source_overlap,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    rows = corpus_source_overlap(spark, SF_CORRECT).collect()
    n_src = (
        load_table(spark, SF_CORRECT, "documents")
        .filter(F.length("text") >= SHINGLE_LEN)
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r.est_jaccard == r.n_match / float(N_MINHASH)
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.jac_exact <= 1.0
        if r.n_inter == 0:
            assert r.jac_exact == 0.0
        assert abs(r.est_jaccard - r.jac_exact) <= 0.375, (r.src_a, r.src_b)


def test_leakage_safe_split_invariants(spark):
    """The leakage guard itself: every near-dup pair shares a split;
    fractions roughly match the 80/10/10 buckets; group keys of
    component members equal the component representative."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        ngram_jaccard_pairs,
        train_split_leakage_safe,
    )

    split = train_split_leakage_safe(spark, SF_CORRECT).cache()
    pairs = ngram_jaccard_pairs(spark, SF_CORRECT).select("doc_a", "doc_b")
    a = split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    straddling = pairs.join(a, "doc_a").join(b, "doc_b").filter("sa <> sb").count()
    assert straddling == 0
    fracs = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(fracs.values())
    assert 0.7 < fracs.get("train", 0) / total < 0.9
    split.unpersist()


def test_semantic_graph_components_fixpoint_and_consistent(spark):
    """Fixpoint propagation: every component label must be a member of
    its own component and be the min id reachable — i.e. the labels
    are true connected components, not a round-budget artifact."""
    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        semantic_graph_components,
    )
    from tests.conftest import SF_SMOKE

    labels = semantic_graph_components(spark, SF_SMOKE)
    rows = {r.vec_id: r.component for r in labels.collect()}
    assert rows  # non-trivial at the fixture threshold
    for vec_id, comp in rows.items():
        assert comp in rows and rows[comp] == comp  # root labels itself
        assert comp <= vec_id  # min-label invariant


def test_min_label_fixpoint_deep_chain_and_guard(spark):
    """A chain deeper than any fixed small round count converges under
    the fixpoint loop (one component, min id 0), and the max_rounds
    guard raises LOUDLY instead of returning split components."""
    import pytest
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        min_label_fixpoint,
    )

    depth = 20  # 0-1-2-...-20: diameter 20, > the old fixed 6 rounds
    chain = spark.range(depth).select(
        F.col("id").alias("node"), (F.col("id") + 1).alias("nbr")
    )
    und = chain.union(chain.select(F.col("nbr").alias("node"), F.col("node").alias("nbr")))
    labels = min_label_fixpoint(und, max_rounds=50)
    comps = {r.node: r.component for r in labels.collect()}
    assert len(comps) == depth + 1
    assert set(comps.values()) == {0}  # one component, min-id root
    with pytest.raises(RuntimeError, match="not converged"):
        min_label_fixpoint(und, max_rounds=3)


def test_containment_catches_pairs_jaccard_misses(spark):
    """Containment invariants (τ ≤ c ≤ 1, oriented ids, shared bounded
    by the smaller set) AND the measure's reason to exist: the fixture
    has pairs whose smaller shingle set sits inside a much larger doc —
    high containment, low Jaccard (the big union drowns the overlap) —
    so the containment relation must strictly extend the Jaccard@0.6
    pair set (measured 22 containment-only pairs of 30 at sf0.001)."""
    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        CONTAIN_TAU,
        containment_pairs,
        ngram_jaccard_pairs,
    )
    from tests.conftest import SF_SMOKE

    rows = containment_pairs(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert CONTAIN_TAU <= r.containment <= 1.0
        assert r.shared >= 1
    c = {(r.doc_a, r.doc_b) for r in rows}
    j = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()}
    assert c - j, "no containment-only pairs — the asymmetric measure adds nothing"
