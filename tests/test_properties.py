"""Property-based checks (hypothesis) — the generalization of the
reference's random-input kernel consistency check (check_cos_sim.cpp:18-79,
which draws a random 10000×512 batch and compares GPU vs CPU at 1e-5).

Here the property is engine-vs-NumPy: for ANY float corpus and query,
the engine's cosine expression and top-k ordering must match a NumPy
recomputation. One Spark job per example; examples are kept small and
few because each is a full plan execution.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gpu_accelerated_vector_indexing_spark.functions.vector import (
    EPSILON,
    cosine_similarity,
)

DIM = 8
K = 3

finite_floats = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False, width=32
)
vectors = st.lists(finite_floats, min_size=DIM, max_size=DIM)


def _np_cosine(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    dots = mat @ q
    denom = np.linalg.norm(mat, axis=1) * np.linalg.norm(q) + EPSILON
    return dots / denom


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(vectors, min_size=K, max_size=12), vectors)
def test_cosine_and_topk_match_numpy(spark, rows, qvec):
    """Scores agree with NumPy to 1e-5 (the reference's own tolerance)
    and the top-k id ordering under (score DESC, id DESC) is identical."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    q = F.array(*[F.lit(float(x)) for x in qvec])
    got = {
        r.vec_id: r.score
        for r in df.select(
            "vec_id", cosine_similarity(F.col("embedding"), q).alias("score")
        ).collect()
    }
    mat = np.array(rows, dtype=np.float64)
    exp = _np_cosine(mat, np.array(qvec, dtype=np.float64))
    for i, e in enumerate(exp):
        assert math.isfinite(got[i])
        assert abs(got[i] - e) < 1e-5, (i, got[i], e)

    topk = [
        r.vec_id
        for r in df.select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), q), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc("vec_id"))
        .limit(K)
        .collect()
    ]
    order = sorted(
        range(len(rows)), key=lambda i: (round(exp[i], 6), i), reverse=True
    )[:K]
    assert topk == order, (topk, order)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(vectors, min_size=2, max_size=10))
def test_sq8_roundtrip_error_bound(spark, rows):
    """For ANY corpus: codes ∈ [0,255] and per-dimension reconstruction
    error ≤ half a quantization step of that dimension's span."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.quantize import (
        SQ_LEVELS,
        SPAN_GUARD,
        sq8_codes,
        sq8_dequantize,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    mat = np.array(rows, dtype=np.float64)
    mins, maxs = mat.min(axis=0).tolist(), mat.max(axis=0).tolist()
    codes = sq8_codes(F.col("embedding"), mins, maxs)
    err = F.zip_with(
        sq8_dequantize(codes, mins, maxs), F.col("embedding"), lambda a, b: F.abs(a - b)
    )
    row = df.select(
        F.min(F.array_min(codes)).alias("cmin"),
        F.max(F.array_max(codes)).alias("cmax"),
        F.max(F.array_max(err)).alias("emax"),
    ).first()
    assert row.cmin >= 0 and row.cmax <= SQ_LEVELS
    half_step = (max(hi - lo for lo, hi in zip(mins, maxs)) + SPAN_GUARD) / SQ_LEVELS / 2
    assert row.emax <= half_step + 1e-9


texts = st.text(
    alphabet=st.characters(codec="ascii", exclude_categories=("Cc", "Cs")),
    min_size=0,
    max_size=700,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=4))
def test_chunking_reconstructs_documents(spark, docs):
    """For ANY ascii corpus: stitching each document's chunks back
    together (dropping every chunk's 50-char overlap with its
    predecessor) reproduces the document exactly, and chunk widths obey
    the 200-char cap with only the final chunk short."""
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        CHUNK_STRIDE,
        CHUNK_WIDTH,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id LONG, text STRING"
    )
    chunks = (
        df.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_STRIDE))
            ).alias("pos"),
            "text",
        )
        .select(
            "doc_id",
            ((F.col("pos") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            F.expr(f"substring(text, pos, {CHUNK_WIDTH})").alias("chunk"),
        )
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    for i, text in enumerate(docs):
        parts = [c for _, c in sorted(by_doc[i])]
        stitched = parts[0] + "".join(p[CHUNK_WIDTH - CHUNK_STRIDE:] for p in parts[1:])
        assert stitched == text, (i, text, parts)
        assert all(len(p) <= CHUNK_WIDTH for p in parts)
        assert all(len(p) == CHUNK_WIDTH for p in parts[:-1] if len(text) >= CHUNK_WIDTH)


word = st.text(alphabet="ab1", min_size=1, max_size=3)
texts_rep = st.lists(word, min_size=0, max_size=40).map(" ".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(texts_rep, min_size=1, max_size=6))
def test_repetition_fold_matches_python_model(spark, docs):
    """The sorted-array run-length fold must equal a direct Python
    Counter on arbitrary token streams (tiny alphabet maximizes
    repeated bigrams — the regime the fold exists for)."""
    import re
    from collections import Counter

    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    toks = tokens(F.col("text"))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    run0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best"))

    def step(acc, x):
        bump = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), bump.alias("run"), F.greatest(acc["best"], bump).alias("best"))

    top = F.aggregate(F.array_sort(bigrams), run0, step, lambda acc: acc["best"])
    got = {r["doc_id"]: r["top"] for r in df.select("doc_id", top.alias("top")).collect()}
    for i, t in enumerate(docs):
        ts = re.findall("[A-Za-z0-9]+", t.lower())
        bg = [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        assert got[i] == (max(Counter(bg).values()) if bg else 0)


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=1, max_size=2048))
def test_wav_bmp_codecs_roundtrip_any_bytes(payload):
    """For ANY byte payload the real codecs must round-trip exactly and
    emit header fields consistent with the payload length — the codec
    analog of the reference's random-input kernel consistency check
    (pure Python, no Spark job per example, so examples are cheap)."""
    from gpu_accelerated_vector_indexing_spark.operators.multimodal import (
        BMP_WIDTH,
        WAV_SAMPLE_RATE,
        _decode_bmp8,
        _decode_wav_pcm,
        _encode_bmp8,
        _encode_wav_pcm,
    )

    wav = _decode_wav_pcm(_encode_wav_pcm(payload))
    assert wav["samples"] == payload
    assert wav["sample_rate"] == WAV_SAMPLE_RATE
    assert len(_encode_wav_pcm(payload)) % 2 == 0  # RIFF word alignment

    bmp = _decode_bmp8(_encode_bmp8(payload))
    h = max(1, -(-len(payload) // BMP_WIDTH))
    assert bmp["pixels"][: len(payload)] == payload
    assert (bmp["width"], bmp["height"]) == (BMP_WIDTH, h)
    assert bmp["file_size"] == 14 + 40 + 1024 + h * BMP_WIDTH
    # padding beyond the payload is zeros (deterministic container)
    assert set(bmp["pixels"][len(payload):]) <= {0}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_min_label_fixpoint_matches_union_find(spark, edges):
    """The shared iterative kernel (semantic + n-gram dedup components)
    must compute EXACT connected components on arbitrary graphs — cross-
    checked against a plain Python union-find with min-id roots."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        min_label_fixpoint,
    )

    # ground truth: union-find, component label = min member id
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {x: find(x) for x in parent}

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "node bigint, nbr bigint"
    )
    und = df.union(df.select(F.col("nbr").alias("node"), F.col("node").alias("nbr"))).distinct()
    got = {r.node: r.component for r in min_label_fixpoint(und, max_rounds=40).collect()}
    assert got == truth


def test_min_label_fixpoint_frees_superseded_snapshots(spark):
    """Cache-hygiene contract (ADVICE r6 / review r7): the kernel frees
    each superseded round's checkpoint blocks, so the persistent-RDD
    registry grows by AT MOST ONE entry per call (the returned labels'
    own snapshot) — a silent no-op in the callSite-filtered id diff
    would leak one snapshot per round and show up here immediately."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        min_label_fixpoint,
    )

    # a 12-node path graph: diameter 11 forces >= 12 rounds, so a leak
    # would register ~12 extra snapshots, far above the allowance
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "node bigint, nbr bigint"
    )
    und = df.union(
        df.select(F.col("nbr").alias("node"), F.col("node").alias("nbr"))
    ).distinct()
    before = len(dict(spark._jsc.getPersistentRDDs()))
    labels = min_label_fixpoint(und, max_rounds=20)
    assert labels.count() == 13
    after = len(dict(spark._jsc.getPersistentRDDs()))
    assert after - before <= 1, f"registry grew {before} -> {after}: snapshots leaked"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(min_value=0, max_value=600), min_size=1, max_size=5, unique=True
    )
)
def test_ranking_metrics_match_python_model(spark, ids):
    """ranking_metric_rows (the shared NDCG/MRR/recall kernel) against
    an independent pure-Python model, over ARBITRARY injected rankings
    (the search_fn parameter exists exactly so the metric math is
    testable apart from any index): binary relevance vs the fixture's
    exact top-5, ranks = injected order."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from gpu_accelerated_vector_indexing_spark.operators.ivf import (
        NDCG_ROUND,
        ideal_dcg,
        ranking_metric_rows,
    )
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_bruteforce
    from tests.conftest import SF_SMOKE

    exact = {
        int(r.vec_id)
        for r in knn_bruteforce(spark, SF_SMOKE, query_id=0, k=5).collect()
    }
    ranking = spark.createDataFrame(
        [(int(v), float(1.0 - i * 0.01)) for i, v in enumerate(ids)],
        "vec_id bigint, score double",
    )
    row = ranking_metric_rows(
        spark, SF_SMOKE, "knob", [1], lambda _: ranking, query_id=0, k=5
    ).collect()[0]

    def r6(v: float) -> float:
        return float(Decimal(repr(v)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))

    hit_ranks = [i + 1 for i, v in enumerate(ids) if v in exact]
    recall = r6(len(hit_ranks) / 5.0)
    mrr = r6(1.0 / min(hit_ranks)) if hit_ranks else 0.0
    dcg = sum(
        (
            Decimal(repr(1.0 / math.log2(r + 1))).quantize(
                Decimal(f"1e-{NDCG_ROUND}"), rounding=ROUND_HALF_UP
            )
            for r in hit_ranks
        ),
        Decimal(0),
    )
    ndcg = r6(float(dcg) / ideal_dcg(5))
    assert (row["recall"], row["mrr"], row["ndcg"]) == (recall, mrr, ndcg), ids


def test_cusum_changepoint_matches_python_model(spark):
    """events_cusum_changepoint against an INDEPENDENT pure-Python
    integer recomputation over the raw parquet (pyarrow, no Spark, no
    SQL): per user, D_i = n·cumsum_i − i·total over cents, argmax |D|
    with smallest-index tie-break — every field must agree exactly."""
    import pyarrow.parquet as pq

    from gpu_accelerated_vector_indexing_spark.operators.temporal import cusum_changepoint
    from tests.conftest import SF_SMOKE

    got = {r["user_id"]: r for r in cusum_changepoint(spark, SF_SMOKE).collect()}

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pylist()
    by_user: dict[int, list] = {}
    for e in t:
        by_user.setdefault(e["user_id"], []).append(e)
    assert set(by_user) == set(got)
    from decimal import ROUND_HALF_UP, Decimal

    for uid, evs in by_user.items():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        # HALF_UP cents snap, matching Spark's F.round — Python's
        # built-in round is half-to-even and would disagree on a value
        # landing exactly on .5 cents (ADVICE r7)
        cents = [
            int(
                Decimal(repr(e["value"] * 100)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )
            for e in evs
        ]
        n, total = len(cents), sum(cents)
        best = None  # (abs_dev DESC, idx ASC)
        cum = 0
        for i, c in enumerate(cents, start=1):
            cum += c
            d = n * cum - i * total
            key = (-abs(d), i)
            if best is None or key < best[0]:
                best = (key, i, evs[i - 1]["event_id"], abs(d))
        r = got[uid]
        assert (r["n_events"], r["cp_index"], r["cp_event_id"]) == (n, best[1], best[2]), uid
        assert r["max_dev"] == round(best[3] / (n * 100.0), 6) or abs(
            r["max_dev"] - best[3] / (n * 100.0)
        ) < 1e-6, uid


def test_lit_array_helpers_match_per_element(spark):
    """The one-round-trip literal-array builders (r11) are BIT-identical
    to the per-element ``F.array(*[F.lit(x), ...])`` form: repr() of a
    finite float round-trips, and the SQL parser's Double.parseDouble is
    correctly rounded — so the parsed Literals carry the same IEEE-754
    bits. Longs cover both word boundaries incl. LONG_MIN (which cannot
    parse as a negated positive literal and takes the subtraction form)."""
    import random
    import struct

    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.functions.vector import (
        lit_double_array,
        lit_double_array2,
        lit_long_array,
    )

    rng = random.Random(711)
    vals = [rng.uniform(-1e3, 1e3) for _ in range(64)]
    vals += [0.0, -0.0, 1e-300, -1.5e300, 0.1, 2.0, 1e-8, -3.5]
    got = spark.range(1).select(lit_double_array(vals).alias("x")).first().x
    ref = (
        spark.range(1)
        .select(F.array(*[F.lit(float(v)) for v in vals]).alias("x"))
        .first()
        .x
    )
    assert [struct.pack("<d", v) for v in got] == [struct.pack("<d", v) for v in ref]

    rows = [vals[:8], vals[8:16], [0.25, -0.5]]
    got2 = spark.range(1).select(lit_double_array2(rows).alias("x")).first().x
    assert [[struct.pack("<d", v) for v in r] for r in got2] == [
        [struct.pack("<d", float(v)) for v in r] for r in rows
    ]

    lvals = [0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63), 42]
    gotl = spark.range(1).select(lit_long_array(lvals).alias("x")).first().x
    assert gotl == lvals
