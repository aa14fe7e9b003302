from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import assert_parity


def _oracle_names():
    from gpu_accelerated_vector_indexing_spark.queries import multimodal_q, streaming_q, text_q

    names = []
    for mod in (text_q, multimodal_q, streaming_q):
        names += sorted(mod.ORACLES)
    return names


@pytest.mark.parametrize("name", _oracle_names())
def test_parity_smoke(spark, duck, name):
    assert_parity(spark, duck, name, SF_SMOKE)


@pytest.mark.parametrize("name", _oracle_names())
def test_parity_sf001(spark, duck, name):
    assert_parity(spark, duck, name, SF_CORRECT)


def test_rows_only_queries_run(spark):
    """Entries without oracles must still produce stable schemas + rows."""
    from gpu_accelerated_vector_indexing_spark.queries import merged

    queries, oracles = merged()
    for name in queries.keys() - oracles.keys():
        df = queries[name](spark, SF_SMOKE)
        assert df.count() > 0, f"{name} returned no rows"


def test_winnow_deterministic(spark):
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import winnow_fingerprints

    a = {(r.doc_id, r.n_fingerprints) for r in winnow_fingerprints(spark, SF_SMOKE).collect()}
    b = {(r.doc_id, r.n_fingerprints) for r in winnow_fingerprints(spark, SF_SMOKE).collect()}
    assert a == b and len(a) == 500


def test_decode_stub_raises_for_images():
    from gpu_accelerated_vector_indexing_spark.operators.multimodal import decode_payload

    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG", "image/png")
    assert decode_payload(b"abc", "text/plain") == b"abc"


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Append-mode watermark semantics with a two-batch feed: windows
    closed by the advancing watermark emit; a late event below the
    watermark is dropped (the core late-data contract)."""
    import os
    import time

    from pyspark.sql import functions as F

    src = "/root/repo/.tmp/stream_src"
    chk = "/root/repo/.tmp/stream_chk"
    for d in (src, chk):
        os.system(f"rm -rf {d}")
    os.makedirs(src)

    def write_batch(rows, name):
        (
            spark.createDataFrame(rows, "ts string, v int")
            .select(F.to_timestamp("ts").alias("ts"), "v")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    write_batch([("2024-01-01 00:01:00", 1), ("2024-01-01 00:02:00", 2)], "b1")

    stream = (
        spark.readStream.schema("ts timestamp, v int")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = stream.writeStream.outputMode("append").format("memory").queryName(
        "late_test"
    ).option("checkpointLocation", chk).start()
    try:
        q.processAllAvailable()
        # batch 2: advances watermark past the first window, plus one LATE row
        write_batch([("2024-01-01 00:30:00", 3)], "b2")
        q.processAllAvailable()
        write_batch([("2024-01-01 00:01:30", 99), ("2024-01-01 00:40:00", 4)], "b3")
        q.processAllAvailable()
        write_batch([("2024-01-01 01:00:00", 5)], "b4")
        q.processAllAvailable()
    finally:
        q.stop()
    out = {(str(r.ws), r.n) for r in spark.table("late_test").collect()}
    # the 00:00 window emitted with only the 2 on-time rows; the late row
    # (00:01:30, arriving after watermark passed 00:05) never appears
    assert ("2024-01-01 00:00:00", 2) in out
    assert all(n != 3 for ws, n in out if ws == "2024-01-01 00:00:00")


def test_applyinpandas_with_state_running_profile(spark):
    """Custom arbitrary-state operator: per-user running (count, sum)
    accumulates ACROSS micro-batches — the state survives between
    triggers, which no stateless map can fake."""
    import os

    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.streaming.stateful import user_profile_stream

    src = "/root/repo/.tmp/state_src"
    chk = "/root/repo/.tmp/state_chk"
    for d in (src, chk):
        os.system(f"rm -rf {d}")
    os.makedirs(src)

    def write_batch(rows):
        (
            spark.createDataFrame(rows, "user_id long, ts string, value double")
            .select("user_id", F.to_timestamp("ts").alias("ts"), "value")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    write_batch([(1, "2024-01-01 00:00:00", 10.0), (2, "2024-01-01 00:00:30", 5.0)])

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        user_profile_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_test")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch([(1, "2024-01-01 00:01:00", 7.0)])  # user 1 again
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("state_test").collect()
    by_user = {}
    for r in rows:  # last update per user wins
        by_user[r.user_id] = r
    assert by_user[1].n_events == 2 and by_user[1].sum_value == 17.0  # state carried over
    assert by_user[2].n_events == 1 and by_user[2].sum_value == 5.0
    assert str(by_user[1].last_ts).startswith("2024-01-01 00:01")


def test_streaming_dedup_invariants(spark):
    """dropDuplicatesWithinWatermark: exactly one survivor per
    (user_id, event_type) key, covering every key in the batch data,
    and each survivor is a genuine event of that key."""
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from gpu_accelerated_vector_indexing_spark.streaming.windows import (
        streaming_dedup,
        streaming_dedup_survivors,
    )
    from tests.conftest import SF_CORRECT

    contract = streaming_dedup(spark, SF_CORRECT).collect()
    assert contract and all(r.survivors == 1 and r.survivor_is_real for r in contract)
    out = streaming_dedup_survivors(spark, SF_CORRECT).collect()
    keys = [(r.user_id, r.event_type) for r in out]
    assert len(keys) == len(set(keys)), "duplicate keys survived"
    ev = load_table(spark, SF_CORRECT, "events")
    batch_keys = {
        (r.user_id, r.event_type)
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    assert set(keys) == batch_keys
    real = {
        (r.user_id, r.event_type, r.event_id)
        for r in ev.select("user_id", "event_type", "event_id").collect()
    }
    for r in out:
        assert (r.user_id, r.event_type, r.event_id) in real


def test_streaming_interval_join_equals_batch(spark):
    """The watermarked stream-stream interval join drained over static
    data must equal the batch interval join exactly (inner-join matches
    are emitted in the micro-batch they occur; watermarks only bound
    state)."""
    from gpu_accelerated_vector_indexing_spark.operators.temporal import (
        interval_join_view_purchase,
    )
    from gpu_accelerated_vector_indexing_spark.streaming.windows import (
        streaming_interval_join,
    )
    from tests.conftest import SF_CORRECT

    key = lambda r: (r.user_id, r.view_id, r.purchase_id, r.secs_to_purchase)
    batch = sorted(key(r) for r in interval_join_view_purchase(spark, SF_CORRECT).collect())
    stream = sorted(key(r) for r in streaming_interval_join(spark, SF_CORRECT).collect())
    assert stream == batch and len(batch) > 0


def test_streaming_profile_tws_equals_batch(spark):
    """transformWithStateInPandas (Spark 4 stateful API): a single-batch
    drain must reproduce the batch per-user totals. Skipped where the
    API's protobuf state-server dependency is unusable."""
    pytest.importorskip("google.protobuf.descriptor")
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from gpu_accelerated_vector_indexing_spark.streaming.windows import streaming_profile_tws
    from tests.conftest import SF_CORRECT

    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in streaming_profile_tws(spark, SF_CORRECT).collect()
    }
    want = {
        r.user_id: (r.n_events, r.sum_value)
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_stateful_checkpoint_restart_recovers_state(spark):
    """Checkpoint recovery: a NEW streaming query started from the same
    checkpointLocation must resume the per-user state (not recount from
    zero) and process only the data that arrived while it was down —
    the restart contract production streaming depends on."""
    import os

    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.streaming.stateful import user_profile_stream

    src = "/root/repo/.tmp/restart_src"
    chk = "/root/repo/.tmp/restart_chk"
    sink = "/root/repo/.tmp/restart_sink"
    for d in (src, chk, sink):
        os.system(f"rm -rf {d}")
    os.makedirs(src)

    def write_batch(rows):
        (
            spark.createDataFrame(rows, "user_id long, ts string, value double")
            .select("user_id", F.to_timestamp("ts").alias("ts"), "value")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    def start():
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(src)

        # memory sink can't recover from a checkpoint; foreachBatch can
        def emit(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink)

        return (
            user_profile_stream(stream)
            .writeStream.outputMode("update")
            .foreachBatch(emit)
            .option("checkpointLocation", chk)
            .start()
        )

    write_batch([(1, "2024-01-01 00:00:00", 10.0)])
    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    write_batch([(1, "2024-01-01 00:02:00", 4.0)])  # arrives while "down"
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    updates = spark.read.parquet(sink).filter(F.col("user_id") == 1).collect()
    latest = max(updates, key=lambda r: r.n_events)
    # the restarted query's totals continue from the recovered state —
    # 2 events / 14.0 total — instead of recounting from zero
    assert latest.n_events == 2 and latest.sum_value == 14.0
    assert str(latest.last_ts).startswith("2024-01-01 00:02")


def test_streaming_knn_batching_invariant(spark, tmp_path):
    """The stream-of-queries search must produce the batch multi-query
    result no matter how arrivals are micro-batched: split the corpus
    into several files, throttle to one file per trigger (≥2 real
    batches), and compare against the single-batch drain."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from gpu_accelerated_vector_indexing_spark.streaming.vector_stream import streaming_knn

    sfdir = tmp_path / "corpus"
    sfdir.mkdir()
    (
        load_table(spark, SF_SMOKE, "embeddings")
        .repartition(4, F.col("vec_id"))
        .write.parquet(str(sfdir / "embeddings.parquet"))
    )

    throttled = streaming_knn(
        spark, str(sfdir), max_files_per_trigger=1
    ).toPandas()
    single = streaming_knn(spark, str(sfdir)).toPandas()
    cols = sorted(throttled.columns)

    def canon(df):
        return df.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)

    assert canon(throttled).equals(canon(single))
    assert set(throttled.query("rn == 1").query_id) == {0, 1, 2, 3, 4}


def test_pack_sequences_invariants(spark):
    """Packing manifest invariants beyond the oracle: chunks tile the
    token stream exactly (every chunk but the last holds seq_len
    tokens, totals match the corpus), chunk ids are contiguous from 0,
    and doc spans chain (chunk N's first_doc == chunk N-1's last_doc
    whenever a document straddles the boundary)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        BPE_RE,
        PACK_SEQ_LEN,
        pack_sequences,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    rows = sorted(
        pack_sequences(spark, SF_CORRECT).collect(), key=lambda r: r.chunk_id
    )
    total = (
        load_table(spark, SF_CORRECT, "documents")
        .agg(F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))))
        .first()[0]
    )
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    assert all(r.n_tokens == PACK_SEQ_LEN for r in rows[:-1])
    assert 0 < rows[-1].n_tokens <= PACK_SEQ_LEN
    assert sum(r.n_tokens for r in rows) == total
    for prev, cur in zip(rows, rows[1:]):
        assert cur.first_doc in (prev.last_doc, prev.last_doc + 1)
        assert prev.first_doc <= prev.last_doc


def test_pack_shuffled_is_a_permutation_of_the_stream(spark):
    """Epoch-shuffled packing (r8): same total tokens and chunk count
    as the doc_id-order manifest (a permutation moves no mass), same
    tiling invariants, and a different seed actually permutes (some
    chunk's doc composition moves — else the 'shuffle' is a no-op)."""
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        PACK_SEQ_LEN,
        pack_sequences,
        pack_sequences_shuffled,
    )

    base = sorted(pack_sequences(spark, SF_CORRECT).collect(), key=lambda r: r.chunk_id)
    shuf = sorted(
        pack_sequences_shuffled(spark, SF_CORRECT).collect(), key=lambda r: r.chunk_id
    )
    assert len(shuf) == len(base)
    assert sum(r.n_tokens for r in shuf) == sum(r.n_tokens for r in base)
    assert [r.chunk_id for r in shuf] == list(range(len(shuf)))
    assert all(r.n_tokens == PACK_SEQ_LEN for r in shuf[:-1])
    other = sorted(
        pack_sequences_shuffled(spark, SF_CORRECT, seed=7).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.first_doc, r.last_doc) for r in other] != [
        (r.first_doc, r.last_doc) for r in shuf
    ]


def test_dedup_pack_drops_exactly_the_non_canonical_tokens(spark):
    """Dedup → packing (r8): the packed total equals the full-corpus
    total minus the dropped (non-canonical) documents' token counts,
    and the tiling invariants hold on the kept stream."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        dedup_pack_manifest,
        duplicate_components,
    )
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        PACK_SEQ_LEN,
        _pack_counts_state,
        pack_sequences,
    )

    rows = sorted(
        dedup_pack_manifest(spark, SF_CORRECT).collect(), key=lambda r: r.chunk_id
    )
    comp = duplicate_components(spark, SF_CORRECT)
    keep = comp.groupBy("component").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    dropped_toks = (
        comp.select("doc_id")
        .join(keep, "doc_id", "left_anti")
        .join(_pack_counts_state(spark, SF_CORRECT), "doc_id")
        .agg(F.coalesce(F.sum("n_toks"), F.lit(0)))
        .first()[0]
    )
    full_total = sum(
        r.n_tokens for r in pack_sequences(spark, SF_CORRECT).collect()
    )
    assert sum(r.n_tokens for r in rows) == full_total - dropped_toks
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    assert all(r.n_tokens == PACK_SEQ_LEN for r in rows[:-1])
    assert 0 < rows[-1].n_tokens <= PACK_SEQ_LEN


def test_streaming_incremental_dedup_equals_batch(spark):
    """Complete-mode drain of the document stream against the static
    archive state must equal the batch incremental query restricted to
    docs with a band collision (absence of a row IS the clean verdict
    in the streaming contract)."""
    from gpu_accelerated_vector_indexing_spark.operators.dedup import incremental_dedup
    from gpu_accelerated_vector_indexing_spark.streaming.dedup_stream import (
        streaming_incremental_dedup,
    )

    cols = ["new_doc_id", "best_jaccard", "best_match_doc_id", "is_duplicate"]
    s = sorted(map(tuple, streaming_incremental_dedup(spark, SF_CORRECT).select(cols).collect()))
    b = sorted(
        map(
            tuple,
            incremental_dedup(spark, SF_CORRECT)
            .filter("best_match_doc_id IS NOT NULL")
            .select(cols)
            .collect(),
        )
    )
    assert s == b and len(s) > 0


def test_bpe_train_prefix_and_validity(spark):
    """Determinism: fewer rounds = a prefix of more rounds; every rule
    merges two non-empty symbols with a positive count."""
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import bpe_train_merges

    four = [tuple(r) for r in bpe_train_merges(spark, SF_CORRECT, n_rounds=4).collect()]
    two = [tuple(r) for r in bpe_train_merges(spark, SF_CORRECT, n_rounds=2).collect()]
    assert two == four[:2]
    assert [r[0] for r in four] == [1, 2, 3, 4]
    for _, left, right, c in four:
        assert left and right and c > 0


def test_bpe_compression_drops_by_merge_counts(spark):
    """Every applied merge removes exactly one symbol, so each round's
    total drop equals the number of greedy-applied merges: ≤ the
    adjacent-pair count (which also counts the overlapping occurrences
    inside self-pair runs that greedy skips), with equality on this
    corpus (no self-pair run among the winning rules — asserted so a
    fixture change that breaks the equality is noticed)."""
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        bpe_compression_curve,
        bpe_train_merges,
    )

    curve = {r["step"]: r["total_symbols"] for r in bpe_compression_curve(spark, SF_CORRECT).collect()}
    merges = {r["step"]: r["n_occurrences"] for r in bpe_train_merges(spark, SF_CORRECT).collect()}
    for step, c in merges.items():
        drop = curve[step - 1] - curve[step]
        assert 0 < drop <= c
        assert drop == c, "winning rule hit a self-pair run; update this pin"


def test_bpe_greedy_run_semantics(spark):
    """The double-delimiter replace must implement the symbol-level
    greedy pass exactly: 'banana' with rule (a,n) → (b,an,an,a);
    'aaaa' with (a,a) → (aa,aa); 'aaa' → (aa,a)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import _bpe_apply

    df = spark.createDataFrame(
        [("|b||a||n||a||n||a|",), ("|a||a||a||a|",), ("|a||a||a|",)], "seg string"
    )
    out = [
        [x for x in r["seg"].split("|") if x]
        for r in _bpe_apply(_bpe_apply(df, "a", "n"), "a", "a").collect()
    ]
    assert out == [["b", "an", "an", "a"], ["aa", "aa"], ["aa", "a"]]


def test_zipf_profile_invariants(spark):
    """Vocabulary-concentration profile: ratios in range, vocabulary
    never exceeds occurrences, the head share covers at least the
    uniform share of `top` types and at most everything, and hapax
    tokens are a subset of the vocabulary."""
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        ZIPF_TOP,
        zipf_profile,
    )

    rows = zipf_profile(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 1 <= r.vocab_size <= r.n_tokens
        assert 0.0 < r.type_token_ratio <= 1.0
        assert 0.0 <= r.hapax_frac <= 1.0
        assert 0.0 < r.head_share <= 1.0
        # the top-k types cover at least k/vocab of occurrences only in
        # the uniform worst case; Zipfian text concentrates far above it
        assert r.head_share >= min(ZIPF_TOP, r.vocab_size) / r.vocab_size - 1e-6


def test_streaming_hll_equals_batch_sketch(spark):
    """The foreachBatch register fold must land on EXACTLY the one-shot
    batch sketch (register-max associativity across any micro-batching)
    and within the 15% estimate bound of the exact distinct count —
    the streaming analog of sketch_hll_merge's merge_exact pin."""
    from gpu_accelerated_vector_indexing_spark.streaming.windows import streaming_hll_merge

    r = streaming_hll_merge(spark, SF_CORRECT).collect()[0]
    assert r.stream_equals_batch
    assert r.est_stream == r.est_batch
    assert r.hll_ok and r.rel_err <= 0.15


def test_compaction_plan_invariants(spark):
    """Bins are contiguous doc_id ranges, every doc lands in exactly one
    bin, and every bin except possibly the last reaches the target
    (next-fit can only overflow by one straddling document)."""
    from tests.conftest import SF_CORRECT

    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        COMPACT_TARGET,
        compaction_plan,
    )
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    from pyspark.sql import functions as F

    rows = compaction_plan(spark, SF_CORRECT).collect()
    docs = load_table(spark, SF_CORRECT, "documents")
    n_docs, max_sz = docs.agg(F.count("*"), F.max(F.length("text"))).first()
    assert sum(r.n_docs for r in rows) == n_docs
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.last_doc < nxt.first_doc  # contiguous, disjoint spans
    # next-fit bound: a bin's fill is the gap between consecutive bin
    # start offsets, each within one straddling document of the target
    assert all(
        COMPACT_TARGET - max_sz <= r.total_units <= COMPACT_TARGET + max_sz
        for r in rows[:-1]
    )


def test_streaming_graph_attach_batching_invariance(spark, tmp_path):
    """Attach digest must be identical whether the new vectors arrive
    in ONE micro-batch or one file at a time — every node's candidates
    are generated in its own batch, so batching cannot change the
    per-node top-k (the claim streaming/graph_stream.py makes by
    construction; this pins it empirically across 4 file-batches)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table
    from gpu_accelerated_vector_indexing_spark.streaming.graph_stream import (
        streaming_graph_attach,
    )

    sfdir = tmp_path / "corpus"
    sfdir.mkdir()
    (
        load_table(spark, SF_SMOKE, "embeddings")
        .repartition(4, F.col("vec_id"))
        .write.parquet(str(sfdir / "embeddings.parquet"))
    )

    throttled = streaming_graph_attach(
        spark, str(sfdir), max_files_per_trigger=1
    ).toPandas()
    single = streaming_graph_attach(spark, str(sfdir)).toPandas()
    cols = sorted(throttled.columns)

    def canon(df):
        return df.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)

    assert canon(throttled).equals(canon(single))
    assert len(throttled) > 0  # an empty digest would pass equals() vacuously
    assert (throttled.n_edges > 0).all()


# --- real dependency-free codecs (r5) ----------------------------------------


def test_wav_codec_roundtrip_and_alignment():
    """RIFF encoder/decoder: exact roundtrip, word-aligned containers
    (odd payloads get the pad byte a strict parser requires), fmt
    fields as declared."""
    from gpu_accelerated_vector_indexing_spark.operators.multimodal import (
        WAV_SAMPLE_RATE,
        _decode_wav_pcm,
        _encode_wav_pcm,
    )

    for data in (b"x", b"odd size!", b"even thing", bytes(range(256)) * 5):
        enc = _encode_wav_pcm(data)
        assert len(enc) % 2 == 0  # word-aligned container
        import struct

        assert struct.unpack("<I", enc[4:8])[0] == len(enc) - 8  # RIFF size exact
        w = _decode_wav_pcm(enc)
        assert w["samples"] == data
        assert (w["sample_rate"], w["n_channels"], w["bits_per_sample"]) == (
            WAV_SAMPLE_RATE, 1, 8,
        )


def test_wav_decoder_tolerates_extra_chunks():
    """A real RIFF parser walks chunk ids — an unknown LIST chunk before
    data must not break it (this is what distinguishes a chunk walk
    from an offset hack)."""
    import struct

    from gpu_accelerated_vector_indexing_spark.operators.multimodal import (
        _decode_wav_pcm,
        _encode_wav_pcm,
    )

    data = b"hello pcm"
    enc = _encode_wav_pcm(data)
    fmt_chunk = enc[12:36]  # 'fmt ' + size + 16 bytes
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    data_chunk = enc[36:]
    doctored = enc[:12] + fmt_chunk + extra + data_chunk
    doctored = b"RIFF" + struct.pack("<I", len(doctored) - 8) + doctored[8:]
    assert _decode_wav_pcm(doctored)["samples"] == data


def test_bmp_codec_roundtrip_and_layout():
    """BMP encoder/decoder: bottom-up row flip restores byte order, file
    size arithmetic matches the header, sub-width payload pads."""
    from gpu_accelerated_vector_indexing_spark.operators.multimodal import (
        BMP_WIDTH,
        _decode_bmp8,
        _encode_bmp8,
    )

    for data in (b"q", b"a" * BMP_WIDTH, b"b" * (BMP_WIDTH + 1), bytes(range(200))):
        b = _decode_bmp8(_encode_bmp8(data))
        h = max(1, -(-len(data) // BMP_WIDTH))
        assert (b["width"], b["height"], b["bpp"]) == (BMP_WIDTH, h, 8)
        assert b["pixels"][: len(data)] == data
        assert b["file_size"] == 14 + 40 + 1024 + h * BMP_WIDTH


def test_decode_payload_codec_routing():
    """image/bmp and audio/wav decode WITHOUT PIL; an unsupported image
    format still raises the principled dependency gate."""
    from gpu_accelerated_vector_indexing_spark.operators.multimodal import (
        _encode_bmp8,
        _encode_wav_pcm,
        decode_payload,
    )

    assert decode_payload(_encode_bmp8(b"pix"), "image/bmp")["pixels"][:3] == b"pix"
    assert decode_payload(_encode_wav_pcm(b"pcm"), "audio/wav")["samples"] == b"pcm"
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed — gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_payload(b"\x89PNG....", "image/png")


def test_decode_payload_error_contract():
    """Malformed WAV bytes raise ValueError (loud, never a byte-buffer
    fake), and an unsupported BMP VARIANT names the variant in its gate
    message, not 'non-BMP' (r5 advisor)."""
    import struct

    from gpu_accelerated_vector_indexing_spark.operators.multimodal import (
        decode_payload,
    )

    with pytest.raises(ValueError, match="audio/wav"):
        decode_payload(b"not a riff container at all", "audio/wav")
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed — gate not exercised")
    except ImportError:
        pass
    # a syntactically-valid BMP header but 24-bit: the 8-bit walk
    # declines, the PIL gate must say it's a BMP variant
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + 3, 0, 0, 14 + 40)
    hdr += struct.pack("<IiiHH", 40, 1, 1, 1, 24) + b"\x00" * 22 + b"\x00\x00\xff"
    with pytest.raises(NotImplementedError, match="BMP variant"):
        decode_payload(hdr, "image/bmp")


def test_streaming_alerts_agree_with_batch_mad_counts(spark):
    """The accumulated alert stream must flag exactly the events the
    batch robust-outlier audit counts: per event_type, |alerts| equals
    mad_outliers' n_outliers (one bounds definition, two consumers)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.operators.temporal import mad_outliers
    from gpu_accelerated_vector_indexing_spark.streaming.windows import (
        streaming_outlier_alerts,
    )
    from tests.conftest import SF_SMOKE

    alerts = (
        streaming_outlier_alerts(spark, SF_SMOKE)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    got = {r["event_type"]: r["n"] for r in alerts.collect()}
    expected = {
        r["event_type"]: r["n_outliers"]
        for r in mad_outliers(spark, SF_SMOKE).collect()
        if r["n_outliers"] > 0
    }
    assert got == expected


def test_no_trailing_batch_guard_restores_conf(spark):
    """The drain-and-stop streaming queries skip the trailing no-data
    micro-batch (state eviction a stopped query never reads) via a
    scoped conf guard — it must flip the flag inside the block and
    restore the session default on exit, even when the drain raises,
    so append-mode streams started later still get their
    watermark-emission batch."""
    from gpu_accelerated_vector_indexing_spark.streaming.windows import (
        _no_trailing_batch,
    )

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    assert spark.conf.get(key, "true") == "true"
    with _no_trailing_batch(spark):
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == "true"
    with pytest.raises(RuntimeError, match="boom"):
        with _no_trailing_batch(spark):
            assert spark.conf.get(key) == "false"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == "true"


def test_stream_shuffle_partitions_derivation(monkeypatch):
    """The stateful-stream partition count derives from source bytes /
    per-partition target (AQE's coalescer rule, applied up front because
    AQE never runs inside Structured Streaming): fixture-sized sources
    floor at 1, corpus-sized sources scale linearly, and the env
    overrides pin it for cluster deployments."""
    import os

    from gpu_accelerated_vector_indexing_spark.streaming._drain import (
        STREAM_PART_BYTES,
        stream_shuffle_partitions,
    )

    monkeypatch.delenv("SPARK_GRAFT_STREAM_PARTITIONS", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_STREAM_PART_BYTES", raising=False)
    # fixture events are ~2 MB << 64 MB target → floor of 1
    assert stream_shuffle_partitions(SF_CORRECT, "events") == 1
    # unknown table → zero bytes → still the floor, never 0
    assert stream_shuffle_partitions(SF_CORRECT, "no_such_table") == 1
    # a smaller per-partition target scales the count with the bytes
    sz = os.path.getsize(os.path.join(SF_CORRECT, "events.parquet"))
    monkeypatch.setenv("SPARK_GRAFT_STREAM_PART_BYTES", str(max(sz // 4, 1)))
    assert stream_shuffle_partitions(SF_CORRECT, "events") >= 4
    # the explicit count override wins outright
    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTITIONS", "7")
    assert stream_shuffle_partitions(SF_CORRECT, "events") == 7
    assert STREAM_PART_BYTES == 64 * 1024 * 1024


def test_scoped_stream_partitions_restores_conf(spark):
    """The scoped shuffle-partition override for stream drains must set
    the derived count inside the block and restore the session default
    on exit (same contract as the no-trailing-batch guard), including
    on error — batch queries keep AQE + the session default."""
    from gpu_accelerated_vector_indexing_spark.streaming._drain import (
        scoped_stream_partitions,
    )

    key = "spark.sql.shuffle.partitions"
    default = spark.conf.get(key)
    with scoped_stream_partitions(spark, SF_CORRECT, "events"):
        assert spark.conf.get(key) == "1"
    assert spark.conf.get(key) == default
    with pytest.raises(RuntimeError, match="boom"):
        with scoped_stream_partitions(spark, SF_CORRECT, "events"):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == default
