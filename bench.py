"""Benchmark harness — ≙ the reference's run_multiple_configs.sh.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], N runs each, and
prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing policy (mirrors the reference, IVF.cpp:683-686 / BASELINE.md):
the timed region is query execution + materialization. Small results
(top-k style) are collect()ed like the reference prints its k rows;
large results go to a ``noop`` sink so the measurement is computation,
not driver transfer. Each query reports the MEDIAN over N=3 runs
including the first (the reference's harness averages its runs,
run_multiple_configs.sh:103-110; the median is the robust twin — see
the acceptance block below for why r7 switched every row to it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_RUNS = 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _collect(df) -> None:
    df.collect()


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# (name, materialization) — names resolve through the driver-contract registry
BENCH_QUERIES = [
    # the reference's hot path (vector search family)
    ("knn_bruteforce", _collect),
    ("knn_bruteforce_pandas", _collect),
    ("knn_ivf_combined", _collect),
    ("knn_ivf_sequential", _collect),
    # n_probe sweep ≙ reference experiment grid (run_multiple_configs.sh)
    ("knn_ivf_np1", _collect),
    ("knn_ivf_np5", _collect),
    ("knn_ivf_np10", _collect),
    ("retrieval_ndcg", _collect),
    ("knn_ivf_adaptive", _collect),
    ("ivf_adaptive_sweep", _collect),
    ("knn_ivf_shard_merge", _collect),
    ("engine_ivf_merge_serve", _collect),  # run 1 persists the merged layout
    ("knn_lsh", _collect),
    ("knn_sq8", _collect),
    ("knn_ivf_sq8", _collect),
    ("knn_pq", _collect),
    ("knn_ivf_pq", _collect),
    ("knn_ivf_pq_residual", _collect),
    ("pq_state_roundtrip", _collect),
    ("ivf_shard_state_roundtrip", _collect),
    ("embedding_outliers", _collect),
    ("knn_bq", _collect),
    ("knn_ivf_bq", _collect),
    ("hybrid_search_rrf", _collect),
    ("hybrid_search_rrf_topn", _collect),
    ("knn_matryoshka", _collect),
    ("knn_ivf_matryoshka", _collect),
    # graph-index ANN (NN-descent build is memoized index state: run 1
    # builds, runs 2-3 measure the query path — same posture as
    # refshape_search_cli)
    ("graph_ann_build", _collect),
    ("knn_graph_beam", _collect),
    ("knn_graph_beam_bq", _collect),
    ("knn_graph_beam_filtered", _collect),
    ("knn_graph_beam_with_deletes", _collect),
    ("graph_state_roundtrip", _collect),
    ("graph_search_with_docs", _collect),
    ("graph_recall_sweep", _collect),
    ("graph_retrieval_ndcg", _collect),
    ("graph_ann_insert", _collect),
    ("streaming_graph_attach", _collect),
    ("graph_shard_merge_search", _collect),
    ("graph_merge_serve", _collect),
    ("ann_compression_error", _collect),
    ("filtered_method_recall", _collect),
    ("knn_prenorm", _collect),
    ("knn_ivf_prenorm", _collect),
    ("multi_query_knn", _collect),
    ("multi_query_graph_beam", _collect),
    ("knn_with_docs", _collect),
    ("engine_full_probe", _collect),  # run 1 pays KMeans build + partitioned write; warm runs serve the facade search
    # reference shape (128 clusters × 384 dims); run 1 pays the memoized
    # index build, later runs measure the pruned search
    ("refshape_search_cli", _collect),
    ("refshape_search_bq", _collect),
    ("refshape_kmeans_invariants", _collect),  # learned 128×384 layout; run 1 pays the fit
    # graph index at reference shape: _build absorbs the one-time
    # 384-dim NN-descent build (the cold number) so every search row
    # below measures WARM walks — the cold/warm split keeps walk
    # regressions visible outside build noise
    ("refshape_graph_build", _collect),
    ("refshape_graph_beam", _collect),
    ("refshape_graph_cli", _collect),
    ("refshape_graph_bq", _collect),
    # relational core over the big fact tables
    ("pricing_summary", _collect),
    ("shipping_priority", _collect),
    ("exists_late_shipment", _collect),
    ("join_multiway", _collect),
    ("join_bucketed_colocate", _collect),
    ("large_volume_orders", _collect),
    ("disjunctive_revenue", _collect),
    ("bilateral_trade_volume", _collect),
    ("corpus_pipeline", _collect),
    ("corpus_curriculum_plan", _collect),
    ("corpus_curriculum_pack", _collect),
    ("window_topk_per_group", _collect),
    ("window_running", _noop),
    ("scalar_subquery", _collect),
    ("lateral_topk", _collect),
    ("variant_props_stats", _collect),
    ("revenue_monthly_gapfill", _collect),
    ("zorder_layout", _collect),
    ("profit_by_nation_year", _collect),
    ("orders_rfm_segments", _collect),
    ("supplier_concentration", _collect),
    ("lineitem_profile", _collect),
    ("ship_delay_priority", _collect),
    # training-data pipeline operators
    ("join_asof", _noop),
    ("join_asof_tolerance", _noop),
    ("join_asof_forward", _noop),
    ("join_range_bucketed", _noop),
    ("sample_train_split", _noop),
    ("sketch_functions", _collect),
    ("stats_exact_moments", _collect),
    ("copurchase_lift", _collect),
    ("events_cohort_retention", _collect),
    ("contrastive_triplets", _collect),
    ("embedding_drift", _collect),
    ("ivf_centroid_refresh", _collect),
    ("sketch_hll_distinct", _collect),
    ("sketch_hll_merge", _collect),
    ("sketch_cms_merge", _collect),
    ("sketch_quantile_merge", _collect),
    ("streaming_hll_merge", _collect),
    ("streaming_cms_merge", _collect),
    ("curation_temperature_mix", _collect),
    ("dedup_corpus_overlap", _collect),
    ("sample_weighted_pps", _noop),
    ("copurchase_triangles", _collect),
    ("copurchase_kcore", _collect),
    ("quantiles_histogram", _collect),
    ("text_token_count", _noop),
    ("text_bpe_merges", _collect),
    ("corpus_bpe_encode", _noop),  # run 1 trains the memoized rule state
    ("corpus_pack_sequences", _collect),
    ("corpus_pack_shuffled", _collect),
    ("corpus_dedup_pack", _collect),  # component fixpoint state pays in run 1
    ("corpus_compaction_plan", _collect),
    ("dedup_minhash_lsh", _noop),
    ("dedup_simhash_pairs", _noop),
    ("dedup_ngram_jaccard", _noop),
    ("dedup_jaccard_verified_lsh", _noop),
    ("dedup_containment", _noop),
    ("corpus_ngram_novelty", _noop),
    ("dedup_embedding_lsh", _collect),
    ("dedup_semantic_graph", _collect),
    ("dedup_substring_spans", _noop),
    ("dedup_substring_spans_hashed", _noop),
    ("text_stats", _noop),
    ("curation_quality_filter", _noop),
    ("curation_decontaminate", _noop),
    ("curation_repetition_signals", _noop),
    ("curation_decontaminate_semantic", _noop),
    ("curation_nb_language", _noop),
    ("corpus_shard_manifest", _collect),
    ("sources_jsonl_shards", _collect),
    ("knn_chunk_pooled", _collect),
    ("knn_maxsim", _collect),
    ("corpus_clean_manifest", _collect),
    ("dedup_incremental_batch", _noop),
    ("text_vocab_top", _collect),
    ("text_zipf_profile", _collect),
    ("events_sequence_dataset", _noop),
    ("multimodal_features", _noop),
    ("multimodal_decode", _noop),
    # event-time windowing
    ("events_mad_outliers", _collect),
    ("events_cusum_changepoint", _collect),
    ("events_tumbling", _noop),
    ("events_sessionize", _noop),
    # --- r5 coverage widening: every family has bench rows, so a
    # regression can't hide in an unbenched corner (VERDICT r4 #9)
    ("knn_filtered", _collect),
    ("knn_ivf_filtered", _collect),
    ("knn_with_deletes", _collect),
    ("knn_per_cluster_topk", _collect),
    ("multi_query_knn_ivf", _collect),
    ("similarity_range_search", _collect),
    ("mmr_rerank", _collect),
    ("embed_and_search", _collect),
    ("ivf_index_stats", _collect),
    ("ivf_rebalance_plan", _collect),
    ("ivf_delete_compact", _collect),
    ("ivf_recall_sweep", _collect),
    ("graph_ann_recall", _collect),
    ("streaming_tumbling", _collect),
    ("streaming_sliding", _collect),
    ("streaming_sessions", _collect),
    ("streaming_interval_join", _collect),
    ("streaming_stream_static", _collect),
    ("streaming_foreach_upsert", _collect),
    ("streaming_dedup", _noop),
    ("streaming_knn", _collect),
    ("streaming_incremental_dedup", _collect),
    ("text_tfidf_top", _noop),
    ("text_winnow", _noop),
    ("text_lang_id", _noop),
    ("text_fingerprints", _noop),
    ("text_bigram_logprob", _noop),
    ("text_bpe_train", _collect),
    ("tokenizer_state_roundtrip", _collect),
    ("text_bpe_compression", _collect),
    ("curation_pii_redact", _noop),
    ("curation_mix_rebalance", _collect),
    ("curation_domain_cap", _noop),
    ("curation_decontaminate_hashed", _collect),
    ("corpus_snapshot_diff", _noop),
    ("index_refresh_cdc", _collect),  # run 1 pays base build + CDC refresh
    ("index_refresh_stats", _collect),
    ("streaming_index_refresh", _collect),  # run 1 drains the feed into a fresh base
    ("index_refresh_compacted", _collect),  # run 1 builds + refreshes + compacts its copy
    # r10: the refresh as a LOOP (gen 2) + the other two index families
    ("corpus_snapshot_diff_v3", _noop),
    ("index_refresh_cdc_gen2", _collect),  # run 1 pays base build + two cycles
    ("index_refresh_gen2_stats", _collect),
    ("index_refresh_gen2_compact_mid", _collect),  # run 1: base → c1 → compact → c2
    ("streaming_index_refresh_gen2", _collect),  # run 1 drains BOTH feeds
    ("graph_refresh_cdc", _collect),  # run 1 pays old-corpus build + mask/repair/attach
    ("pq_refresh_cdc", _collect),  # run 1 pays old-corpus fit + encode + delta
    ("graph_refresh_cdc_gen2", _collect),  # run 1: delta 2 over the persisted cycle-1 index
    ("pq_refresh_cdc_gen2", _collect),  # run 1: base+cycle1 copy + delta 2
    ("index_read_asof_gen", _collect),  # run 1 shares the gen-2 layout build
    ("index_delete_where", _collect),  # run 1: base build + predicate tombstones
    ("ivf_rebalance_apply", _collect),  # run 1: split pass + layout rewrite
    ("ivf_rebalance_serve", _collect),  # full-probe serve over the split layout
    ("ivf_rebalance_merge_apply", _collect),  # run 1: merge pass + layout rewrite
    ("ivf_rebalance_merge_serve", _collect),  # full-probe serve over the merged layout
    ("index_history_stats", _collect),  # per-gen write/retire/live accounting
    ("index_refresh_rebalanced", _collect),  # run 1: split pass over the gen-2 live rows
    ("streaming_index_delete_where", _collect),  # run 1: drain the purge feed
    ("index_refresh_gated", _collect),  # run 1: base build + gated cycle
    ("knn_filtered_planned_narrow", _collect),  # prefilter branch (fr)
    ("knn_filtered_planned_broad", _collect),  # postfilter branch (en)
    ("index_embedder_migration", _collect),  # run 1: v1 + v2 parallel builds
    ("streaming_index_read_asof", _collect),  # asof over the stream-folded layout
    ("pq_read_asof", _collect),  # PQ time travel (3 gen-windowed ADC serves)
    ("dedup_exact_keep", _noop),
    ("dedup_keep_canonical", _collect),
    ("dedup_state_roundtrip", _collect),
    ("dedup_embedding_topk", _collect),
    ("sample_split_leakage_safe", _noop),
    ("sketch_cms_heavy_hitters", _collect),
    ("events_funnel", _collect),
    ("events_transition_matrix", _collect),
    ("scd2_user_state", _noop),
    ("merge_upsert_latest", _noop),
    ("window_distribution", _noop),
    ("grouping_sets", _collect),
    ("pivot_status", _collect),
    ("skew_salted_agg", _collect),
    ("percentile_summary", _collect),
    ("corpus_integrity", _collect),
    ("multimodal_meta", _collect),
    ("multimodal_frames", _noop),
    ("multimodal_audio_energy", _noop),
    ("corpus_chunks", _noop),
    ("udaf_geomean_price", _collect),
    ("udtf_sentences", _noop),
    # --- r6: the last 65 unbenched rows — every registered query now
    # has a bench row and a baseline to hold (VERDICT r5 #2). Expensive
    # ones a regression could hide in lead the group.
    ("copurchase_pagerank", _noop),
    ("ann_method_comparison", _collect),
    ("kmeans_invariants", _collect),
    ("ivf_recall", _collect),
    ("lsh_recall", _collect),
    ("sources_roundtrip", _collect),
    ("sources_npy_roundtrip", _collect),
    ("sources_articles_roundtrip", _collect),
    ("sources_bin_stream", _collect),
    ("dedup_components", _noop),
    ("dedup_exact_summary", _collect),
    ("ivf_assign_incremental", _noop),
    ("ivf_centroids", _collect),
    ("lsh_bucket_stats", _collect),
    ("multi_query_knn_prenorm", _collect),
    ("corpus_validation", _collect),
    ("sql_scripting_report", _collect),
    ("incremental_agg_merge", _collect),
    ("events_rollup_hierarchy", _collect),
    ("events_sliding", _noop),
    ("events_trailing_window", _noop),
    ("events_value_histogram", _collect),
    ("events_zscore_outliers", _noop),
    ("cube_counts", _collect),
    ("rollup_counts", _collect),
    ("distinct_agg", _collect),
    ("having_groups", _collect),
    ("filtered_scan", _noop),
    ("join_anti", _noop),
    ("join_semi", _noop),
    ("join_outer", _noop),
    ("join_interval", _noop),
    ("join_asof_cogroup", _noop),
    ("join_bloom_pruned", _noop),
    ("window_lag_frames", _noop),
    ("window_topk_with_ties", _collect),
    ("sample_stratified", _noop),
    ("unpivot_flag_measures", _noop),
    ("set_operations", _collect),
    ("null_safe_semantics", _collect),
    ("case_bucketing", _collect),
    ("fuzzy_customer_pairs", _collect),
    ("listagg_nations", _collect),
    ("try_arithmetic_summary", _collect),
    ("string_functions", _collect),
    ("date_functions", _collect),
    ("math_functions", _collect),
    ("array_functions", _collect),
    ("json_functions", _collect),
    ("map_functions", _collect),
    ("copurchase_part_pairs", _noop),
    ("local_supplier_volume", _collect),
    ("revenue_forecast", _collect),
    ("returned_item_revenue", _collect),
    ("promo_revenue", _collect),
    ("small_quantity_revenue", _collect),
    ("dormant_rich_customers", _collect),
    ("customer_order_distribution", _collect),
    ("top_revenue_suppliers", _collect),
    ("cheapest_supplier_per_part", _noop),
    ("market_share", _collect),
    ("supplier_ship_delay", _collect),
    ("important_part_value", _collect),
    ("parts_supplier_count", _collect),
    ("excess_inventory_suppliers", _collect),
    # --- r6 novelties
    ("curation_dsir_sample", _noop),  # run 1 fits the memoized bucket model
    ("graph_relink_after_deletes", _collect),
    ("graph_engine_batch_search", _collect),  # run 1 persists the index
    ("streaming_dsir_score", _noop),
    ("streaming_outlier_alerts", _noop),
    ("graph_index_stats", _collect),
    ("knn_sq4", _collect),
    ("knn_ivf_sq4", _collect),
    # --- r7 novelties
    ("graph_serve_after_repair", _collect),  # run 1 repairs + persists
    ("dsir_state_roundtrip", _collect),
    ("curation_dsir_score_pretrained", _noop),
    ("graph_repair_recall", _collect),
    ("text_typo_pairs", _noop),
    ("text_typo_clusters", _noop),
]

# Acceptance statistic (VERDICT r6 #1: make the 2× bound mechanical for
# EVERY row, not just walk rows): each query's recorded number is the
# MEDIAN over its per-run array — medians shed the one cold/jittered
# run that a 3-run mean amplifies (walk rows swing 2.5-4× under host
# jitter; sub-second scalar rows breached 2× between same-round windows
# on nothing but window variance). Comparisons against BASELINE.md
# additionally floor the DENOMINATOR at ACCEPT_FLOOR_SEC so a 0.12 s
# row can't "regress 9×" inside scheduling noise:
#     accept iff  median_new <= 2 * max(median_base, ACCEPT_FLOOR_SEC)
# The raw per-run arrays stay in the payload, so any other statistic
# remains recomputable from the artifact alone.
ACCEPT_FLOOR_SEC = 0.5

# Rows whose run 1 pays a memoized index/state build (the "run 1
# pays…" comments above) while runs 2-3 serve warm: the N=3 MEDIAN no
# longer contains the build at all, so a fit/build-time regression is
# invisible to the median acceptance rule. VERDICT r10 #2: the
# acceptance block below ALSO compares runs[0] (cold) against the
# baseline's runs[0] for every row in this set, with the same 2× rule
# (higher floor — cold runs carry JVM/session warm-up on top of the
# build). A cold breach is reported as acceptance.cold_breaches and
# does not change the median statistic or any query's result.
MEMOIZED_QUERIES = {
    "engine_ivf_merge_serve", "graph_ann_build", "engine_full_probe",
    "refshape_search_cli", "refshape_search_bq", "refshape_kmeans_invariants",
    "refshape_graph_build", "corpus_bpe_encode", "corpus_dedup_pack",
    "index_refresh_cdc", "streaming_index_refresh", "index_refresh_compacted",
    "index_refresh_cdc_gen2", "index_refresh_gen2_compact_mid",
    "streaming_index_refresh_gen2", "graph_refresh_cdc", "pq_refresh_cdc",
    "graph_refresh_cdc_gen2", "pq_refresh_cdc_gen2", "index_read_asof_gen",
    "index_delete_where", "ivf_rebalance_apply", "ivf_rebalance_merge_apply",
    "index_refresh_rebalanced", "streaming_index_delete_where",
    "index_refresh_gated", "index_embedder_migration", "curation_dsir_sample",
    "graph_engine_batch_search", "graph_serve_after_repair",
    "kmeans_invariants", "sources_bin_stream", "dedup_corpus_overlap",
}
COLD_FLOOR_SEC = 2.0

# Walk-style rows (graph beam/sweep: many tiny driver-latency-bound
# stages) — kept for artifact continuity; since r7 the median rule
# applies to ALL rows, this set no longer selects a different statistic.
WALK_QUERIES = {
    "knn_graph_beam", "knn_graph_beam_bq", "knn_graph_beam_filtered",
    "knn_graph_beam_with_deletes", "graph_search_with_docs",
    "graph_recall_sweep", "graph_ann_insert", "streaming_graph_attach",
    "graph_state_roundtrip", "multi_query_graph_beam",
    "graph_shard_merge_search", "graph_retrieval_ndcg", "graph_merge_serve",
    "refshape_graph_beam", "refshape_graph_cli", "refshape_graph_bq",
    "graph_ann_recall",
}


from statistics import median as _median  # noqa: E402


def _storage_note(spark, tag: str) -> None:
    """Persisted-state pressure line (stderr only, VERDICT r10 #1b).

    The 304-query single-session bench carries the memo registry's
    persisted DataFrames and on-disk layouts; if the session slows down
    as it accumulates state, this trace is how the next verdict tells
    session drag from host contention. Never affects timing or results.
    """
    try:
        jsc = spark.sparkContext._jsc.sc()
        infos = jsc.getRDDStorageInfo()
        n = len(infos)
        mem = sum(i.memSize() for i in infos)
        disk = sum(i.diskSize() for i in infos)
        print(
            f"# storage[{tag}]: persisted_rdds={n} "
            f"mem_mb={mem / 1e6:.1f} disk_mb={disk / 1e6:.1f}",
            file=sys.stderr,
        )
    except Exception as e:  # instrumentation must never fail the bench
        print(f"# storage[{tag}]: unavailable ({e})", file=sys.stderr)


def main() -> None:
    from gpu_accelerated_vector_indexing_spark.queries import merged
    from gpu_accelerated_vector_indexing_spark.session import get_spark

    spark = get_spark("gpu_accelerated_vector_indexing_spark-bench")
    queries, _ = merged()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    results: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for qi, (name, materialize) in enumerate(BENCH_QUERIES):
        fn = queries[name]
        runs = []
        for _ in range(N_RUNS):
            t0 = time.time()
            materialize(fn(spark, SF_DIR))
            runs.append(time.time() - t0)
        results[name] = round(_median(runs), 4)
        all_runs[name] = [round(t, 4) for t in runs]
        print(f"# {name}: {results[name]:.3f}s  {[f'{t:.3f}' for t in runs]}  [median]", file=sys.stderr)
        if (qi + 1) % 50 == 0:
            _storage_note(spark, f"after_{qi + 1}")
    _storage_note(spark, "end")

    total = round(sum(results.values()), 4)
    payload = {
        "metric": "headline_queries_median_total",
        "value": total,
        "unit": "sec",
        "queries": results,
        # per-query numbers are MEDIANS over the per-run arrays below;
        # BASELINE.md comparisons floor the denominator at
        # acceptance.denominator_floor_sec (see ACCEPT_FLOOR_SEC)
        "runs": all_runs,
        "acceptance": {
            "statistic": "median",
            "denominator_floor_sec": ACCEPT_FLOOR_SEC,
            "rule": "median_new <= 2 * max(median_base, floor)",
        },
        "walk_queries": sorted(WALK_QUERIES),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_runs": N_RUNS,
    }
    # The driver's BENCH_r{N}.json artifact tail-truncates long stdout
    # (r3 lost 16/81 per-query numbers) — also write the COMPLETE
    # payload to a file so every per-query number survives the round.
    # N = the upcoming round (one past the largest recorded artifact).
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p)))
    ]
    n = max(rounds, default=0) + 1
    # only the driver's full-scale config owns the canonical name — a
    # smoke-scale run (SPARK_GRAFT_SF_DIR override) must not overwrite
    # the committed full-scale per-query record
    suffix = "" if sf == "0.1" else f"_sf{sf}"
    out_path = os.path.join(here, f"BENCH_full_r{n:02d}{suffix}.json")
    if os.path.exists(out_path):
        # intra-round re-runs overwrite by design (latest record wins),
        # but loudly, so the two series can't desynchronize unnoticed
        # (ADVICE r4): the driver's BENCH_r{N}.json is the round marker
        print(f"note: overwriting existing {os.path.basename(out_path)} "
              f"(intra-round bench re-run)", file=sys.stderr)
    wrote_full = True
    try:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
    except OSError as e:
        # the file artifact is the canonical per-query record — if the
        # write fails (read-only checkout, full disk) dump the COMPLETE
        # payload to stderr so the run's per-query medians and per-run
        # arrays survive in the process log (stdout must stay reserved
        # for the compact summary line the driver's tail parses)
        wrote_full = False
        print(f"note: could not write {out_path}: {e}", file=sys.stderr)
        print(json.dumps(payload), file=sys.stderr)

    # The driver keeps only a ~2000-char TAIL of stdout, so the final
    # line must be a COMPACT summary (VERDICT r7 wrong #1: the r6 fix
    # printed the full 270-query payload as the last line — far larger
    # than the tail window, so the parser never saw the line start and
    # BENCH_r07.parsed stayed null). Compact = headline metric + the
    # top slowest rows + the acceptance verdict vs the previous round's
    # full artifact + a pointer to the complete payload file.
    prior = sorted(
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(here, "BENCH_full_r*.json"))
        if (m := re.fullmatch(r"BENCH_full_r(\d+)\.json", os.path.basename(p)))
        and p != out_path
    )
    accept: dict[str, object] = {
        "statistic": "median",
        "denominator_floor_sec": ACCEPT_FLOOR_SEC,
        "rule": "median_new <= 2 * max(median_base, floor)",
    }
    if prior and suffix == "":
        base_n, base_path = prior[-1]
        try:
            with open(base_path) as f:
                base_payload = json.load(f)
                base = base_payload["queries"]
        except (OSError, KeyError, ValueError):
            base_payload, base = {}, {}
        worst, worst_q, breaches = 0.0, None, 0
        for q, t in results.items():
            if q not in base:
                continue
            ratio = t / max(base[q], ACCEPT_FLOOR_SEC)
            if ratio > 2.0:
                breaches += 1
            if ratio > worst:
                worst, worst_q = ratio, q
        if worst_q is not None:
            accept.update(
                baseline=os.path.basename(base_path),
                common=sum(1 for q in results if q in base),
                breaches=breaches,
                worst_ratio=round(worst, 3),
                worst_ratio_query=worst_q,
            )
        # Cold (run-1) check for memoized rows — VERDICT r10 #2: the
        # median lands on warm serves, so also hold run 1 (which pays
        # the build) to the 2× rule vs the baseline's run 1.
        base_runs = base_payload.get("runs", {})
        c_worst, c_worst_q, c_breaches = 0.0, None, 0
        for q in sorted(MEMOIZED_QUERIES):
            if q not in all_runs or not base_runs.get(q):
                continue
            ratio = all_runs[q][0] / max(base_runs[q][0], COLD_FLOOR_SEC)
            if ratio > 2.0:
                c_breaches += 1
            if ratio > c_worst:
                c_worst, c_worst_q = ratio, q
        if c_worst_q is not None:
            accept.update(
                cold_rule=f"runs[0]_new <= 2 * max(runs[0]_base, {COLD_FLOOR_SEC})",
                cold_breaches=c_breaches,
                cold_worst_ratio=round(c_worst, 3),
                cold_worst_query=c_worst_q,
            )
    top = dict(sorted(results.items(), key=lambda kv: -kv[1])[:8])
    summary = {
        "metric": "headline_queries_median_total",
        "value": total,
        "unit": "sec",
        "sf": payload["sf"],
        "n_runs": N_RUNS,
        "n_queries": len(results),
        # the 8 slowest rows inline; EVERY per-query median + raw
        # per-run array lives in full_payload
        "queries": top,
        "acceptance": accept,
        # None signals the artifact write failed — the complete payload
        # then lives on stderr, not in a file
        "full_payload": os.path.basename(out_path) if wrote_full else None,
    }
    line = json.dumps(summary)
    # hard guarantee: the line must fit the driver's ~2000-char tail
    # window (ADVICE r8: a single 3-query retry could still overflow
    # with pathological name lengths — loop until it fits)
    for n_keep in (3, 1, 0):
        if len(line) <= 1500:
            break
        summary["queries"] = dict(list(top.items())[:n_keep])
        line = json.dumps(summary)
    if len(line) > 1500:
        summary["acceptance"] = {}
        line = json.dumps(summary)
    assert len(line) <= 1500, "compact summary exceeds driver tail window"
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
