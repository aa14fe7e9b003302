"""Named query registry: every operator the engine claims is here.

Each family module exposes
  QUERIES: dict[name, Callable[[SparkSession, str], DataFrame]]
  ORACLES: dict[name, str]      # DuckDB ANSI SQL; omit → rows-only check

The driver contract (``__spark_entry__.py``) merges all families.
Column names are aliased identically in the Spark code and the oracle
SQL — the driver's compare hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Driver-gate rotation, round 5 (VERDICT r4 "Next round" #1): the
# driver samples a ~50-query PREFIX of this registry, so registration
# order decides which queries earn a driver-written CORRECTNESS row.
# After r1-r4 the gated union is 155/226; the names below lead with the
# round-5 novelties, then the never-gated names (VERDICT-named
# flagships first) so the round-5 sample comes entirely from names
# with no driver-written row yet. The tail never-gated relational
# rows (positions 51+) rotate forward in round 6, closing the union.
_GATE_FIRST = [
    # --- round-5 novelties (added this round; never gated by definition)
    "sketch_cms_merge", "multimodal_decode", "refshape_graph_beam",
    "refshape_graph_cli", "streaming_cms_merge", "refshape_graph_bq",
    "dedup_embedding_lsh", "corpus_bpe_encode", "refshape_graph_build",
    "multimodal_audio_energy", "sketch_quantile_merge",
    "dedup_semantic_graph", "tokenizer_state_roundtrip",
    "multi_query_graph_beam",
    # --- never-gated after r1-r4, flagships first
    "curation_decontaminate_hashed", "events_rollup_hierarchy",
    "streaming_stream_static", "streaming_foreach_upsert",
    "grouping_sets", "window_topk_per_group", "window_lag_frames",
    "window_distribution", "window_topk_with_ties", "set_operations",
    "string_functions", "date_functions", "math_functions",
    "array_functions", "json_functions", "map_functions",
    "sketch_functions", "multimodal_meta", "multimodal_frames",
    "corpus_chunks", "text_lang_id", "text_stats", "text_vocab_top",
    "text_fingerprints", "text_token_count", "text_bigram_logprob",
    "corpus_pipeline", "dedup_ngram_jaccard", "events_trailing_window",
    "join_interval", "events_zscore_outliers", "events_transition_matrix",
    "join_asof_cogroup", "incremental_agg_merge", "skew_salted_agg",
    "events_sliding", "events_sessionize", "percentile_summary",
    "case_bucketing", "pivot_status", "join_bloom_pruned",
    "null_safe_semantics", "fuzzy_customer_pairs", "events_value_histogram",
    "sample_train_split", "sample_stratified", "unpivot_flag_measures",
    "listagg_nations", "try_arithmetic_summary", "copurchase_part_pairs",
    # --- never-gated tail (round-6 rotation fodder)
    "shipping_priority", "exists_late_shipment", "large_volume_orders",
    "disjunctive_revenue", "bilateral_trade_volume",
    "local_supplier_volume", "revenue_forecast", "returned_item_revenue",
    "promo_revenue", "small_quantity_revenue", "dormant_rich_customers",
    "customer_order_distribution", "top_revenue_suppliers",
    "cheapest_supplier_per_part", "market_share", "supplier_ship_delay",
    "profit_by_nation_year", "important_part_value", "ship_delay_priority",
    "parts_supplier_count", "excess_inventory_suppliers",
]


def merged() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from gpu_accelerated_vector_indexing_spark.queries import (
        approx_q,
        curation_q,
        dedup_q,
        graph_ann_q,
        ivf_q,
        knn_q,
        lsh_q,
        modern_q,
        multimodal_q,
        refshape_q,
        relational_q,
        streaming_q,
        temporal_q,
        text_q,
        udx_q,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (
        knn_q,
        ivf_q,
        refshape_q,
        lsh_q,
        modern_q,
        relational_q,
        temporal_q,
        approx_q,
        curation_q,
        dedup_q,
        graph_ann_q,
        text_q,
        multimodal_q,
        streaming_q,
        udx_q,
    ):
        overlap = queries.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    missing = oracles.keys() - queries.keys()
    if missing:
        raise ValueError(f"oracle without query: {missing}")
    unknown = [n for n in _GATE_FIRST if n not in queries]
    if unknown:
        # a silent skip would quietly forfeit that family's curated
        # gate slot — the exact drift this list exists to prevent
        raise ValueError(f"_GATE_FIRST names not in registry: {unknown}")
    ordered = {n: queries[n] for n in _GATE_FIRST}
    ordered.update(queries)
    return ordered, oracles
