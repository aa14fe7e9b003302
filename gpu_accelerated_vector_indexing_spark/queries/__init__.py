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


# Driver-gate rotation (VERDICT r2, "Next round" #2): the driver's
# CORRECTNESS gate checks a prefix sample of this registry, so
# registration order decides which queries earn a driver-checked row
# each round. 113 of 163 queries had no gate row after r2. Priority
# order within the prefix: round-3 novelties (reference-shape, newly
# oracled PQ, streaming KNN), then the family flagships VERDICT names,
# then the never-sampled families; the knn/ivf/lsh/modern names already
# green in r1+r2 rotate to the back. Rotate again next round until
# every family has a green row.
_GATE_FIRST = [
    # The first ~50 names are curated so a 50-query driver sample (the
    # r1/r2 sample size) covers every family that has never earned a
    # gate row, plus all round-3 novelties. Breadth beats depth here:
    # each family's flagship lands inside the prefix; family remainders
    # follow immediately after.
    # round-3 novelties (reference-shape, newly-oracled PQ, streaming
    # KNN, the new curation/dedup/index-maintenance surface)
    "refshape_search_cli", "refshape_search_bq",
    "knn_pq", "knn_ivf_pq", "knn_ivf_pq_residual", "ann_method_comparison",
    "streaming_knn", "corpus_pack_sequences",
    "curation_repetition_signals", "curation_decontaminate_semantic",
    "corpus_shard_manifest", "knn_chunk_pooled", "dedup_incremental_batch",
    "ivf_delete_compact", "knn_with_deletes", "curation_domain_cap",
    "corpus_clean_manifest", "dedup_state_roundtrip",
    "streaming_incremental_dedup", "corpus_integrity", "text_bpe_merges",
    "text_bpe_train", "text_bpe_compression", "dedup_substring_spans",
    "knn_matryoshka", "curation_nb_language", "sources_jsonl_shards",
    "contrastive_triplets", "embedding_drift",
    "sketch_hll_distinct", "sample_weighted_pps", "copurchase_triangles",
    "knn_maxsim", "ivf_centroid_refresh", "quantiles_histogram",
    # family flagships named in VERDICT r2 "Next round" #2
    # (stats_exact_moments rotates below the 50-line to make room for
    # the r3 novelties; its family stays represented by quantiles work)
    "dedup_minhash_lsh", "curation_decontaminate", "copurchase_pagerank",
    "join_asof", "streaming_tumbling",
    # UDF surface (never sampled; udtf rotates below the 50-line)
    "udaf_geomean_price",
    # dedup family (rest; exact_keep/keep_canonical/simhash/ngram rotate
    # below the 50-line — exact_summary, the verified-LSH scale path and
    # components hold the family's slots)
    "dedup_exact_summary",
    "dedup_jaccard_verified_lsh",
    "dedup_embedding_topk", "dedup_components",
    # curation family (rest; decontaminate_hashed/pii_redact/
    # mix_rebalance rotate below — the decontaminate flagship holds
    # the family's slot)
    "curation_quality_filter",
    # sources connectors (never sampled)
    "sources_roundtrip", "sources_bin_stream",
    "sources_npy_roundtrip", "sources_articles_roundtrip",
    # temporal flagship slice (rest of the family follows below)
    "join_range_bucketed", "events_funnel", "merge_upsert_latest",
    "scd2_user_state",
    # relational flagships with no gate row in r1/r2
    "copurchase_lift", "events_cohort_retention",
    # streaming flagship slice
    "events_tumbling", "streaming_sliding", "streaming_dedup",
    "streaming_interval_join",
    # --- ~50-name line: remainders below still precede the legacy
    # knn/ivf/lsh/modern names that are already green in r1+r2
    "udtf_sentences", "stats_exact_moments", "curation_mix_rebalance",
    "dedup_exact_keep", "dedup_keep_canonical", "dedup_simhash_pairs",
    "dedup_ngram_jaccard", "curation_decontaminate_hashed", "curation_pii_redact",
    "events_rollup_hierarchy", "events_trailing_window", "join_interval",
    "events_zscore_outliers", "events_transition_matrix",
    "join_asof_cogroup", "incremental_agg_merge",
    "skew_salted_agg", "grouping_sets",
    "events_sliding", "events_sessionize", "streaming_sessions",
    "streaming_stream_static", "streaming_foreach_upsert",
]


def merged() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from gpu_accelerated_vector_indexing_spark.queries import (
        approx_q,
        curation_q,
        dedup_q,
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
