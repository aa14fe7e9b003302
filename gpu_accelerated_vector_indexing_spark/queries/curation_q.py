"""Corpus-curation query family (EXT): quality filter, decontamination,
PII redaction, source-mix rebalance.

Oracle notes: every ratio is an int/int (or bigint/bigint) double
division restated in the identical operation order, so IEEE doubles
agree bit-for-bit; the PII regexes are written in the common
Java-regex/RE2 subset so Spark and DuckDB match identically.
"""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators import curation as C
from gpu_accelerated_vector_indexing_spark.operators.curation import (
    DECON_EVAL_MOD,
    DECON_MIN_SHARED,
    DECON_NGRAM,
    EMAIL_RE,
    PHONE_RE,
    REP_MAX_DUP_TOKEN_FRAC,
    REP_MAX_DUP_TRIGRAM_FRAC,
    REP_MAX_TOP_BIGRAM_FRAC,
    SEMDECON_THRESHOLD,
    SHARD_A,
    SHARD_B,
    SHARD_N,
    SHARD_P,
    QF_MAX_AVG_TOKEN_LEN,
    QF_MAX_PUNCT_RATIO,
    QF_MAX_TOKENS,
    QF_MIN_AVG_TOKEN_LEN,
    QF_MIN_STOPWORD_RATIO,
    QF_MIN_TOKENS,
)
from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
    LANG_STOPWORDS,
    PUNCT_CLASS,
    TOKEN_RE,
)

QUERIES = {
    "curation_quality_filter": C.quality_filter,
    "curation_decontaminate": C.decontaminate_ngram_overlap,
    # full oracle: the string-keyed SQL (xxhash64 only changes the
    # shuffle key); equality also test-pinned (tests/test_curation.py)
    "curation_decontaminate_hashed": C.decontaminate_hashed,
    "curation_pii_redact": C.pii_redact,
    "curation_mix_rebalance": C.corpus_mix_rebalance,
    "curation_temperature_mix": C.temperature_mix,
    "curation_repetition_signals": C.repetition_signals,
    "curation_decontaminate_semantic": C.decontaminate_semantic,
    "corpus_shard_manifest": C.shard_manifest,
}

_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
_STOPS = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])

_QF_FAILS = {
    "len": f"(n_tokens < {QF_MIN_TOKENS} OR n_tokens > {QF_MAX_TOKENS})",
    "avg_token_len": (
        f"(avg_token_len < {QF_MIN_AVG_TOKEN_LEN} OR avg_token_len > {QF_MAX_AVG_TOKEN_LEN})"
    ),
    "stopwords": f"(stopword_ratio < {QF_MIN_STOPWORD_RATIO})",
    "punct": f"(punct_ratio > {QF_MAX_PUNCT_RATIO})",
}
_QF_NFAIL = " + ".join(f"{c}::INT" for c in _QF_FAILS.values())

_NGRAMS = (
    f"CASE WHEN len(toks) >= {DECON_NGRAM} THEN "
    f"list_transform(generate_series(1, len(toks) - {DECON_NGRAM - 1}), "
    f"i -> array_to_string(toks[i:i+{DECON_NGRAM - 1}], ' ')) "
    "ELSE []::VARCHAR[] END"
)

_AUG = (
    "'contact user' || doc_id::VARCHAR || '@example.com or 555-' || "
    "lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' ' || text"
)

ORACLES = {
    "curation_quality_filter": f"""
WITH base AS (
  SELECT doc_id,
         len({_TOKS})::INT AS n_tokens,
         list_sum(list_transform({_TOKS}, t -> length(t)::INT))::INT
           / len({_TOKS})::INT AS avg_token_len,
         len(list_filter({_TOKS}, t -> t IN ({_STOPS})))::INT
           / len({_TOKS})::INT AS stopword_ratio,
         (length(text) - length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')))::INT
           / length(text) AS punct_ratio
  FROM documents
)
SELECT doc_id, n_tokens, avg_token_len, stopword_ratio, punct_ratio,
  ({_QF_NFAIL})::INT AS n_failed,
  ({_QF_NFAIL}) = 0 AS keep,
  concat_ws(',',
    CASE WHEN {_QF_FAILS['len']} THEN 'len' END,
    CASE WHEN {_QF_FAILS['avg_token_len']} THEN 'avg_token_len' END,
    CASE WHEN {_QF_FAILS['stopwords']} THEN 'stopwords' END,
    CASE WHEN {_QF_FAILS['punct']} THEN 'punct' END) AS fail_reasons
FROM base
""",
    "curation_decontaminate": f"""
WITH toklists AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), shingles AS (
  SELECT doc_id, unnest(list_distinct({_NGRAMS})) AS ngram FROM toklists
), ev AS (
  SELECT doc_id AS eval_doc_id, ngram FROM shingles WHERE doc_id % {DECON_EVAL_MOD} = 0
), tr AS (
  SELECT doc_id, ngram FROM shingles WHERE doc_id % {DECON_EVAL_MOD} <> 0
)
SELECT tr.doc_id,
  count(DISTINCT tr.ngram)::BIGINT AS shared_ngrams,
  count(DISTINCT ev.eval_doc_id)::BIGINT AS eval_docs_hit,
  count(DISTINCT tr.ngram) >= {DECON_MIN_SHARED} AS contaminated
FROM tr JOIN ev USING (ngram)
GROUP BY tr.doc_id
""",
    "curation_pii_redact": f"""
WITH aug AS (SELECT doc_id, {_AUG} AS augtext FROM documents)
SELECT doc_id,
  len(regexp_extract_all(augtext, '{EMAIL_RE}'))::INT AS n_emails,
  len(regexp_extract_all(augtext, '{PHONE_RE}'))::INT AS n_phones,
  substr(regexp_replace(regexp_replace(augtext, '{EMAIL_RE}', '<EMAIL>', 'g'),
                        '{PHONE_RE}', '<PHONE>', 'g'), 1, 120) AS redacted_head
FROM aug
""",
    "curation_mix_rebalance": f"""
WITH per_src AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len({_TOKS})::INT)::BIGINT AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(n_docs)::BIGINT AS total_docs, count(*)::BIGINT AS n_sources FROM per_src
)
SELECT source, n_docs, n_tokens,
  n_docs / total_docs AS share,
  least(1.0, (total_docs / n_sources) / n_docs) AS weight,
  floor(n_docs * least(1.0, (total_docs / n_sources) / n_docs))::BIGINT AS expected_docs
FROM per_src, tot
""",
    # α = 0.5 temperature mix: √ is correctly rounded IEEE-754 in both
    # engines, the numerator is floor-scaled to integer micro-units so
    # the normalizer Σsi is an exact bigint sum, and expected_docs is
    # bigint floor division — no float accumulation anywhere.
    "curation_temperature_mix": f"""
WITH pl AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang),
w AS (SELECT lang, n_docs,
             CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS si
      FROM pl),
t AS (SELECT sum(n_docs)::BIGINT AS total_docs, sum(si)::BIGINT AS s_total FROM w)
SELECT lang, n_docs,
       floor(n_docs / total_docs * 1000000) / 1000000 AS share,
       floor(si / s_total * 1000000) / 1000000 AS temp_weight,
       ({C.TEMP_BUDGET}::BIGINT * si) // s_total AS expected_docs
FROM w, t
""",
}

_BIGRAMS = (
    "CASE WHEN len(toks) >= 2 THEN "
    "list_transform(generate_series(1, len(toks) - 1), "
    "i -> array_to_string(toks[i:i+1], ' ')) ELSE []::VARCHAR[] END"
)
_TRIGRAMS = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_transform(generate_series(1, len(toks) - 2), "
    "i -> array_to_string(toks[i:i+2], ' ')) ELSE []::VARCHAR[] END"
)

ORACLES["curation_repetition_signals"] = f"""
WITH toklists AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), base AS (
  SELECT doc_id, len(toks)::INT AS n,
         {_BIGRAMS} AS bigrams, {_TRIGRAMS} AS trigrams,
         len(list_distinct(toks))::INT AS n_distinct_toks
  FROM toklists
), cnt AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(bigrams) AS g FROM base) GROUP BY doc_id, g
), top AS (
  SELECT doc_id, max(c)::INT AS mx FROM cnt GROUP BY doc_id
), sig AS (
  SELECT b.doc_id, b.n AS n_tokens,
    COALESCE(t.mx, 0) AS top_bigram_count,
    CASE WHEN len(bigrams) > 0
         THEN COALESCE(t.mx, 0) / len(bigrams)::INT ELSE 0.0 END AS top_bigram_frac,
    CASE WHEN len(trigrams) > 0
         THEN (len(trigrams)::INT - len(list_distinct(trigrams))::INT) / len(trigrams)::INT
         ELSE 0.0 END AS dup_trigram_frac,
    CASE WHEN b.n > 0
         THEN (b.n - n_distinct_toks) / b.n ELSE 0.0 END AS dup_token_frac
  FROM base b LEFT JOIN top t USING (doc_id)
)
SELECT doc_id, n_tokens, top_bigram_count, top_bigram_frac, dup_trigram_frac,
  dup_token_frac,
  (top_bigram_frac <= {REP_MAX_TOP_BIGRAM_FRAC}
   AND dup_trigram_frac <= {REP_MAX_DUP_TRIGRAM_FRAC}
   AND dup_token_frac <= {REP_MAX_DUP_TOKEN_FRAC}) AS keep
FROM sig
"""

_SD_NORM = "list_transform({v}, x -> x / (sqrt(list_dot_product({v}, {v})) + 1e-8))"

# both sides pre-normalized exactly like the Spark plan (l2_normalize:
# divide by norm + 1e-8), then a bare dot — same doubles, same order
ORACLES["curation_decontaminate_semantic"] = f"""
WITH ev AS (
  SELECT vec_id AS eval_vec_id,
         {_SD_NORM.format(v='embedding::DOUBLE[]')} AS ev_emb
  FROM embeddings WHERE vec_id % {DECON_EVAL_MOD} = 0
), tr AS (
  SELECT vec_id, {_SD_NORM.format(v='embedding::DOUBLE[]')} AS emb
  FROM embeddings WHERE vec_id % {DECON_EVAL_MOD} <> 0
), scored AS (
  SELECT tr.vec_id, round(list_dot_product(emb, ev_emb), 6) AS sim
  FROM tr, ev
)
SELECT vec_id, max(sim) AS max_eval_sim,
  sum((sim >= {SEMDECON_THRESHOLD})::INT)::BIGINT AS n_eval_close,
  max(sim) >= {SEMDECON_THRESHOLD} AS contaminated
FROM scored GROUP BY vec_id
"""

ORACLES["corpus_shard_manifest"] = f"""
WITH per AS (
  SELECT ((((doc_id % {SHARD_P}) * {SHARD_A} + {SHARD_B}) % {SHARD_P}) % {SHARD_N})::INT AS shard,
    count(*)::BIGINT AS n_docs,
    sum(len({_TOKS})::INT)::BIGINT AS n_tokens,
    sum(n_chars)::BIGINT AS total_chars
  FROM documents GROUP BY 1
), tot AS (SELECT sum(n_docs)::BIGINT AS total_docs FROM per)
SELECT shard, n_docs, n_tokens, total_chars,
  n_docs / total_docs AS share
FROM per, tot
"""

# The hashed scale path must produce EXACTLY the string-keyed result
# (xxhash64 only changes the shuffle key, not the counts — distinct hash
# count == distinct shingle count absent collisions, which are both
# negligible (|shingles|²/2⁶⁴) and deterministic at a fixed sf). So the
# string-keyed SQL IS its full value oracle.
ORACLES["curation_decontaminate_hashed"] = ORACLES["curation_decontaminate"]


from gpu_accelerated_vector_indexing_spark.operators.curation import DOMAIN_CAP  # noqa: E402

QUERIES["curation_domain_cap"] = C.domain_cap

ORACLES["curation_domain_cap"] = f"""
WITH ranked AS (
  SELECT source,
         row_number() OVER (PARTITION BY source
                            ORDER BY ((doc_id % {SHARD_P}) * {SHARD_A} + {SHARD_B}) % {SHARD_P} ASC,
                                     doc_id ASC) AS rank
  FROM documents
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum((rank <= {DOMAIN_CAP})::INT)::BIGINT AS n_kept,
       count(*)::BIGINT - sum((rank <= {DOMAIN_CAP})::INT)::BIGINT AS n_dropped,
       count(*)::BIGINT > {DOMAIN_CAP} AS capped
FROM ranked GROUP BY source
"""


QUERIES["corpus_clean_manifest"] = C.clean_corpus_manifest

# the end-to-end composition: every stage's SQL is the SAME fragment as
# its standalone oracle (quality base, repetition sig, exact-dedup keep
# list, decon overlap counts), chained onto one survivor spine
ORACLES["corpus_clean_manifest"] = f"""
WITH qbase AS (
  SELECT doc_id,
         len({_TOKS})::INT AS n_tokens,
         list_sum(list_transform({_TOKS}, t -> length(t)::INT))::INT
           / len({_TOKS})::INT AS avg_token_len,
         len(list_filter({_TOKS}, t -> t IN ({_STOPS})))::INT
           / len({_TOKS})::INT AS stopword_ratio,
         (length(text) - length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')))::INT
           / length(text) AS punct_ratio
  FROM documents
),
qf AS (SELECT doc_id, ({_QF_NFAIL}) = 0 AS q_keep FROM qbase),
toklists AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
rbase AS (
  SELECT doc_id, len(toks)::INT AS n,
         {_BIGRAMS} AS bigrams, {_TRIGRAMS} AS trigrams,
         len(list_distinct(toks))::INT AS n_distinct_toks
  FROM toklists
),
rcnt AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(bigrams) AS g FROM rbase) GROUP BY doc_id, g
),
rtop AS (SELECT doc_id, max(c)::INT AS mx FROM rcnt GROUP BY doc_id),
rep AS (
  SELECT b.doc_id,
    (CASE WHEN len(bigrams) > 0
          THEN COALESCE(t.mx, 0) / len(bigrams)::INT ELSE 0.0 END
       <= {REP_MAX_TOP_BIGRAM_FRAC}
     AND CASE WHEN len(trigrams) > 0
          THEN (len(trigrams)::INT - len(list_distinct(trigrams))::INT) / len(trigrams)::INT
          ELSE 0.0 END <= {REP_MAX_DUP_TRIGRAM_FRAC}
     AND CASE WHEN b.n > 0
          THEN (b.n - n_distinct_toks) / b.n ELSE 0.0 END
       <= {REP_MAX_DUP_TOKEN_FRAC}) AS r_keep
  FROM rbase b LEFT JOIN rtop t USING (doc_id)
),
canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
shingles AS (
  SELECT doc_id, unnest(list_distinct({_NGRAMS})) AS ngram FROM toklists
),
ev AS (
  SELECT doc_id AS eval_doc_id, ngram FROM shingles WHERE doc_id % {DECON_EVAL_MOD} = 0
),
tr AS (
  SELECT doc_id, ngram FROM shingles WHERE doc_id % {DECON_EVAL_MOD} <> 0
),
decon AS (
  SELECT tr.doc_id, count(DISTINCT tr.ngram) >= {DECON_MIN_SHARED} AS contaminated
  FROM tr JOIN ev USING (ngram) GROUP BY tr.doc_id
),
survivors AS (
  SELECT d.doc_id, d.source, d.text, d.n_chars
  FROM documents d
  JOIN qf USING (doc_id)
  JOIN rep USING (doc_id)
  LEFT JOIN decon USING (doc_id)
  WHERE d.doc_id % {DECON_EVAL_MOD} <> 0
    AND d.doc_id IN (SELECT doc_id FROM canon)
    AND q_keep AND r_keep
    AND NOT coalesce(contaminated, false)
),
capped AS (
  SELECT doc_id, source, text, n_chars FROM (
    SELECT *, row_number() OVER (
        PARTITION BY source
        ORDER BY ((doc_id % {SHARD_P}) * {SHARD_A} + {SHARD_B}) % {SHARD_P} ASC, doc_id ASC) AS rank
    FROM survivors
  ) WHERE rank <= {DOMAIN_CAP}
),
per AS (
  SELECT ((((doc_id % {SHARD_P}) * {SHARD_A} + {SHARD_B}) % {SHARD_P}) % {SHARD_N})::INT AS shard,
         count(*)::BIGINT AS n_docs,
         sum(len({_TOKS})::INT)::BIGINT AS n_tokens,
         sum(n_chars)::BIGINT AS total_chars
  FROM capped GROUP BY 1
),
tot AS (SELECT sum(n_docs)::BIGINT AS total_docs FROM per)
SELECT shard, n_docs, n_tokens, total_chars,
       n_docs / total_docs AS share
FROM per, tot
"""


QUERIES["curation_nb_language"] = C.nb_language_classifier

# NB classifier: integer token counts on both sides, per-token ln
# rounded to 6 d.p. (repo transcendental policy), DECIMAL(18,6) sums —
# the one final cast to double is exact in both engines.
ORACLES["curation_nb_language"] = f"""
WITH toks AS (
  SELECT doc_id, lang = '{C.NB_TARGET_LANG}' AS is_tgt, unnest({_TOKS}) AS token
  FROM documents
),
counts AS (
  SELECT token,
         sum(CASE WHEN is_tgt THEN 1 ELSE 0 END)::BIGINT AS c_tgt,
         sum(CASE WHEN is_tgt THEN 0 ELSE 1 END)::BIGINT AS c_oth
  FROM toks GROUP BY token
),
tot AS (
  SELECT sum(c_tgt)::BIGINT AS n_tgt, sum(c_oth)::BIGINT AS n_oth,
         count(*)::BIGINT AS v
  FROM counts
),
w AS (
  SELECT token,
         CAST(round(ln((c_tgt + 1) / (n_tgt + v)) -
                    ln((c_oth + 1) / (n_oth + v)), 6) AS DECIMAL(18,6)) AS w
  FROM counts, tot
),
prior AS (
  SELECT CAST(round(
           ln(count(*) FILTER (lang = '{C.NB_TARGET_LANG}') / count(*)) -
           ln(count(*) FILTER (lang <> '{C.NB_TARGET_LANG}') / count(*)), 6)
         AS DECIMAL(18,6)) AS p
  FROM documents
),
scored AS (
  SELECT t.doc_id, count(*)::INT AS n_tokens, sum(w.w) AS sw
  FROM toks t JOIN w USING (token) GROUP BY t.doc_id
)
SELECT s.doc_id, d.lang, s.n_tokens,
       CAST(p + sw AS DOUBLE) AS nb_score,
       (p + sw) > 0 AS pred_tgt
FROM scored s JOIN documents d USING (doc_id) CROSS JOIN prior
"""


# --- DSIR-style hashed n-gram importance sampling (r6) -----------------------
# Full staged replay: the portable per-position shingle polynomial (the
# dedup family's recipe), bucket fold, Laplace-smoothed floor-scaled
# affinity, exact LONG per-doc sums, integer DIV, and the corpus-mean
# relative cut — every stage integer-or-single-division, no libm.
QUERIES["curation_dsir_sample"] = C.dsir_importance_sample


def _dsir_model_ctes() -> str:
    """The shingle→bucket→count→affinity model CTEs (dsg/dsb/dsc/dsa)
    — ONE SQL definition of the DSIR model shared by the scoring
    oracle and the state-roundtrip oracle, mirroring the Spark side's
    single ``dsir_bucket_affinity``."""
    from gpu_accelerated_vector_indexing_spark.operators.curation import DSIR_BUCKETS
    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        HASH_MOD,
        SHINGLE_LEN,
    )

    poly = " + ".join(
        f"ascii(substr(text, i + {j - 1}, 1))::BIGINT * {31 ** (SHINGLE_LEN - j)}"
        for j in range(1, SHINGLE_LEN + 1)
    )
    return f"""dsg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, length(text) - {SHINGLE_LEN - 1} + 1),
                               i -> ({poly}) % {HASH_MOD})) AS h
  FROM documents WHERE length(text) >= {SHINGLE_LEN}
),
dsb AS (SELECT doc_id, lang, h % {DSIR_BUCKETS} AS bucket FROM dsg),
dsc AS (SELECT bucket, count(*) AS r_b,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_b
        FROM dsb GROUP BY bucket),
dsa AS (SELECT bucket, r_b, t_b,
               CAST(floor(1000000.0 * (t_b + 1) / (r_b + 2)) AS BIGINT) AS aff_micro
        FROM dsc)"""


def _dsir_sql() -> str:
    return f"""
WITH {_dsir_model_ctes()},
dsbase AS (SELECT sum(r_b::HUGEINT * aff_micro) // sum(r_b) AS mean_pg FROM dsa),
dss AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(aff_micro) AS BIGINT) AS affinity_micro_sum
        FROM dsb JOIN dsa USING (bucket) GROUP BY doc_id)
SELECT s.doc_id, d.lang, n_grams, affinity_micro_sum,
       affinity_micro_sum // n_grams AS affinity_micro_per_gram,
       (affinity_micro_sum // n_grams) >= (SELECT mean_pg FROM dsbase) AS selected
FROM dss s JOIN documents d USING (doc_id)
"""


ORACLES["curation_dsir_sample"] = _dsir_sql()


# --- r7: DSIR model state persistence ------------------------------------------
# (the tokenizer/PQ/dedup/graph roundtrip posture applied to the fourth
# learned-state family): persist the ≤DSIR_BUCKETS-row affinity model,
# read it back, digest it in exact integers; the oracle re-derives the
# model from text through the SAME shared CTEs as the scoring oracle.
QUERIES["dsir_state_roundtrip"] = C.dsir_state_roundtrip
# the serve path: scoring through the PERSISTED model must be
# value-neutral down to every keep decision — same full oracle as the
# in-session query (the graph_engine_batch_search posture)
QUERIES["curation_dsir_score_pretrained"] = C.dsir_score_pretrained
ORACLES["curation_dsir_score_pretrained"] = _dsir_sql()
ORACLES["dsir_state_roundtrip"] = f"""
WITH {_dsir_model_ctes()}
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(bucket) AS BIGINT) AS bucket_id_sum,
       CAST(sum(r_b) AS BIGINT) AS raw_gram_sum,
       CAST(sum(t_b) AS BIGINT) AS target_gram_sum,
       CAST(sum(aff_micro) AS BIGINT) AS aff_micro_sum,
       CAST(min(aff_micro) AS BIGINT) AS aff_micro_min,
       CAST(max(aff_micro) AS BIGINT) AS aff_micro_max,
       CAST(sum(r_b::HUGEINT * aff_micro) // 1000000000000000000 AS BIGINT) AS wsum_micro_hi,
       CAST(sum(r_b::HUGEINT * aff_micro) % 1000000000000000000 AS BIGINT) AS wsum_micro_lo
FROM dsa
"""


# --- r7: curriculum scheduling ----------------------------------------------

QUERIES["corpus_curriculum_plan"] = C.corpus_curriculum_plan

ORACLES["corpus_curriculum_plan"] = f"""
WITH b AS (
  SELECT doc_id,
         len({_TOKS})::INT AS n_tokens,
         floor((len(list_filter({_TOKS}, t -> t IN ({_STOPS})))::INT
                / len({_TOKS})::INT) * {C.CURRICULUM_BUCKETS})::INT AS bucket
  FROM documents
),
per_bucket AS (
  SELECT bucket, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS toks
  FROM b GROUP BY bucket
),
cum AS (
  SELECT bucket, n_docs, toks,
         coalesce(sum(toks) OVER (ORDER BY bucket DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         sum(toks) OVER () AS total
  FROM per_bucket
),
ph AS (
  SELECT bucket, n_docs, toks,
         least(cum_before // ((total + {C.CURRICULUM_PHASES - 1}) // {C.CURRICULUM_PHASES}),
               {C.CURRICULUM_PHASES - 1})::INT AS phase
  FROM cum
)
SELECT phase,
       sum(n_docs)::BIGINT AS n_docs,
       sum(toks)::BIGINT AS tokens,
       count(*)::BIGINT AS n_buckets,
       round(max(bucket) / {C.CURRICULUM_BUCKETS}, 6) AS quality_hi,
       round(min(bucket) / {C.CURRICULUM_BUCKETS}, 6) AS quality_lo
FROM ph GROUP BY phase ORDER BY phase
"""


# --- r8: curriculum × packing composition ------------------------------------
# Phase-aware sequence packing: the curriculum plan's bucket→phase
# boundaries (same CTE chain as corpus_curriculum_plan's oracle) feed
# per-phase concat-and-chunk packing (same segment fan-out as
# corpus_pack_sequences' oracle). The global per-phase window restates
# the engine's bounded-relation two-pass prefix sum exactly: stream
# order within a phase is (bucket DESC, doc_id ASC) — easy first.

QUERIES["corpus_curriculum_pack"] = C.curriculum_pack_manifest


def _curriculum_pack_sql() -> str:
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        BPE_RE,
        PACK_SEQ_LEN,
    )

    bpe_sql = BPE_RE.replace("'", "''")
    L = PACK_SEQ_LEN
    P = C.CURRICULUM_PHASES
    return f"""
WITH b AS (
  SELECT doc_id,
         len({_TOKS})::INT AS n_tokens,
         floor((len(list_filter({_TOKS}, t -> t IN ({_STOPS})))::INT
                / len({_TOKS})::INT) * {C.CURRICULUM_BUCKETS})::INT AS bucket
  FROM documents
),
per_bucket AS (
  SELECT bucket, sum(n_tokens)::BIGINT AS toks FROM b GROUP BY bucket
),
cum AS (
  SELECT bucket, toks,
         coalesce(sum(toks) OVER (ORDER BY bucket DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         sum(toks) OVER () AS total
  FROM per_bucket
),
ph AS (
  SELECT bucket,
         least(cum_before // ((total + {P - 1}) // {P}), {P - 1})::INT AS phase
  FROM cum
),
ptoks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{bpe_sql}', 0)) AS BIGINT) AS n_toks
  FROM documents
),
docs AS (
  SELECT b.doc_id, ph.phase, b.bucket, t.n_toks
  FROM b JOIN ph USING (bucket) JOIN ptoks t ON b.doc_id = t.doc_id
),
pos AS (
  SELECT doc_id, phase, n_toks,
         CAST(coalesce(sum(n_toks) OVER (PARTITION BY phase
                  ORDER BY bucket DESC, doc_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
  FROM docs
),
segs AS (
  SELECT phase, doc_id, n_toks, s,
         unnest(generate_series(s // {L}, (s + n_toks - 1) // {L})) AS chunk_id
  FROM pos WHERE n_toks > 0
),
seg_len AS (
  SELECT phase, chunk_id, doc_id,
         least({L} * (chunk_id + 1), s + n_toks)
         - greatest({L} * chunk_id, s) AS seg_len
  FROM segs
)
SELECT phase, chunk_id, count(*) AS n_segments,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(seg_len) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM seg_len GROUP BY phase, chunk_id
"""


ORACLES["corpus_curriculum_pack"] = _curriculum_pack_sql()


# --- r8: corpus snapshot diff (dataset versioning) ---------------------------
# Deterministic old/new snapshots derived from the one fixture corpus;
# both engines hash UTF-8 text bytes with md5 and classify per doc_id
# through a full-outer join — the corpus-level CDC primitive.

QUERIES["corpus_snapshot_diff"] = C.corpus_snapshot_diff


def new_snapshot_text_sql() -> str:
    """The NEW snapshot's text expression — the ONE SQL restatement of
    ``curation.snapshot_new_docs``'s edit rule, shared by the diff
    oracle, the refresh-stats oracle, and the refresh serve oracle's
    corpus relation (r9 /code-review: three verbatim copies would have
    to move together on the next edit-rule change)."""
    return (
        f"CASE WHEN doc_id % {C.SNAP_EDIT_MOD} = {C.SNAP_EDIT_REM} "
        f"THEN upper(text) || '{C.SNAP_EDIT_SUFFIX}' ELSE text END"
    )


def new_snapshot_rel_sql(alias: str = "new_snap") -> str:
    """The NEW snapshot as an aliased relation (for FROM positions)."""
    return f"""(
  SELECT doc_id, {new_snapshot_text_sql()} AS text
  FROM documents
  WHERE doc_id % {C.SNAP_ADDED_MOD} <> {C.SNAP_ADDED_REM}
) {alias}"""


def quality_keep_ids_sql(docs_rel: str) -> str:
    """doc_ids passing the Gopher gate, over ANY ``(doc_id, text)``
    relation — the SQL twin of ``curation.quality_flags`` (the ONE
    restatement of the rule set, shared with the quality_filter oracle
    above and the gated-refresh oracle)."""
    return f"""(
  SELECT doc_id FROM (
    SELECT doc_id,
           len({_TOKS})::INT AS n_tokens,
           list_sum(list_transform({_TOKS}, t -> length(t)::INT))::INT
             / len({_TOKS})::INT AS avg_token_len,
           len(list_filter({_TOKS}, t -> t IN ({_STOPS})))::INT
             / len({_TOKS})::INT AS stopword_ratio,
           (length(text) - length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')))::INT
             / length(text) AS punct_ratio
    FROM {docs_rel}
  ) WHERE ({_QF_NFAIL}) = 0
)"""


def old_snapshot_rel_sql(alias: str = "old_snap_rel", where: str = "") -> str:
    """The OLD (base) snapshot as an aliased relation — the SQL twin of
    ``curation.snapshot_old_docs``, with an optional extra predicate
    (the delete-where oracle carves its purge slice out of this ONE
    membership definition)."""
    extra = f" AND ({where})" if where else ""
    return f"""(
  SELECT doc_id, text
  FROM documents
  WHERE doc_id % {C.SNAP_REMOVED_MOD} <> {C.SNAP_REMOVED_REM}{extra}
) {alias}"""


def snapshot_diff_ctes_sql() -> str:
    """``old_snap`` / ``new_snap`` (md5 digests) + the classified
    ``diff`` — the shared front half of every snapshot-diff oracle."""
    return f"""old_snap AS (
  SELECT doc_id, md5(text) AS old_md5 FROM documents
  WHERE doc_id % {C.SNAP_REMOVED_MOD} <> {C.SNAP_REMOVED_REM}
),
new_snap AS (
  SELECT doc_id, md5({new_snapshot_text_sql()}) AS new_md5
  FROM documents
  WHERE doc_id % {C.SNAP_ADDED_MOD} <> {C.SNAP_ADDED_REM}
),
diff AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, old_md5, new_md5,
         CASE WHEN old_md5 IS NULL THEN 'added'
              WHEN new_md5 IS NULL THEN 'removed'
              WHEN old_md5 <> new_md5 THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
)"""


ORACLES["corpus_snapshot_diff"] = f"""
WITH {snapshot_diff_ctes_sql()}
SELECT doc_id, old_md5, new_md5, status FROM diff
"""


# --- r10: snapshot N+2 (the SECOND cycle's change feed) ----------------------
# ONE SQL restatement of curation._v3_membership / snapshot_v3_docs,
# shared by the v2→v3 diff oracle and the gen-2 refresh oracles.

_IN_V2 = f"doc_id % {C.SNAP_ADDED_MOD} <> {C.SNAP_ADDED_REM}"
_V2_EDITED = f"doc_id % {C.SNAP_EDIT_MOD} = {C.SNAP_EDIT_REM}"
_V2_ADDED = f"doc_id % {C.SNAP_REMOVED_MOD} = {C.SNAP_REMOVED_REM}"
_REMOVED_V3 = (
    f"({_IN_V2} AND (({_V2_EDITED} AND doc_id % 2 = 0)"
    f" OR ({_V2_ADDED} AND doc_id % {C.SNAP3_DROPADD_MOD} = {C.SNAP3_DROPADD_REM})))"
)
_READDED_V3 = (
    f"(doc_id % {C.SNAP_ADDED_MOD} = {C.SNAP_ADDED_REM}"
    f" AND doc_id % {C.SNAP3_READD_MOD} = {C.SNAP3_READD_REM})"
)
_IN_V3 = f"(({_IN_V2} AND NOT {_REMOVED_V3}) OR {_READDED_V3})"
_EDITED_V3 = (
    f"({_IN_V3} AND (({_V2_EDITED} AND doc_id % 2 = 1)"
    f" OR doc_id % {C.SNAP3_EDIT_MOD} = {C.SNAP3_EDIT_REM}))"
)


def v3_snapshot_text_sql() -> str:
    """Snapshot N+2's text expression: the v2 edit rule applied first,
    then the v3 suffix for the v3-edited slice — mirroring
    ``curation.snapshot_v3_docs``'s pure row-local rule."""
    return (
        f"CASE WHEN {_EDITED_V3} THEN {new_snapshot_text_sql()} ||"
        f" '{C.SNAP3_EDIT_SUFFIX}' ELSE {new_snapshot_text_sql()} END"
    )


def v3_snapshot_rel_sql(alias: str = "v3_snap") -> str:
    """Snapshot N+2 as an aliased relation (for FROM positions)."""
    return f"""(
  SELECT doc_id, {v3_snapshot_text_sql()} AS text
  FROM documents
  WHERE {_IN_V3}
) {alias}"""


def snapshot_diff_v3_ctes_sql() -> str:
    """``v2_snap`` / ``v3_snap`` digests + the classified ``diff3`` —
    the shared front half of every v2→v3 diff oracle."""
    return f"""v2_snap AS (
  SELECT doc_id, md5({new_snapshot_text_sql()}) AS old_md5
  FROM documents WHERE {_IN_V2}
),
v3_snap AS (
  SELECT doc_id, md5({v3_snapshot_text_sql()}) AS new_md5
  FROM documents WHERE {_IN_V3}
),
diff3 AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, old_md5, new_md5,
         CASE WHEN old_md5 IS NULL THEN 'added'
              WHEN new_md5 IS NULL THEN 'removed'
              WHEN old_md5 <> new_md5 THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM v2_snap o FULL OUTER JOIN v3_snap n ON o.doc_id = n.doc_id
)"""


QUERIES["corpus_snapshot_diff_v3"] = C.corpus_snapshot_diff_v3
ORACLES["corpus_snapshot_diff_v3"] = f"""
WITH {snapshot_diff_v3_ctes_sql()}
SELECT doc_id, old_md5, new_md5, status FROM diff3
"""
