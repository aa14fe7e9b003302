"""Text-analysis query family (EXT, SURVEY.md §2.3).

Ratios are int/int double divisions (exact, deterministic); the
composite quality score mirrors the exact operation order of the Spark
expression so IEEE doubles agree bit-for-bit.
"""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators import text_analysis as TA
from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
    BPE_RE,
    LANG_STOPWORDS,
    PUNCT_CLASS,
    TOKEN_RE,
    WINNOW_B,
    WINNOW_K,
    WINNOW_W,
)

QUERIES = {
    "text_stats": TA.text_stats,
    "text_lang_id": TA.lang_id,
    "text_vocab_top": TA.vocab_top_tokens,
    "text_fingerprints": TA.doc_fingerprints,
    "text_winnow": TA.winnow_fingerprints,  # mapInPandas, with a full SQL oracle twin
    "text_token_count": TA.token_count,
    "corpus_pipeline": TA.corpus_pipeline,
    "text_tfidf_top": TA.tfidf_top_terms,
    "corpus_pack_sequences": TA.pack_sequences,
}

# SQL-quote the BPE pattern (it contains an apostrophe)
_BPE_SQL = BPE_RE.replace("'", "''")


def _in_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
_HITS = {
    lg: f"len(list_filter({_TOKS}, t -> t IN ({_in_list(ws)})))::INT"
    for lg, ws in LANG_STOPWORDS.items()
}
_LANGS = list(LANG_STOPWORDS)
_MAX_HITS = f"greatest({', '.join(_HITS.values())})"
_GUESS_CASE = (
    "CASE "
    + " ".join(f"WHEN {_HITS[lg]} = {_MAX_HITS} THEN '{lg}'" for lg in _LANGS)
    + " END"
)

ORACLES = {
    "text_stats": f"""
WITH base AS (
  SELECT doc_id, text, {_TOKS} AS toks,
         length(text)::INT AS len_chars,
         len({_TOKS})::INT AS n_tokens,
         (length(text) - length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')))::INT AS punct,
         len(list_filter({_TOKS}, t -> t IN ({_in_list(LANG_STOPWORDS['en'])})))::INT AS stop
  FROM documents
)
SELECT doc_id, len_chars, n_tokens,
  list_sum(list_transform(toks, t -> length(t)::INT))::INT / n_tokens AS avg_token_len,
  punct / len_chars AS punct_ratio,
  stop AS n_stopwords,
  stop / n_tokens AS stopword_ratio,
  least(n_tokens / 100.0, 1.0) * 0.5 +
  least(stop / greatest(n_tokens, 1) * 10.0, 1.0) * 0.5 AS quality_score
FROM base
""",
    "text_lang_id": f"""
SELECT doc_id, lang,
  {', '.join(f'{_HITS[lg]} AS hits_{lg}' for lg in _LANGS)},
  {_GUESS_CASE} AS lang_guess
FROM documents
""",
    "text_vocab_top": f"""
SELECT token, count(*) AS n_occurrences FROM (
  SELECT unnest({_TOKS}) AS token FROM documents
) GROUP BY token ORDER BY n_occurrences DESC, token ASC LIMIT 20
""",
    "text_fingerprints": """
WITH fp AS (
  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
SELECT doc_id, fingerprint,
  (ascii(substr(fingerprint, 1, 1))::BIGINT
   + ascii(substr(fingerprint, 2, 1))::BIGINT * 31
   + ascii(substr(fingerprint, 3, 1))::BIGINT * 961
   + ascii(substr(fingerprint, 4, 1))::BIGINT * 29791
   + ascii(substr(fingerprint, 5, 1))::BIGINT * 923521
   + ascii(substr(fingerprint, 6, 1))::BIGINT * 28629151
   + ascii(substr(fingerprint, 7, 1))::BIGINT * 887503681
   + ascii(substr(fingerprint, 8, 1))::BIGINT * 27512614111) AS fp_key
FROM fp
""",
}


# Winnowing twin: the rolling hash never exceeds 2^40 (ASCII · 131^4), so the
# Python-side mod 2^61-1 is the identity and plain BIGINT polynomials in SQL
# reproduce every fingerprint exactly (validated char-for-char vs the UDF).
_WINNOW_POLY = " + ".join(
    f"ascii(substr(t, i + {j}, 1))::BIGINT * {WINNOW_B ** (WINNOW_K - 1 - j)}"
    for j in range(WINNOW_K)
)
ORACLES["text_token_count"] = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_BPE_SQL}', 0)) AS INT) AS n_bpe_tokens,
  CAST(len(regexp_extract_all(text, '\\S+', 0)) AS INT) AS n_ws_tokens,
  CASE WHEN len(regexp_extract_all(text, '{_BPE_SQL}', 0)) > 0
       THEN round(length(text) / len(regexp_extract_all(text, '{_BPE_SQL}', 0)), 6)
  END AS chars_per_token
FROM documents
"""

# Corpus-pipeline twin: same quality formula as text_stats, same md5
# content hash as text_fingerprints; the representative per duplicate
# group is the min-doc_id row (join-back replaces Spark's min_by).
ORACLES["corpus_pipeline"] = f"""
WITH scored AS (
  SELECT doc_id, lang, source,
    round(least(len({_TOKS}) / 100.0, 1.0) * 0.5 +
          least(len(list_filter({_TOKS}, t -> t IN ({_in_list(LANG_STOPWORDS['en'])})))
                / greatest(len({_TOKS}), 1) * 10.0, 1.0) * 0.5, 6)::DECIMAL(18,6) AS quality_score,
    len(regexp_extract_all(text, '{_BPE_SQL}', 0)) AS n_bpe_tokens,
    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_hash
  FROM documents
  WHERE lang = 'en'
    AND least(len({_TOKS}) / 100.0, 1.0) * 0.5 +
        least(len(list_filter({_TOKS}, t -> t IN ({_in_list(LANG_STOPWORDS['en'])})))
              / greatest(len({_TOKS}), 1) * 10.0, 1.0) * 0.5 >= 0.5
),
keep AS (
  SELECT content_hash, min(doc_id) AS doc_id FROM scored GROUP BY content_hash
)
SELECT lang, source,
  count(*) AS n_docs,
  CAST(sum(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
  floor(CAST(sum(quality_score) AS DOUBLE) / count(*) * 1000000) / 1000000 AS avg_quality
FROM scored JOIN keep USING (content_hash, doc_id)
GROUP BY lang, source
"""

ORACLES["text_winnow"] = f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents
),
hs AS (
  SELECT doc_id,
    CASE WHEN length(t) >= {WINNOW_K}
      THEN list_transform(range(1, length(t) - {WINNOW_K} + 2), i -> {_WINNOW_POLY})
      ELSE []::BIGINT[] END AS h
  FROM norm
)
SELECT doc_id,
  (CASE WHEN len(h) = 0 THEN 0
    ELSE len(list_distinct(list_transform(
      range(1, greatest(len(h) - {WINNOW_W - 1}, 1) + 1),
      i -> list_aggregate(h[i : i + {WINNOW_W - 1}], 'min'))))
  END)::INT AS n_fingerprints
FROM hs
"""

ORACLES["text_tfidf_top"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         round(tf.tf * round(ln(n.n_docs / df.df), 6), 6) AS tfidf
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
)
SELECT doc_id, token, tf, tfidf, CAST(rn AS INT) AS rn FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rn
  FROM scored
) WHERE rn <= 3
"""

QUERIES["text_bigram_logprob"] = TA.bigram_logprob_score

ORACLES["text_bigram_logprob"] = f"""
WITH tk AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
bg AS (
  SELECT doc_id, toks[gs] AS t1, toks[gs + 1] AS t2
  FROM (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS gs
    FROM tk WHERE len(toks) >= 2
  )
),
pc AS (SELECT t1, t2, count(*) AS n_pair FROM bg GROUP BY t1, t2),
hc AS (SELECT t1, count(*) AS n_head FROM bg GROUP BY t1),
pr AS (
  SELECT pc.t1, pc.t2, round(ln(n_pair / n_head), 6) AS lp
  FROM pc JOIN hc ON pc.t1 = hc.t1
)
SELECT doc_id, count(*) AS n_bigrams,
       round(CAST(sum(lp::DECIMAL(18,6)) AS DOUBLE) / count(*), 6) AS mean_logprob
FROM bg JOIN pr ON bg.t1 = pr.t1 AND bg.t2 = pr.t2
GROUP BY doc_id
"""

QUERIES["corpus_chunks"] = TA.chunk_documents

ORACLES["corpus_chunks"] = """
SELECT doc_id,
       CAST((gs - 1) // 150 AS INT) AS chunk_idx,
       CAST(length(substring(text, gs, 200)) AS INT) AS chunk_chars,
       md5(substring(text, gs, 200)) AS chunk_md5
FROM (
  SELECT doc_id, text, unnest(generate_series(1, greatest(length(text), 1), 150)) AS gs
  FROM documents
)
"""


# Concat-and-chunk packing manifest: the global window restates the
# distributed two-pass prefix sum exactly (same token counts, same
# doc_id order), and unnest(generate_series) replays the per-chunk
# segment fan-out. n_tokens = seq_len for every chunk but the last.
ORACLES["corpus_pack_sequences"] = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{_BPE_SQL}', 0)) AS BIGINT) AS n_toks
  FROM documents
),
pos AS (
  SELECT doc_id, n_toks,
         CAST(COALESCE(sum(n_toks) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
  FROM toks
),
segs AS (
  SELECT doc_id, n_toks, s,
         unnest(generate_series(s // {TA.PACK_SEQ_LEN},
                                (s + n_toks - 1) // {TA.PACK_SEQ_LEN})) AS chunk_id
  FROM pos WHERE n_toks > 0
),
seg_len AS (
  SELECT chunk_id, doc_id,
         least({TA.PACK_SEQ_LEN} * (chunk_id + 1), s + n_toks)
         - greatest({TA.PACK_SEQ_LEN} * chunk_id, s) AS seg_len
  FROM segs
)
SELECT chunk_id, count(*) AS n_segments,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(seg_len) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM seg_len GROUP BY chunk_id
"""

# r8: epoch-shuffled packing — the SAME chunk semantics over a seeded
# pseudo-random permutation; the oracle's global window restates the
# hash-domain two-pass prefix sum (order = (h, doc_id), h replayed as
# pure modular arithmetic).
QUERIES["corpus_pack_shuffled"] = TA.pack_sequences_shuffled

_SHUF_H = (
    f"((doc_id % {TA._SHUF_M}) * {TA._SHUF_A} + {TA.PACK_SHUFFLE_SEED}) % {TA._SHUF_M}"
)
ORACLES["corpus_pack_shuffled"] = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{_BPE_SQL}', 0)) AS BIGINT) AS n_toks
  FROM documents
),
pos AS (
  SELECT doc_id, n_toks,
         CAST(COALESCE(sum(n_toks) OVER (ORDER BY {_SHUF_H}, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
  FROM toks
),
segs AS (
  SELECT doc_id, n_toks, s,
         unnest(generate_series(s // {TA.PACK_SEQ_LEN},
                                (s + n_toks - 1) // {TA.PACK_SEQ_LEN})) AS chunk_id
  FROM pos WHERE n_toks > 0
),
seg_len AS (
  SELECT chunk_id, doc_id,
         least({TA.PACK_SEQ_LEN} * (chunk_id + 1), s + n_toks)
         - greatest({TA.PACK_SEQ_LEN} * chunk_id, s) AS seg_len
  FROM segs
)
SELECT chunk_id, count(*) AS n_segments,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(seg_len) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM seg_len GROUP BY chunk_id
"""


from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (  # noqa: E402
    BPE_MERGE_TOP_N,
    bpe_merge_candidates,
)

QUERIES["text_bpe_merges"] = bpe_merge_candidates

ORACLES["text_bpe_merges"] = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS tok FROM documents
),
pairs AS (
  SELECT unnest(CASE WHEN length(tok) >= 2
                     THEN list_transform(generate_series(1, length(tok) - 1),
                                         i -> substr(tok, i, 2))
                     ELSE []::VARCHAR[] END) AS pair
  FROM toks
)
SELECT pair, count(*)::BIGINT AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC LIMIT {BPE_MERGE_TOP_N}
"""


from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (  # noqa: E402
    BPE_TRAIN_ROUNDS,
    bpe_train_merges,
)

QUERIES["text_bpe_train"] = bpe_train_merges


def _bpe_pairs_from(w: str) -> str:
    return (
        "SELECT unnest(list_transform(generate_series(1, len(sym) - 1), "
        "i -> sym[i] || ' ' || sym[i+1])) AS p "
        f"FROM (SELECT list_filter(string_split(seg, '|'), x -> x <> '') AS sym FROM {w}) "
        "WHERE len(sym) >= 2"
    )


def _bpe_train_sql(n_rounds: int) -> str:
    ctes = [
        "toks AS (SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS tok FROM documents)",
        "w0 AS (SELECT regexp_replace(tok, '(.)', '|\\1|', 'g') AS seg FROM toks)",
    ]
    finals = []
    for i in range(1, n_rounds + 1):
        prev = f"w{i - 1}"
        ctes.append(
            f"c{i} AS (SELECT p, count(*) AS c FROM ({_bpe_pairs_from(prev)}) GROUP BY p)"
        )
        ctes.append(f"m{i} AS (SELECT p, c FROM c{i} ORDER BY c DESC, p ASC LIMIT 1)")
        ctes.append(
            f"w{i} AS (SELECT replace(seg, "
            f"(SELECT '|' || replace(p, ' ', '||') || '|' FROM m{i}), "
            f"(SELECT '|' || replace(p, ' ', '') || '|' FROM m{i})) AS seg FROM {prev})"
        )
        finals.append(
            f"SELECT {i} AS step, split_part(p, ' ', 1) AS left_sym, "
            f"split_part(p, ' ', 2) AS right_sym, c::BIGINT AS n_occurrences FROM m{i}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)


# the greedy merge replay: SQL replace substitutes non-overlapping
# matches left→right — exactly BPE's greedy application — so every
# round's winning rule and count replays as staged CTEs
ORACLES["text_bpe_train"] = _bpe_train_sql(BPE_TRAIN_ROUNDS)


from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (  # noqa: E402
    bpe_compression_curve,
)

QUERIES["text_bpe_compression"] = bpe_compression_curve


def _bpe_compression_sql(n_rounds: int) -> str:
    body = _bpe_train_sql(n_rounds)
    ctes = body.split("\nSELECT 1 AS step,")[0]  # reuse the CTE chain verbatim
    counts = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, sum(len(list_filter(string_split(seg, '|'), x -> x <> '')))::BIGINT"
        f" AS total_symbols FROM w{i}"
        for i in range(0, n_rounds + 1)
    )
    return ctes + "\n" + counts


ORACLES["text_bpe_compression"] = _bpe_compression_sql(BPE_TRAIN_ROUNDS)

QUERIES["text_zipf_profile"] = TA.zipf_profile

# every output is an integer ratio floor-scaled at 6 d.p.; the head set
# ties break on the token string (ASCII tokens — engine-collation-safe)
ORACLES["text_zipf_profile"] = f"""
WITH tc AS (
  SELECT source, token, count(*) AS cnt FROM (
    SELECT source, unnest({_TOKS}) AS token FROM documents
  ) GROUP BY source, token
),
ranked AS (
  SELECT source, cnt,
         row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token ASC) AS rk
  FROM tc
),
per_src AS (
  SELECT source,
         CAST(sum(cnt) AS BIGINT) AS n_tokens,
         count(*) AS vocab_size,
         CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         CAST(sum(CASE WHEN rk <= {TA.ZIPF_TOP} THEN cnt ELSE 0 END) AS BIGINT) AS head_occ
  FROM ranked GROUP BY source
)
SELECT source, n_tokens, vocab_size,
       floor(vocab_size / n_tokens * 1000000) / 1000000 AS type_token_ratio,
       floor(n_hapax / vocab_size * 1000000) / 1000000 AS hapax_frac,
       floor(head_occ / n_tokens * 1000000) / 1000000 AS head_share
FROM per_src
"""


def _compaction_plan(spark, sf_dir):
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import compaction_plan

    return compaction_plan(spark, sf_dir)


QUERIES["corpus_compaction_plan"] = _compaction_plan

from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (  # noqa: E402
    COMPACT_TARGET as _CT,
)

# exact prefix-sum replay: the oracle may use the single-task global
# window (oracle-side only; the ENGINE uses the two-pass range sum)
ORACLES["corpus_compaction_plan"] = f"""
WITH docsz AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS sz FROM documents),
pre AS (
  SELECT doc_id, sz,
         CAST(sum(sz) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - sz AS BIGINT) AS soff
  FROM docsz)
SELECT soff // {_CT} AS bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(sz) AS BIGINT) AS total_units,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM pre GROUP BY 1 ORDER BY 1
"""


from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (  # noqa: E402
    corpus_bpe_encode,
)

QUERIES["corpus_bpe_encode"] = corpus_bpe_encode


def _bpe_encode_sql(n_rounds: int) -> str:
    """The tokenizer APPLICATION replay: derive the merge rules from the
    training CTE chain (verbatim reuse), then re-apply each rule's
    greedy replace over a doc-keyed segmentation and aggregate per doc."""
    body = _bpe_train_sql(n_rounds)
    ctes = body.split("\nSELECT 1 AS step,")[0]  # rules m1..mN + words CTEs
    extra = [
        "d0 AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS tok FROM documents)",
        "e0 AS (SELECT doc_id, length(tok) AS n_chars, regexp_replace(tok, '(.)', '|\\1|', 'g') AS seg FROM d0)",
    ]
    for i in range(1, n_rounds + 1):
        extra.append(
            f"e{i} AS (SELECT doc_id, n_chars, replace(seg, "
            f"(SELECT '|' || replace(p, ' ', '||') || '|' FROM m{i}), "
            f"(SELECT '|' || replace(p, ' ', '') || '|' FROM m{i})) AS seg FROM e{i - 1})"
        )
    return (
        ctes
        + ",\n"
        + ",\n".join(extra)
        + f"""
SELECT doc_id,
       count(*)::BIGINT AS n_words,
       CAST(sum(n_chars) AS BIGINT) AS n_char_symbols,
       CAST(sum(len(list_filter(string_split(seg, '|'), x -> x <> ''))) AS BIGINT)
         AS n_bpe_tokens
FROM e{n_rounds} GROUP BY doc_id"""
    )


ORACLES["corpus_bpe_encode"] = _bpe_encode_sql(BPE_TRAIN_ROUNDS)


from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (  # noqa: E402
    tokenizer_state_roundtrip,
)

QUERIES["tokenizer_state_roundtrip"] = tokenizer_state_roundtrip

# the persisted rule file must equal the in-session training exactly —
# the oracle IS the training replay
ORACLES["tokenizer_state_roundtrip"] = _bpe_train_sql(BPE_TRAIN_ROUNDS)


# --- r7: typo-pair mining over the vocabulary (SymSpell, dist <= 2) -----------
QUERIES["text_typo_pairs"] = TA.text_typo_pairs

# full replay: tokenize -> vocab counts -> length cut -> <=2-deletion
# variants (d2 = deletions of d1, exactly the Spark HOF nesting) ->
# shared-variant join -> levenshtein verify. Tokens are ASCII by
# TOKEN_RE, so the < orientation collates identically. Duplicate
# variants per token are harmless: the pair DISTINCT collapses the
# extra matches (Spark's array_distinct is a perf nicety, not load-
# bearing for values).
ORACLES["text_typo_pairs"] = f"""
WITH vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest({_TOKS}) AS token FROM documents
  ) GROUP BY token HAVING length(token) >= 3
),
vd1 AS (
  SELECT token, n,
         list_transform(range(1, length(token) + 1),
                        i -> substr(token, 1, i - 1) || substr(token, i + 1, length(token))) AS d1
  FROM vocab
),
vars AS (
  SELECT token, n,
         unnest(list_concat(list_concat([token], d1),
           flatten(list_transform(d1, v ->
             list_transform(range(1, length(v) + 1),
                            i -> substr(v, 1, i - 1) || substr(v, i + 1, length(v))))))) AS variant
  FROM vd1
)
SELECT DISTINCT a.token AS token_a, b.token AS token_b,
       a.n AS n_a, b.n AS n_b,
       CAST(levenshtein(a.token, b.token) AS INT) AS dist
FROM vars a JOIN vars b ON a.variant = b.variant AND a.token < b.token
WHERE levenshtein(a.token, b.token) <= 2
"""


# --- r7: spell-cluster canonicalization (components over typo pairs) ----------
QUERIES["text_typo_clusters"] = TA.text_typo_clusters

# same vocab/variant/verify stages as text_typo_pairs, then transitive
# closure as UNION-dedup'd reachability with min(reachable) ≙ the
# Spark side's min-label fixpoint. The RECURSIVE block is scoped to an
# inner subquery (top-level WITH RECURSIVE perturbs DuckDB's planning
# of sibling non-recursive CTEs — the r6 dedup_semantic_graph lesson).
ORACLES["text_typo_clusters"] = f"""
WITH vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest({_TOKS}) AS token FROM documents
  ) GROUP BY token
),
vc AS (SELECT token, n FROM vocab WHERE length(token) >= 3),
vd1 AS (
  SELECT token,
         list_transform(range(1, length(token) + 1),
                        i -> substr(token, 1, i - 1) || substr(token, i + 1, length(token))) AS d1
  FROM vc
),
vars AS (
  SELECT token,
         unnest(list_concat(list_concat([token], d1),
           flatten(list_transform(d1, v ->
             list_transform(range(1, length(v) + 1),
                            i -> substr(v, 1, i - 1) || substr(v, i + 1, length(v))))))) AS variant
  FROM vd1
),
tp AS (
  SELECT DISTINCT a.token AS ta, b.token AS tb
  FROM vars a JOIN vars b ON a.variant = b.variant AND a.token < b.token
  WHERE levenshtein(a.token, b.token) <= 2
),
tedges AS (SELECT ta AS a, tb AS b FROM tp UNION ALL SELECT tb, ta FROM tp)
SELECT token, n, component FROM (
  WITH RECURSIVE treach(src, dst) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM tedges)
    UNION
    SELECT r.src, e.b FROM treach r JOIN tedges e ON r.dst = e.a)
  SELECT src AS token, min(dst) AS component FROM treach GROUP BY src
) JOIN vocab USING (token)
"""
