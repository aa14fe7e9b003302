"""Dedup query family (EXT surface, SURVEY.md §2.3).

The MinHash/SimHash oracles are generated from the SAME constants as
the Spark operators (``operators/dedup.py``), and the shingle hash is
plain code-point arithmetic, so DuckDB reproduces every signature
bit-for-bit.
"""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators import dedup as D
from gpu_accelerated_vector_indexing_spark.operators.dedup import (
    HASH_MOD,
    MINHASH_AS,
    MINHASH_BS,
    MINHASH_PRIME,
    N_BANDS,
    N_MINHASH,
    ROWS_PER_BAND,
    SHINGLE_LEN,
    SIMHASH_AS,
    SIMHASH_BAND_BITS,
    SIMHASH_BITS,
    SIMHASH_SHIFT,
)

QUERIES = {
    "dedup_exact_summary": D.exact_dedup_summary,
    "dedup_exact_keep": D.exact_dedup_keep,
    "dedup_minhash_lsh": D.minhash_lsh_pairs,
    "dedup_simhash_pairs": D.simhash_pairs,
    "dedup_ngram_jaccard": D.ngram_jaccard_pairs,
    "dedup_jaccard_verified_lsh": D.jaccard_verified_lsh,
    "dedup_embedding_topk": D.embedding_neardup_topk,
    "dedup_components": D.duplicate_components,
    "dedup_keep_canonical": D.dedup_keep_canonical,
    "dedup_corpus_overlap": D.corpus_source_overlap,
}

# --- shared SQL fragments ----------------------------------------------------

_POLY = " + ".join(
    f"ascii(substr(s, {i}, 1))::BIGINT * {31 ** (SHINGLE_LEN - i)}"
    for i in range(1, SHINGLE_LEN + 1)
)

# per-position shingle hash straight off the text (≙ operators.dedup.raw_shingle_hashes)
_GH_POLY = " + ".join(
    f"ascii(substr(text, i + {j - 1}, 1))::BIGINT * {31 ** (SHINGLE_LEN - j)}"
    for j in range(1, SHINGLE_LEN + 1)
)

_SHINGLE_CTES = f"""
WITH sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) - {SHINGLE_LEN - 1} + 1),
                               i -> substr(text, i, {SHINGLE_LEN}))) AS s
  FROM documents WHERE length(text) >= {SHINGLE_LEN}
),
h AS (SELECT doc_id, ({_POLY}) % {HASH_MOD} AS h FROM sh)
"""

_SIG_COLS = ", ".join(
    f"min(({a}::BIGINT * h + {b}) % {MINHASH_PRIME}) AS m{i}"
    for i, (a, b) in enumerate(zip(MINHASH_AS, MINHASH_BS))
)

_BAND_SELECTS = " UNION ALL ".join(
    "SELECT doc_id, {b} AS band, concat_ws('-', {cols}) AS key FROM sig".format(
        b=b, cols=", ".join(f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    )
    for b in range(N_BANDS)
)

_AGREE = " + ".join(f"(a.m{i} = b.m{i})::INT" for i in range(N_MINHASH))

_SIM_SUMS = ", ".join(
    f"sum((((h * {SIMHASH_AS[j]}) >> {SIMHASH_SHIFT}) & 1) * 2 - 1) AS s{j}"
    for j in range(SIMHASH_BITS)
)
# bit 63 → two's-complement minimum; written (−(2^63−1) − 1) because a bare
# −9223372036854775808 literal parses as minus(out-of-range positive)
_SIM_FP = " + ".join(
    f"(CASE WHEN s{j} > 0 THEN "
    + (f"{2**j}::BIGINT" if j < 63 else f"(-{2**63 - 1}::BIGINT - 1)")
    + " ELSE 0 END)"
    for j in range(SIMHASH_BITS)
)

ORACLES = {
    "dedup_exact_summary": """
WITH g AS (SELECT md5(text) AS text_hash, count(*) AS n_copies FROM documents GROUP BY 1)
SELECT CAST(sum(n_copies) AS BIGINT) AS n_docs,
       count(*) AS n_distinct,
       CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
FROM g
""",
    "dedup_exact_keep": """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
""",
    "dedup_minhash_lsh": _SHINGLE_CTES
    + f""",
sig AS (SELECT doc_id, {_SIG_COLS} FROM h GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b, ({_AGREE}) / {N_MINHASH}.0 AS est_jaccard
FROM cand c JOIN sig a ON a.doc_id = c.doc_a JOIN sig b ON b.doc_id = c.doc_b
WHERE ({_AGREE}) / {N_MINHASH}.0 >= 0.5
""",
    "dedup_simhash_pairs": _SHINGLE_CTES
    + f""",
sums AS (SELECT doc_id, {_SIM_SUMS} FROM h GROUP BY doc_id),
fp AS (SELECT doc_id, {_SIM_FP} AS simhash FROM sums),
bands AS (
  SELECT doc_id, simhash, i AS bpos,
         (simhash >> ({SIMHASH_BAND_BITS} * i)) & {(1 << SIMHASH_BAND_BITS) - 1} AS bval
  FROM fp CROSS JOIN range(0, {SIMHASH_BITS // SIMHASH_BAND_BITS}) t(i)
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.simhash AS ha, y.simhash AS hb
  FROM bands x JOIN bands y ON x.bpos = y.bpos AND x.bval = y.bval AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
""",
    # LSH candidates (same CTEs as minhash) verified by exact Jaccard over
    # the same int64 shingle hashes as the exhaustive variant
    "dedup_jaccard_verified_lsh": _SHINGLE_CTES
    + f""",
sig AS (SELECT doc_id, {_SIG_COLS} FROM h GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - {SHINGLE_LEN - 1}, 1) + 1),
                                      i -> {_GH_POLY})) AS gh
  FROM documents
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(a.gh, b.gh)) /
         (len(a.gh) + len(b.gh) - len(list_intersect(a.gh, b.gh))) AS jaccard
  FROM cand c JOIN grams a ON a.doc_id = c.doc_a JOIN grams b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM verified WHERE jaccard >= 0.6
""",
    "dedup_ngram_jaccard": f"""
WITH d AS (
  SELECT doc_id, lang, length(text) // 64 AS lbucket,
         list_distinct(list_transform(range(1, greatest(length(text) - {SHINGLE_LEN - 1}, 1) + 1),
                                      i -> {_GH_POLY})) AS gh
  FROM documents
)
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       round(len(list_intersect(x.gh, y.gh)) /
             (len(x.gh) + len(y.gh) - len(list_intersect(x.gh, y.gh))), 6) AS jaccard
FROM d x JOIN d y ON x.lang = y.lang AND x.lbucket = y.lbucket AND x.doc_id < y.doc_id
WHERE len(list_intersect(x.gh, y.gh)) /
      (len(x.gh) + len(y.gh) - len(list_intersect(x.gh, y.gh))) >= 0.6
""",
    "dedup_embedding_topk": """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       round(list_dot_product(x.v, y.v) /
             (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)) + 1e-8), 6) AS cos_sim
FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id
ORDER BY cos_sim DESC, vec_a DESC, vec_b DESC LIMIT 20
""",
    # corpus-level overlap: the source signature is min-over-docs of the
    # per-doc MinHash = min over the source's distinct shingle-hash set,
    # so the oracle minimizes straight off the source-level distinct set
    "dedup_corpus_overlap": f"""
WITH sh0 AS (
  SELECT source,
         unnest(list_transform(range(1, length(text) - {SHINGLE_LEN - 1} + 1),
                               i -> substr(text, i, {SHINGLE_LEN}))) AS s
  FROM documents WHERE length(text) >= {SHINGLE_LEN}
),
h AS (SELECT DISTINCT source, ({_POLY}) % {HASH_MOD} AS h FROM sh0),
sig AS (SELECT source, {_SIG_COLS} FROM h GROUP BY source),
sz AS (SELECT source, count(*) AS n_sh FROM h GROUP BY source),
inter AS (
  SELECT x.source AS src_a, y.source AS src_b, count(*) AS n_inter
  FROM h x JOIN h y ON x.h = y.h AND x.source < y.source
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(({_AGREE}) AS BIGINT) AS n_match
  FROM sig a JOIN sig b ON a.source < b.source
)
SELECT p.src_a, p.src_b, p.n_match,
       p.n_match / {N_MINHASH}.0 AS est_jaccard,
       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       floor(COALESCE(i.n_inter, 0)
             / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0)) * 1000000) / 1000000 AS jac_exact
FROM pairs p
LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
JOIN sz za ON za.source = p.src_a
JOIN sz zb ON zb.source = p.src_b
""",
}

# Connected components: the transitive closure is restated in DuckDB as
# a recursive CTE (UNION-dedup'd reachability), grounded on the SAME
# exact-Jaccard edge SQL as dedup_ngram_jaccard; min(reachable id) ≙ the
# fixpoint of Spark's min-label propagation.
_COMPONENTS_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, lang, length(text) // 64 AS lbucket,
         list_distinct(list_transform(range(1, greatest(length(text) - {SHINGLE_LEN - 1}, 1) + 1),
                                      i -> {_GH_POLY})) AS gh
  FROM documents
),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM d x JOIN d y ON x.lang = y.lang AND x.lbucket = y.lbucket AND x.doc_id < y.doc_id
  WHERE len(list_intersect(x.gh, y.gh)) /
        (len(x.gh) + len(y.gh) - len(list_intersect(x.gh, y.gh))) >= 0.6
),
edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
reach(src, dst) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src)
"""

ORACLES["dedup_components"] = _COMPONENTS_SQL + "SELECT doc_id, component FROM comp"
ORACLES["dedup_keep_canonical"] = _COMPONENTS_SQL + """
SELECT component, count(*) AS n_docs, min(doc_id) AS keep_doc,
       count(*) - 1 AS n_dropped
FROM comp GROUP BY component
"""

# r8: dedup → packing composition — pack ONLY the canonical keeps.
# The oracle extends the SAME recursive-closure component SQL with the
# keep-list and replays the doc_id-order packing CTEs over it.
QUERIES["corpus_dedup_pack"] = D.dedup_pack_manifest


def _dedup_pack_sql() -> str:
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        BPE_RE,
        PACK_SEQ_LEN,
    )

    bpe_sql = BPE_RE.replace("'", "''")
    L = PACK_SEQ_LEN
    return (
        _COMPONENTS_SQL
        + f""",
keepers AS (SELECT min(doc_id) AS doc_id FROM comp GROUP BY component),
dropped AS (
  SELECT doc_id FROM comp WHERE doc_id NOT IN (SELECT doc_id FROM keepers)
),
ptoks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{bpe_sql}', 0)) AS BIGINT) AS n_toks
  FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
),
pos AS (
  SELECT doc_id, n_toks,
         CAST(COALESCE(sum(n_toks) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
  FROM ptoks
),
segs AS (
  SELECT doc_id, n_toks, s,
         unnest(generate_series(s // {L}, (s + n_toks - 1) // {L})) AS chunk_id
  FROM pos WHERE n_toks > 0
),
seg_len AS (
  SELECT chunk_id, doc_id,
         least({L} * (chunk_id + 1), s + n_toks)
         - greatest({L} * chunk_id, s) AS seg_len
  FROM segs
)
SELECT chunk_id, count(*) AS n_segments,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(seg_len) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM seg_len GROUP BY chunk_id
"""
    )


ORACLES["corpus_dedup_pack"] = _dedup_pack_sql()


from gpu_accelerated_vector_indexing_spark.operators.dedup import (  # noqa: E402
    INCR_BATCH_MOD,
    INCR_BATCH_REM,
    INCR_THRESHOLD,
)

QUERIES["dedup_incremental_batch"] = D.incremental_dedup

# batch×archive band join (never archive self-join), exact-Jaccard
# verify, deterministic best-match pick, left-joined batch spine
ORACLES["dedup_incremental_batch"] = _SHINGLE_CTES + f""",
sig AS (SELECT doc_id, {_SIG_COLS} FROM h GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
cand AS (
  SELECT DISTINCT x.doc_id AS new_doc_id, y.doc_id AS corpus_doc_id
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
  WHERE x.doc_id % {INCR_BATCH_MOD} = {INCR_BATCH_REM}
    AND y.doc_id % {INCR_BATCH_MOD} <> {INCR_BATCH_REM}
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - {SHINGLE_LEN - 1}, 1) + 1),
                                      i -> {_GH_POLY})) AS gh
  FROM documents WHERE length(text) >= {SHINGLE_LEN}
),
verified AS (
  SELECT c.new_doc_id, c.corpus_doc_id,
         round(len(list_intersect(a.gh, b.gh)) /
               (len(a.gh) + len(b.gh) - len(list_intersect(a.gh, b.gh))), 6) AS jaccard
  FROM cand c JOIN grams a ON a.doc_id = c.new_doc_id
              JOIN grams b ON b.doc_id = c.corpus_doc_id
),
best AS (
  SELECT new_doc_id, corpus_doc_id, jaccard FROM (
    SELECT *, row_number() OVER (PARTITION BY new_doc_id
                                 ORDER BY jaccard DESC, corpus_doc_id DESC) AS rn
    FROM verified
  ) WHERE rn = 1
)
SELECT d.doc_id AS new_doc_id,
       coalesce(b.jaccard, 0.0) AS best_jaccard,
       b.corpus_doc_id AS best_match_doc_id,
       coalesce(b.jaccard, 0.0) >= {INCR_THRESHOLD} AS is_duplicate
FROM (SELECT doc_id FROM documents WHERE doc_id % {INCR_BATCH_MOD} = {INCR_BATCH_REM}) d
LEFT JOIN best b ON b.new_doc_id = d.doc_id
"""


QUERIES["dedup_state_roundtrip"] = D.dedup_state_roundtrip

# the persisted state must carry the SAME values the oracle derives
# straight from the text: signature sums + distinct-shingle totals
ORACLES["dedup_state_roundtrip"] = _SHINGLE_CTES + f""",
sig AS (SELECT doc_id, {_SIG_COLS} FROM h GROUP BY doc_id),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - {SHINGLE_LEN - 1}, 1) + 1),
                                      i -> {_GH_POLY})) AS gh
  FROM documents WHERE length(text) >= {SHINGLE_LEN}
)
SELECT (SELECT count(*)::BIGINT FROM sig) AS n_sig_docs,
       (SELECT sum(m0)::BIGINT FROM sig) AS sum_m0,
       (SELECT sum(m7)::BIGINT FROM sig) AS sum_m7,
       (SELECT sum(m15)::BIGINT FROM sig) AS sum_m15,
       (SELECT count(*)::BIGINT FROM grams) AS n_gram_docs,
       (SELECT sum(len(gh))::BIGINT FROM grams) AS total_grams
"""


QUERIES["dedup_substring_spans"] = D.substring_spans

# Exact duplicated k-token spans (Lee et al. 2021 style). The window
# string itself is the join key on both sides, so counts agree exactly;
# the one double (dup_ratio) is an int/int division rounded to 6 d.p.
ORACLES["dedup_substring_spans"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{D.SPAN_TOKEN_RE}') AS t
  FROM documents
),
wins AS (
  SELECT DISTINCT doc_id,
         list_aggregate(list_slice(t, i, i + {D.SPAN_K - 1}), 'string_agg', ' ') AS win
  FROM toks, LATERAL unnest(generate_series(1, len(t) - {D.SPAN_K - 1})) AS r(i)
  WHERE len(t) >= {D.SPAN_K}
),
dup AS (SELECT win FROM wins GROUP BY win HAVING count(*) >= 2),
tot AS (SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY doc_id),
dups AS (
  SELECT w.doc_id, count(*) AS n_dup_windows
  FROM wins w JOIN dup USING (win) GROUP BY w.doc_id
)
SELECT t.doc_id, t.n_windows, d.n_dup_windows,
       floor(d.n_dup_windows / t.n_windows * 1000000) / 1000000 AS dup_ratio
FROM tot t JOIN dups d USING (doc_id)
"""

QUERIES["dedup_substring_spans_hashed"] = D.substring_spans_hashed

# Scale twin (xxhash64 window keys + stride): hashing only changes the
# SHUFFLE KEY, so the per-doc counts equal the string-keyed computation
# absent 64-bit collisions (≈|windows|²/2⁶⁴ — negligible, deterministic
# at a fixed sf; stride-1 equality with the string form is pinned in
# tests). The oracle is therefore the STRING-keyed SQL with the same
# stride — the curation_decontaminate_hashed template.
ORACLES["dedup_substring_spans_hashed"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{D.SPAN_TOKEN_RE}') AS t
  FROM documents
),
wins AS (
  SELECT DISTINCT doc_id,
         list_aggregate(list_slice(t, i, i + {D.SPAN_K - 1}), 'string_agg', ' ') AS win
  FROM toks, LATERAL unnest(generate_series(1, len(t) - {D.SPAN_K - 1}, {D.SPAN_STRIDE})) AS r(i)
  WHERE len(t) >= {D.SPAN_K}
),
dup AS (SELECT win FROM wins GROUP BY win HAVING count(*) >= 2),
tot AS (SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY doc_id),
dups AS (
  SELECT w.doc_id, count(*) AS n_dup_windows
  FROM wins w JOIN dup USING (win) GROUP BY w.doc_id
)
SELECT t.doc_id, t.n_windows, d.n_dup_windows,
       floor(d.n_dup_windows / t.n_windows * 1000000) / 1000000 AS dup_ratio
FROM tot t JOIN dups d USING (doc_id)
"""


QUERIES["sample_split_leakage_safe"] = D.train_split_leakage_safe

from gpu_accelerated_vector_indexing_spark.operators.approx import (  # noqa: E402
    HASH_A as _SA,
    HASH_B as _SB,
    HASH_M as _SM,
    TRAIN_FRAC as _STR,
    VAL_FRAC as _SVA,
)

_GK_HASH = f"(((group_key % {_SM}) * {_SA} + {_SB}) % {_SM}) / {float(_SM)}"

ORACLES["sample_split_leakage_safe"] = _COMPONENTS_SQL + f"""
, keyed AS (
  SELECT doc.doc_id, doc.lang, coalesce(c.component, doc.doc_id) AS group_key
  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.doc_id
)
SELECT doc_id, lang, group_key,
  CASE WHEN {_GK_HASH} < {_STR} THEN 'train'
       WHEN {_GK_HASH} < {_STR + _SVA} THEN 'val'
       ELSE 'test' END AS split
FROM keyed
"""


# --- embedding near-dup via banded hyperplane LSH (r5) ------------------------
# The oracle recomputes the SAME deterministic banded signatures: the
# integer hyperplanes come from the shared hyperplanes() constants and
# both engines quantize to integer-valued doubles first (the lsh_q
# recipe), so buckets, candidate pairs, and scores match bit-for-bit.
from gpu_accelerated_vector_indexing_spark.operators.lsh_ann import (  # noqa: E402
    hyperplanes as _emb_hyperplanes,
)

QUERIES["dedup_embedding_lsh"] = D.embedding_neardup_lsh

_EPLANES = _emb_hyperplanes(D.EMB_LSH_BANDS * D.EMB_LSH_ROWS)
_EQV = "list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0))"


def _eplane_sql(row: list[int]) -> str:
    return "[" + ",".join(str(float(w)) for w in row) + "]::DOUBLE[]"


def _eband_sig_sql(band: int) -> str:
    bits = " + ".join(
        f"(CASE WHEN list_dot_product({_EQV},"
        f" {_eplane_sql(_EPLANES[band * D.EMB_LSH_ROWS + j])}) >= 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(D.EMB_LSH_ROWS)
    )
    return f"({bits})::BIGINT"


_EBAND_SELECTS = "\nUNION ALL\n".join(
    f"SELECT vec_id, {b} AS band, {_eband_sig_sql(b)} AS bucket FROM embeddings"
    for b in range(D.EMB_LSH_BANDS)
)

ORACLES["dedup_embedding_lsh"] = f"""
WITH sigs AS ({_EBAND_SELECTS}),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM sigs x JOIN sigs y
    ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT c.vec_a, c.vec_b,
       round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) + 1e-8),
             6) AS cos_sim
FROM cand c JOIN e a ON a.vec_id = c.vec_a JOIN e b ON b.vec_id = c.vec_b
ORDER BY cos_sim DESC, vec_a DESC, vec_b DESC LIMIT 20
"""


# --- SemDeDup-style semantic components mined from the ANN graph (r5) ---------
# Candidates are FREE: the NN-descent edge list is already materialized
# index state, so the oracle replays the graph build (shared staged
# CTEs), thresholds, then computes exact components via a RECURSIVE-CTE
# transitive closure — a true fixpoint, matching the Spark side's
# min_label_fixpoint at any chain depth (no fixed round count).
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    graph_build_ctes as _graph_build_ctes,
)

QUERIES["dedup_semantic_graph"] = D.semantic_graph_components


def _semantic_graph_sql(tau: float = 0.42) -> str:
    # The RECURSIVE scope is the INNER subquery only: a top-level WITH
    # RECURSIVE makes DuckDB 1.0.0 re-plan the (deterministic) build
    # CTEs inconsistently — g0's edge set itself changes with the bare
    # keyword present. Scoping recursion to a subquery leaves the build
    # under plain WITH and only the closure recursive.
    ctes, g = _graph_build_ctes()
    parts = [
        ctes,
        f"sge AS (SELECT node, nbr FROM {g} WHERE score >= {tau})",
        """sgu AS MATERIALIZED (SELECT DISTINCT node, nbr FROM (
  SELECT node, nbr FROM sge UNION ALL SELECT nbr AS node, node AS nbr FROM sge))""",
    ]
    joined = ",\n".join(parts)
    return f"""WITH {joined}
SELECT vec_id, component FROM (
  WITH RECURSIVE sgreach(node, r) AS (
    SELECT node, node FROM (SELECT DISTINCT node FROM sgu)
    UNION
    SELECT sgreach.node, sgu.nbr FROM sgreach JOIN sgu ON sgu.node = sgreach.r)
  SELECT node AS vec_id, min(r) AS component FROM sgreach GROUP BY node
)"""


ORACLES["dedup_semantic_graph"] = _semantic_graph_sql()


# --- r7: asymmetric containment dedup ---------------------------------------

QUERIES["dedup_containment"] = D.containment_pairs

# same df-capped posting-list candidates + exact full-set verification
ORACLES["dedup_containment"] = f"""
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - {SHINGLE_LEN - 1}, 1) + 1),
                                      i -> {_GH_POLY})) AS gh
  FROM documents
),
posts AS (SELECT doc_id, unnest(gh) AS h FROM grams),
rare AS (
  SELECT h FROM (SELECT h, count(*) AS df FROM posts GROUP BY h)
  WHERE df <= {D.CONTAIN_DF_CAP}
),
pr AS (SELECT p.doc_id, p.h FROM posts p JOIN rare USING (h)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pr a JOIN pr b ON a.h = b.h AND a.doc_id < b.doc_id
),
v AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(a.gh, b.gh))::INT AS shared,
         least(len(a.gh), len(b.gh)) AS m
  FROM cand c JOIN grams a ON a.doc_id = c.doc_a JOIN grams b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, shared, round(shared / m, 6) AS containment
FROM v WHERE shared / m >= {D.CONTAIN_TAU}
"""


QUERIES["corpus_ngram_novelty"] = D.ngram_novelty
ORACLES["corpus_ngram_novelty"] = f"""
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - {SHINGLE_LEN - 1}, 1) + 1),
                                      i -> {_GH_POLY})) AS gh
  FROM documents
),
posts AS (SELECT doc_id, unnest(gh) AS h FROM grams),
dfreq AS (SELECT h, count(*) AS df FROM posts GROUP BY h)
SELECT p.doc_id,
       count(*)::BIGINT AS n_shingles,
       CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       round(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) / count(*), 6) AS novelty
FROM posts p JOIN dfreq d USING (h)
GROUP BY p.doc_id
"""
