"""KNN query family (SURVEY.md §2: O6-O8, O12, O13, O19 + multi-query).

Oracle policy: cosine math is replicated in DuckDB in float64
(``embedding::DOUBLE[]``) with the reference's ``+1e-8`` guard
(IVF.cpp:150), rounded to 6 d.p. on both sides, tie-broken
``(score DESC, vec_id DESC)`` (IVF.cpp:247).
"""

from __future__ import annotations

from functools import partial

from gpu_accelerated_vector_indexing_spark.operators import knn

# Shared parameters — keep Spark callables and oracle SQL in lockstep.
QUERY_ID = 0
K = 5
MULTI_QUERY_IDS = (0, 1, 2, 3, 4)

_COS = (
    "round(list_dot_product(e.embedding::DOUBLE[], q.qvec) /"
    " (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qvec, q.qvec)) + 1e-8), 6)"
)

def _embed_and_search(spark, sf_dir):
    """End-to-end O20+O25 pipeline: hash-embed the corpus, hash-embed a
    query STRING, brute-force top-k — the reference's whole
    text→vector→search lifecycle with the deterministic featurizer,
    under the full value-hash oracle (the md5 hashing featurizer is
    restated literally in SQL below, float32 round-trip included)."""
    from pyspark.sql import functions as F

    from gpu_accelerated_vector_indexing_spark.functions.embedder import embed_documents, embed_queries
    from gpu_accelerated_vector_indexing_spark.functions.vector import as_double_array, cosine_similarity
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = embed_documents(docs)
    # query drawn from the fixture vocabulary so bucket overlap (and the
    # resulting ranking) is non-degenerate
    q = embed_queries(spark, ["hash table merge join"])
    return (
        corpus.join(F.broadcast(q))
        .select(
            "doc_id",
            F.round(
                cosine_similarity(as_double_array("embedding"), F.col("qvec")), 6
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc("doc_id"))
        .limit(K)
    )


def _knn_sq8(spark, sf_dir):
    from gpu_accelerated_vector_indexing_spark.operators.quantize import knn_sq8

    return knn_sq8(spark, sf_dir, query_id=QUERY_ID, k=K)


def _knn_pq(spark, sf_dir):
    """Product-quantized ANN under a FULL value oracle: the codebook fit
    is deterministic (first-k init, fixed rounded Lloyd iterations), so
    the oracle replays the training as staged CTEs (queries/_pq_oracle)
    and re-derives the identical candidate set + exact rescore. Recall
    floor / full-margin-equality invariants stay in tests/test_knn.py."""
    from gpu_accelerated_vector_indexing_spark.operators.quantize import knn_pq

    return knn_pq(spark, sf_dir, query_id=QUERY_ID, k=K)


QUERIES = {
    "knn_bruteforce": partial(knn.knn_bruteforce, query_id=QUERY_ID, k=K),
    "knn_sq8": _knn_sq8,
    "knn_pq": _knn_pq,
    "knn_prenorm": partial(knn.knn_prenorm, query_id=QUERY_ID, k=K),
    "knn_bruteforce_pandas": partial(knn.knn_bruteforce, query_id=QUERY_ID, k=K, use_pandas=True),
    "knn_with_docs": partial(knn.knn_with_docs, query_id=QUERY_ID, k=K),
    "knn_filtered": partial(knn.knn_filtered, query_id=QUERY_ID, k=K, lang="en"),
    "similarity_range_search": partial(
        knn.similarity_range_search, query_id=QUERY_ID, threshold=0.3
    ),
    "multi_query_knn": partial(knn.multi_query_knn, query_ids=MULTI_QUERY_IDS, k=K),
    "embed_and_search": _embed_and_search,
}

ORACLES = {
    "knn_bruteforce": f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
scored AS (
  SELECT e.vec_id, {_COS} AS score
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id DESC LIMIT {K}
""",
    "knn_with_docs": f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
scored AS (
  SELECT e.vec_id, {_COS} AS score
  FROM embeddings e CROSS JOIN q
),
topk AS (SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id DESC LIMIT {K})
SELECT t.vec_id, t.score, substr(d.text, 1, 200) AS snippet
FROM documents d JOIN topk t ON d.doc_id = t.vec_id
""",
    "multi_query_knn": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
  FROM embeddings WHERE vec_id IN {tuple(MULTI_QUERY_IDS)}
),
scored AS (
  SELECT q.query_id, e.vec_id, {_COS} AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id DESC) AS rn
  FROM scored
)
SELECT query_id, vec_id, score, CAST(rn AS INT) AS rn FROM ranked WHERE rn <= {K}
""",
}
ORACLES["knn_filtered"] = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
scored AS (
  SELECT e.vec_id, {_COS} AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
)
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id DESC LIMIT {K}
"""
ORACLES["similarity_range_search"] = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
scored AS (
  SELECT e.vec_id, {_COS} AS score
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, score FROM scored WHERE score >= 0.3
"""
# knn_bruteforce_pandas: same semantics as knn_bruteforce through the
# NumPy kernel path — reuse the same oracle.
ORACLES["knn_bruteforce_pandas"] = ORACLES["knn_bruteforce"]
def _knn_bq(spark, sf_dir):
    from gpu_accelerated_vector_indexing_spark.operators.quantize import knn_bq

    return knn_bq(spark, sf_dir, query_id=QUERY_ID, k=K)


# knn_bq: 1-bit Hamming candidate scan + exact rescore returns exactly
# the brute-force top-k at the fixture margin (pinned in tests), so the
# oracle is the exact brute-force SQL — same contract as knn_sq8.
QUERIES["knn_bq"] = _knn_bq

# knn_sq8: quantized candidate scan + exact rescore MUST return the
# brute-force result (candidate margin ≫ quantization rank error) —
# the approx-equals-exact contract, same oracle.
ORACLES["knn_sq8"] = ORACLES["knn_bruteforce"]
ORACLES["knn_bq"] = ORACLES["knn_bruteforce"]
# knn_prenorm: normalize-once then bare dot — the exact same arithmetic
# replicated (normalize with the +1e-8 guard, then dot), IEEE-identical.
_NORM = "list_transform({v}, x -> x / (sqrt(list_dot_product({v}, {v})) + 1e-8))"
ORACLES["knn_prenorm"] = f"""
WITH q AS (
  SELECT {_NORM.format(v='embedding::DOUBLE[]')} AS nq
  FROM embeddings WHERE vec_id = {QUERY_ID}
),
scored AS (
  SELECT e.vec_id,
         round(list_dot_product({_NORM.format(v='e.embedding::DOUBLE[]')}, q.nq), 6) AS score
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id DESC LIMIT {K}
"""


def _hybrid_search_rrf(spark, sf_dir):
    from gpu_accelerated_vector_indexing_spark.operators.hybrid import hybrid_search_rrf

    return hybrid_search_rrf(spark, sf_dir, query_id=QUERY_ID, k=10)


QUERIES["hybrid_search_rrf"] = _hybrid_search_rrf

_HTOKS = "regexp_extract_all(lower(text), '[A-Za-z0-9]+')"

# Shared CTE prefix of both hybrid oracles: tokenization → BM25 → cosine.
_HYBRID_BASE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_HTOKS}) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
corpus AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
),
q_terms AS (
  SELECT DISTINCT unnest({_HTOKS}) AS token FROM documents WHERE doc_id = {QUERY_ID}
),
bm25 AS (
  SELECT tf.doc_id,
         CAST(sum(CAST(round(
           round(ln(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5)), 6)
           * ((tf.tf * {1.2 + 1}) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / c.avgdl)))
         , 6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
  FROM tf
  JOIN q_terms USING (token)
  JOIN df USING (token)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN corpus c
  GROUP BY tf.doc_id
),
q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
cos AS (
  SELECT e.vec_id AS doc_id,
         round(list_dot_product(e.embedding::DOUBLE[], q.qvec) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.qvec, q.qvec)) + 1e-8), 6) AS cos
  FROM embeddings e CROSS JOIN q
)"""

ORACLES["hybrid_search_rrf"] = (
    _HYBRID_BASE
    + """,
cr AS (
  SELECT doc_id, cos, row_number() OVER (ORDER BY cos DESC, doc_id DESC) AS cos_rank FROM cos
),
br AS (
  SELECT doc_id, bm25, row_number() OVER (ORDER BY bm25 DESC, doc_id DESC) AS bm25_rank FROM bm25
)
SELECT doc_id, cos, coalesce(bm25, 0.0) AS bm25,
       1.0 / (60 + cos_rank) + coalesce(1.0 / (60 + bm25_rank), 0.0) AS rrf
FROM cr LEFT JOIN br USING (doc_id)
ORDER BY rrf DESC, doc_id DESC LIMIT 10
"""
)


def _mmr_rerank(spark, sf_dir):
    """Greedy MMR over the bounded candidate head; the k-stage oracle
    below replays the same selection in SQL."""
    from gpu_accelerated_vector_indexing_spark.operators.hybrid import mmr_rerank

    return mmr_rerank(spark, sf_dir, query_id=QUERY_ID, k=K)


QUERIES["mmr_rerank"] = _mmr_rerank


def _mmr_oracle(k: int = K, n_candidates: int = 50, lam: float = 0.7) -> str:
    """Replay the greedy MMR loop as ``k`` staged CTEs — the selection
    is set-dependent but ``k`` is a fixed constant, so each pick is one
    argmax (ORDER BY mmr DESC, doc_id DESC LIMIT 1) over candidates not
    yet selected, with redundancy = max dot against the selected set
    (vectors unit-normalized with the same +1e-12 guard as the NumPy
    side). mmr is compared UNROUNDED for the argmax (as NumPy does) and
    rounded to 6 d.p. only in the output."""
    head = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
cand AS (
  SELECT e.vec_id AS doc_id, {_COS} AS rel,
         list_transform(e.embedding::DOUBLE[], x -> x /
             (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) + 1e-12)) AS nv
  FROM embeddings e CROSS JOIN q
  ORDER BY rel DESC, doc_id DESC LIMIT {n_candidates}
),
p1 AS (SELECT doc_id, rel, {lam} * rel AS mmr FROM cand ORDER BY mmr DESC, doc_id DESC LIMIT 1)"""
    stages, unions = [head], [
        f"SELECT CAST(1 AS INT) AS rank, doc_id, rel AS relevance, round(mmr, 6) AS mmr_score FROM p1"
    ]
    for i in range(2, k + 1):
        prev_sel = " UNION ALL ".join(f"SELECT doc_id FROM p{j}" for j in range(1, i))
        stages.append(f"""
s{i} AS ({prev_sel}),
p{i} AS (
  SELECT c.doc_id, c.rel,
         {lam} * c.rel - {(1.0 - lam)!r} * (
           SELECT max(list_dot_product(c.nv, p.nv))
           FROM cand p WHERE p.doc_id IN (SELECT doc_id FROM s{i})
         ) AS mmr
  FROM cand c WHERE c.doc_id NOT IN (SELECT doc_id FROM s{i})
  ORDER BY mmr DESC, doc_id DESC LIMIT 1
)""")
        unions.append(
            f"SELECT CAST({i} AS INT) AS rank, doc_id, rel AS relevance, round(mmr, 6) AS mmr_score FROM p{i}"
        )
    return ",\n".join(stages) + "\n" + "\nUNION ALL\n".join(unions)


ORACLES["mmr_rerank"] = _mmr_oracle()


def _hybrid_topn(spark, sf_dir):
    """Head-truncated RRF (scale form): approximate vs the full-window
    form by design, but fully deterministic and in-plan — the oracle
    restates the head truncation (ORDER BY … LIMIT head_n) literally."""
    from gpu_accelerated_vector_indexing_spark.operators.hybrid import hybrid_search_rrf_topn

    return hybrid_search_rrf_topn(spark, sf_dir, query_id=QUERY_ID, k=10)


QUERIES["hybrid_search_rrf_topn"] = _hybrid_topn

ORACLES["hybrid_search_rrf_topn"] = (
    _HYBRID_BASE
    + """,
ch AS (SELECT doc_id, cos FROM cos ORDER BY cos DESC, doc_id DESC LIMIT 100),
cr AS (
  SELECT doc_id, cos, row_number() OVER (ORDER BY cos DESC, doc_id DESC) AS cos_rank FROM ch
),
bh AS (SELECT doc_id, bm25 FROM bm25 ORDER BY bm25 DESC, doc_id DESC LIMIT 100),
br AS (
  SELECT doc_id, bm25, row_number() OVER (ORDER BY bm25 DESC, doc_id DESC) AS bm25_rank FROM bh
)
SELECT doc_id, coalesce(cos, 0.0) AS cos, coalesce(bm25, 0.0) AS bm25,
       coalesce(1.0 / (60 + cos_rank), 0.0) + coalesce(1.0 / (60 + bm25_rank), 0.0) AS rrf
FROM cr FULL OUTER JOIN br USING (doc_id)
ORDER BY rrf DESC, doc_id DESC LIMIT 10
"""
)


# embed_and_search oracle: the md5 hashing featurizer replicated in SQL.
# ('0x' || substr(md5(tok),1,16))::UBIGINT equals Python's
# int.from_bytes(md5(tok).digest()[:8], 'big') (verified); bucket/sign,
# scatter-add, L2 norm, and the float32 storage round-trip
# ((v/n)::FLOAT::DOUBLE) are restated literally. All intermediate sums
# are integer-valued doubles (exact at any order); the cosine is rounded
# to 6 d.p. like every score.
def embed_cte(
    docs_rel: str = "documents",
    query_text: str = "hash table merge join",
    salt: str = "",
) -> str:
    """The md5 hashing featurizer restated as DuckDB CTEs, parameterized
    over the corpus relation, the query string, and the embedder
    VERSION salt — shared by ``embed_and_search`` (whole fixture
    corpus), the CDC refresh oracle (the NEW-snapshot relation), and
    the model-migration oracle (non-empty salt = "a different model"):
    ONE SQL restatement of functions/embedder._hash_embed_batch, so the
    oracles cannot drift off the featurizer contract. The default salt
    keeps every pre-existing oracle string byte-identical."""
    tok = f"'{salt}' || tok" if salt else "tok"
    return f"""
WITH toks AS (
  SELECT doc_id, t AS tok
  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS t FROM {docs_rel})
  WHERE t <> ''
),
hashes AS (
  SELECT doc_id,
         ('0x' || substr(md5({tok}), 1, 16))::UBIGINT AS h
  FROM toks
),
buckets AS (
  SELECT doc_id, (h % 64)::INT AS bucket,
         sum(CASE WHEN (h >> 63) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS v
  FROM hashes GROUP BY doc_id, bucket
),
dims AS (SELECT i FROM range(0, 64) t(i)),
dense AS (
  SELECT d.doc_id, dims.i, coalesce(b.v, 0.0) AS v
  FROM (SELECT DISTINCT doc_id FROM {docs_rel}) d
  CROSS JOIN dims
  LEFT JOIN buckets b ON b.doc_id = d.doc_id AND b.bucket = dims.i
),
norms AS (
  SELECT doc_id, sqrt(sum(v * v)) AS n FROM dense GROUP BY doc_id
),
corpus AS (
  SELECT dense.doc_id,
         list(CASE WHEN n > 0 THEN ((v / n)::FLOAT)::DOUBLE ELSE 0.0 END ORDER BY i) AS emb
  FROM dense JOIN norms USING (doc_id) GROUP BY dense.doc_id
),
q_toks AS (
  SELECT t AS tok FROM (SELECT unnest(string_split_regex(lower('{query_text}'), '\\s+')) AS t)
  WHERE t <> ''
),
q_hashes AS (
  SELECT ('0x' || substr(md5({tok}), 1, 16))::UBIGINT AS h FROM q_toks
),
q_buckets AS (
  SELECT (h % 64)::INT AS bucket,
         sum(CASE WHEN (h >> 63) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS v
  FROM q_hashes GROUP BY bucket
),
q_dense AS (
  SELECT dims.i, coalesce(qb.v, 0.0) AS v
  FROM dims LEFT JOIN q_buckets qb ON qb.bucket = dims.i
),
q_norm AS (SELECT sqrt(sum(v * v)) AS n FROM q_dense),
qvec AS (
  SELECT list(CASE WHEN n > 0 THEN ((v / n)::FLOAT)::DOUBLE ELSE 0.0 END ORDER BY i) AS q
  FROM q_dense CROSS JOIN q_norm GROUP BY n
)
"""


_EMBED_CTE = embed_cte()

ORACLES["embed_and_search"] = _EMBED_CTE + f"""
SELECT doc_id,
       round(list_dot_product(c.emb, q.q) /
             (sqrt(list_dot_product(c.emb, c.emb)) * sqrt(list_dot_product(q.q, q.q)) + 1e-8),
             6) AS score
FROM corpus c CROSS JOIN qvec q
ORDER BY score DESC, doc_id DESC LIMIT {K}
"""


QUERIES["multi_query_knn_prenorm"] = partial(
    knn.multi_query_knn_prenorm, query_ids=MULTI_QUERY_IDS, k=K
)
QUERIES["knn_per_cluster_topk"] = partial(knn.knn_per_cluster_topk, query_id=QUERY_ID)

ORACLES["multi_query_knn_prenorm"] = f"""
WITH qs AS (
  SELECT vec_id AS query_id, {_NORM.format(v='embedding::DOUBLE[]')} AS nq
  FROM embeddings WHERE vec_id IN {MULTI_QUERY_IDS}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product({_NORM.format(v='e.embedding::DOUBLE[]')}, q.nq), 6) AS score
  FROM embeddings e CROSS JOIN qs q
)
SELECT query_id, vec_id, score, CAST(rn AS INT) AS rn FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id DESC) AS rn
  FROM scored
) WHERE rn <= {K}
"""

ORACLES["knn_per_cluster_topk"] = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
scored AS (
  SELECT e.label, e.vec_id, {_COS} AS score
  FROM embeddings e CROSS JOIN q
)
SELECT label, vec_id, score, CAST(rn AS INT) AS rn FROM (
  SELECT *, row_number() OVER (PARTITION BY label ORDER BY score DESC, vec_id DESC) AS rn
  FROM scored
) WHERE rn <= 3
"""

QUERIES["corpus_validation"] = partial(knn.corpus_validation, dim=64)

ORACLES["corpus_validation"] = """
SELECT count(*) AS n_rows,
       count(DISTINCT vec_id) AS n_distinct_ids,
       CAST(sum(CASE WHEN len(embedding) <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
       CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_vec,
       CAST(sum(CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) = 'inf'::FLOAT)) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite
FROM embeddings
"""

# PQ full oracle: staged-CTE replay of the deterministic codebook fit
# (see queries/_pq_oracle.py); DIM = 64 (fixture), candidate margin
# matches quantize.knn_pq's default n_candidates.
from gpu_accelerated_vector_indexing_spark.queries._pq_oracle import knn_pq_sql as _knn_pq_sql

ORACLES["knn_pq"] = _knn_pq_sql(QUERY_ID, dim=64, k=K, n_candidates=150)


def _knn_chunk_pooled(spark, sf_dir):
    """Chunk → hash-embed → deterministic mean-pool → cosine top-k; the
    oracle replays chunking, the md5 featurizer, and the chunk-ordered
    pool fold (list_reduce over list(... ORDER BY chunk_idx)) so both
    engines sum the same doubles in the same order."""
    return knn.knn_chunk_pooled(spark, sf_dir, k=K)


QUERIES["knn_chunk_pooled"] = _knn_chunk_pooled

# the chunk-level twin of _EMBED_CTE: same md5 bucket/sign scatter-add,
# same float32 round-trip, keyed by (doc_id, chunk_idx) — the shared
# replay of operators/knn.chunk_vectors, composed by the mean-pool
# (knn_chunk_pooled) and late-interaction (knn_maxsim) oracles
_CHUNK_VECS_CTES = """
chunks AS (
  SELECT doc_id, CAST((gs - 1) // 150 AS INT) AS chunk_idx,
         substring(text, gs, 200) AS chunk_text
  FROM (
    SELECT doc_id, text, unnest(generate_series(1, greatest(length(text), 1), 150)) AS gs
    FROM documents
  )
),
toks AS (
  SELECT doc_id, chunk_idx, t AS tok
  FROM (SELECT doc_id, chunk_idx,
               unnest(string_split_regex(lower(chunk_text), '\\s+')) AS t
        FROM chunks)
  WHERE t <> ''
),
hashes AS (
  SELECT doc_id, chunk_idx, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks
),
buckets AS (
  SELECT doc_id, chunk_idx, (h % 64)::INT AS bucket,
         sum(CASE WHEN (h >> 63) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS v
  FROM hashes GROUP BY doc_id, chunk_idx, bucket
),
dims AS (SELECT i FROM range(0, 64) t(i)),
dense AS (
  SELECT c.doc_id, c.chunk_idx, dims.i, coalesce(b.v, 0.0) AS v
  FROM (SELECT DISTINCT doc_id, chunk_idx FROM chunks) c
  CROSS JOIN dims
  LEFT JOIN buckets b
    ON b.doc_id = c.doc_id AND b.chunk_idx = c.chunk_idx AND b.bucket = dims.i
),
norms AS (
  SELECT doc_id, chunk_idx, sqrt(sum(v * v)) AS n FROM dense GROUP BY doc_id, chunk_idx
),
chunk_vecs AS (
  SELECT dense.doc_id, dense.chunk_idx,
         list(CASE WHEN n > 0 THEN ((v / n)::FLOAT)::DOUBLE ELSE 0.0 END ORDER BY i) AS emb
  FROM dense JOIN norms USING (doc_id, chunk_idx)
  GROUP BY dense.doc_id, dense.chunk_idx
)"""

# pooled by a left fold in chunk_idx order == Spark's sorted-array F.aggregate
ORACLES["knn_chunk_pooled"] = f"""
WITH {_CHUNK_VECS_CTES},
pooled_raw AS (
  SELECT doc_id,
         list_reduce(list(emb ORDER BY chunk_idx),
                     (a, b) -> list_transform(generate_series(1, 64), i -> a[i] + b[i])) AS s,
         count(*)::INT AS n_chunks
  FROM chunk_vecs GROUP BY doc_id
),
pooled AS (
  SELECT doc_id, list_transform(s, x -> x / n_chunks) AS doc_vec FROM pooled_raw
),
q_toks AS (
  SELECT t AS tok
  FROM (SELECT unnest(string_split_regex(lower('hash table merge join'), '\\s+')) AS t)
  WHERE t <> ''
),
q_hashes AS (
  SELECT ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM q_toks
),
q_buckets AS (
  SELECT (h % 64)::INT AS bucket,
         sum(CASE WHEN (h >> 63) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS v
  FROM q_hashes GROUP BY bucket
),
q_dense AS (
  SELECT dims.i, coalesce(qb.v, 0.0) AS v
  FROM dims LEFT JOIN q_buckets qb ON qb.bucket = dims.i
),
q_norm AS (SELECT sqrt(sum(v * v)) AS n FROM q_dense),
qvec AS (
  SELECT list(CASE WHEN n > 0 THEN ((v / n)::FLOAT)::DOUBLE ELSE 0.0 END ORDER BY i) AS q
  FROM q_dense CROSS JOIN q_norm GROUP BY n
)
SELECT doc_id,
       round(list_dot_product(p.doc_vec, q.q) /
             (sqrt(list_dot_product(p.doc_vec, p.doc_vec)) * sqrt(list_dot_product(q.q, q.q)) + 1e-8),
             6) AS score
FROM pooled p CROSS JOIN qvec q
ORDER BY score DESC, doc_id DESC LIMIT {K}
"""


def _knn_matryoshka(spark, sf_dir):
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_matryoshka

    return knn_matryoshka(spark, sf_dir, query_id=QUERY_ID, k=K)


QUERIES["knn_matryoshka"] = _knn_matryoshka

# Matryoshka two-stage: candidate set = top-50 by prefix-16 cosine
# (rounded, vec_id-desc tie-break — deterministic), exact full-dim
# rescore on the candidates. The oracle replays both stages.
from gpu_accelerated_vector_indexing_spark.operators.knn import (  # noqa: E402
    MRL_CANDIDATES,
    MRL_PREFIX_DIM,
)

ORACLES["knn_matryoshka"] = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
qs AS (SELECT qvec, qvec[1:{MRL_PREFIX_DIM}] AS q16 FROM q),
s1 AS (
  SELECT e.vec_id,
         round(list_dot_product(e.embedding[1:{MRL_PREFIX_DIM}]::DOUBLE[], q16) /
               (sqrt(list_dot_product(e.embedding[1:{MRL_PREFIX_DIM}]::DOUBLE[],
                                      e.embedding[1:{MRL_PREFIX_DIM}]::DOUBLE[])) *
                sqrt(list_dot_product(q16, q16)) + 1e-8), 6) AS s16
  FROM embeddings e CROSS JOIN qs
),
cand AS (SELECT vec_id FROM s1 ORDER BY s16 DESC, vec_id DESC LIMIT {MRL_CANDIDATES}),
rescore AS (
  SELECT e.vec_id,
         round(list_dot_product(e.embedding::DOUBLE[], qvec) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(qvec, qvec)) + 1e-8), 6) AS score
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN qs
)
SELECT vec_id, score FROM rescore ORDER BY score DESC, vec_id DESC LIMIT {K}
"""


def _knn_maxsim(spark, sf_dir):
    """Late-interaction MaxSim: multi-vector query (doc 0's chunk
    embeddings), score = mean over query chunks of the best candidate-
    chunk cosine. Per-q_idx maxes sum as exact scaled LONGs so the
    aggregation is float-order-free (operators/knn.knn_maxsim)."""
    from gpu_accelerated_vector_indexing_spark.operators.knn import knn_maxsim

    return knn_maxsim(spark, sf_dir, query_doc_id=0, k=K)


QUERIES["knn_maxsim"] = _knn_maxsim

ORACLES["knn_maxsim"] = f"""
WITH {_CHUNK_VECS_CTES},
q_chunks AS (
  SELECT chunk_idx AS q_idx, emb AS qemb FROM chunk_vecs WHERE doc_id = 0
),
scored AS (
  SELECT cv.doc_id, q.q_idx,
         round(list_dot_product(cv.emb, q.qemb) /
               (sqrt(list_dot_product(cv.emb, cv.emb)) *
                sqrt(list_dot_product(q.qemb, q.qemb)) + 1e-8), 6) AS c
  FROM chunk_vecs cv CROSS JOIN q_chunks q
  WHERE cv.doc_id <> 0
),
per_q AS (SELECT doc_id, q_idx, max(c) AS mx FROM scored GROUP BY doc_id, q_idx),
agg AS (
  SELECT doc_id, sum(CAST(round(mx * 1000000) AS BIGINT)) AS s, count(*) AS m
  FROM per_q GROUP BY doc_id
)
SELECT doc_id, round(s / (m * 1000000.0), 6) AS score
FROM agg
ORDER BY score DESC, doc_id DESC LIMIT {K}
"""


# --- r6: the SQ4 rung (16 levels/dim, two dims per byte at rest) ---------------
def _knn_sq4(spark, sf_dir):
    from gpu_accelerated_vector_indexing_spark.operators.quantize import knn_sq4

    return knn_sq4(spark, sf_dir, query_id=QUERY_ID, k=K)


QUERIES["knn_sq4"] = _knn_sq4
# approx ≡ exact contract at the widened candidate margin — same oracle
# posture as knn_sq8
ORACLES["knn_sq4"] = ORACLES["knn_bruteforce"]


# --- r10: CDC refresh for the PQ index (the compression rung's lifecycle) -----
from gpu_accelerated_vector_indexing_spark.queries._pq_oracle import (  # noqa: E402
    pq_refresh_cdc_sql as _pq_refresh_cdc_sql,
)


def _pq_refresh_cdc(spark, sf_dir):
    """Codebooks = stored state trained on the OLD snapshot; the delta
    encodes with those books (no Lloyd re-run), dead rows tombstone,
    serving ADC-scans live codes and exact-rescores against live
    vectors — the third index family in the CDC loop."""
    from gpu_accelerated_vector_indexing_spark.operators.quantize import pq_refresh_cdc

    return pq_refresh_cdc(spark, sf_dir, query_id=1, k=K, n_candidates=150)


QUERIES["pq_refresh_cdc"] = _pq_refresh_cdc
ORACLES["pq_refresh_cdc"] = _pq_refresh_cdc_sql(1, dim=64, k=K, n_candidates=150)


def _pq_refresh_cdc_gen2(spark, sf_dir):
    """Two stacked delta cycles over the PQ state — tombstones at
    dead-gen 0 then 1 (cycle-1 appends retire too), appends at gen 1
    then 2 with the SAME stored codebooks; serve rescored against the
    v3 corpus."""
    from gpu_accelerated_vector_indexing_spark.operators.quantize import (
        pq_refresh_cdc_gen2,
    )

    return pq_refresh_cdc_gen2(spark, sf_dir, query_id=1, k=K, n_candidates=150)


from gpu_accelerated_vector_indexing_spark.queries._pq_oracle import (  # noqa: E402
    pq_refresh_cdc_gen2_sql as _pq_refresh_cdc_gen2_sql,
)

QUERIES["pq_refresh_cdc_gen2"] = _pq_refresh_cdc_gen2
ORACLES["pq_refresh_cdc_gen2"] = _pq_refresh_cdc_gen2_sql(1, dim=64, k=K, n_candidates=150)


def _pq_read_asof(spark, sf_dir):
    """PQ time travel: gen-windowed code reads reconstruct every
    version's code set from the one twice-refreshed state; books are
    version-invariant stored state; candidates rescore against the
    matching corpus version."""
    from gpu_accelerated_vector_indexing_spark.operators.quantize import pq_read_asof

    return pq_read_asof(spark, sf_dir, query_id=1, k=K, n_candidates=150)


from gpu_accelerated_vector_indexing_spark.queries._pq_oracle import (  # noqa: E402
    pq_read_asof_sql as _pq_read_asof_sql,
)

QUERIES["pq_read_asof"] = _pq_read_asof
ORACLES["pq_read_asof"] = _pq_read_asof_sql(1, dim=64, k=K, n_candidates=150)
