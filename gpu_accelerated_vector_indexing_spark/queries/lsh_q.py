"""LSH-bucketed ANN query family (the non-IVF scale path).

The oracle recomputes the SAME deterministic signatures in DuckDB: the
hyperplane integer weights come from the shared ``hyperplanes()``
constants, and both engines quantize vectors to integer-valued doubles
first, so every signature dot product is exact (< 2^53) and the bucket
ids — hence candidate sets — match bit-for-bit, not statistically.
"""

from __future__ import annotations

from functools import partial

from gpu_accelerated_vector_indexing_spark.operators import lsh_ann as L

QUERY_ID = 0
K = 5
_PLANES = L.hyperplanes()

_QV = "list_transform({v}::DOUBLE[], x -> floor(x * 1048576.0))"

_COS = (
    "round(list_dot_product(e.embedding::DOUBLE[], q.qvec) /"
    " (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qvec, q.qvec)) + 1e-8), 6)"
)


def _plane_sql(row: list[int]) -> str:
    return "[" + ",".join(str(float(w)) for w in row) + "]::DOUBLE[]"


def _sig_sql(vec_expr: str) -> str:
    qv = _QV.format(v=vec_expr)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product({qv}, {_plane_sql(row)}) >= 0 THEN {1 << j} ELSE 0 END)"
        for j, row in enumerate(_PLANES)
    )
    return f"({bits})::BIGINT"


_SIGS = f"""
sigs AS (
  SELECT vec_id, embedding, {_sig_sql("embedding")} AS bucket FROM embeddings
),
q AS (SELECT embedding::DOUBLE[] AS qvec, embedding FROM embeddings WHERE vec_id = {QUERY_ID}),
qs AS (SELECT {_sig_sql("embedding")} AS qbucket FROM q),
probes AS (
  SELECT qbucket AS bucket FROM qs
  UNION ALL
  SELECT xor(qbucket, (1 << j)::BIGINT) FROM qs CROSS JOIN range(0, {L.N_PLANES}) t(j)
  UNION ALL
  SELECT xor(qbucket, ((1 << j) + (1 << l))::BIGINT)
  FROM qs CROSS JOIN range(0, {L.N_PLANES}) t(j) CROSS JOIN range(0, {L.N_PLANES}) s(l)
  WHERE l > j
),
cands AS (
  SELECT s.vec_id, s.embedding FROM sigs s JOIN probes p ON s.bucket = p.bucket
),
scored AS (
  SELECT e.vec_id, {_COS} AS score FROM cands e CROSS JOIN (SELECT qvec FROM q) q
)
"""

QUERIES = {
    "knn_lsh": partial(L.knn_lsh, query_id=QUERY_ID, k=K),
    "lsh_bucket_stats": L.lsh_bucket_stats,
    "lsh_recall": partial(L.lsh_recall, query_id=QUERY_ID, k=K),
}

ORACLES = {
    "knn_lsh": f"""
WITH {_SIGS}
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id DESC LIMIT {K}
""",
    "lsh_bucket_stats": f"""
WITH sigs AS (
  SELECT vec_id, {_sig_sql("embedding")} AS bucket FROM embeddings
),
per AS (SELECT bucket, count(*) AS n_vectors FROM sigs GROUP BY bucket)
SELECT count(*) AS n_buckets, CAST(sum(n_vectors) AS BIGINT) AS n_total,
       max(n_vectors) AS max_bucket, min(n_vectors) AS min_bucket
FROM per
""",
    "lsh_recall": f"""
WITH {_SIGS},
topk AS (SELECT vec_id FROM scored ORDER BY score DESC, vec_id DESC LIMIT {K}),
exact_scored AS (
  SELECT e.vec_id, {_COS} AS score
  FROM embeddings e CROSS JOIN (SELECT qvec FROM q) q
),
exact AS (SELECT vec_id FROM exact_scored ORDER BY score DESC, vec_id DESC LIMIT {K}),
hits AS (SELECT t.vec_id FROM topk t WHERE t.vec_id IN (SELECT vec_id FROM exact))
SELECT count(*) AS n_hits, round(count(*) / {K}.0, 6) AS recall FROM hits
""",
}
