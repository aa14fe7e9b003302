"""Reference-shape query family: 128 clusters × 384 dims.

The fixtures are 10 × 64; the reference index is 128 × 384
(IVF.cpp:13-14). ``operators/refshape`` derives a deterministic
384-dim corpus (six exact power-of-two tilings of each fixture
embedding, labels ``vec_id % 128``) so the engine facade, the
128-directory partition pruning, the 384-element cosine folds and the
multi-word (6 × BIGINT) sign-bit codes all run at reference shape
UNDER THE VALUE-HASH GATE — the derivation is float-exact, so DuckDB
replays the corpus bit-for-bit.

Both queries share one oracle: the exact reference-shape IVF search
(``refshape_search_bq``'s candidate margin makes its rescored result
equal the exact fine search; margin pinned in tests/test_refshape.py).
"""

from __future__ import annotations

from functools import partial

from gpu_accelerated_vector_indexing_spark.operators import refshape

QUERY_ID = 0
K = 5

# the derived corpus, replayed verbatim: CAST to double then scale by
# exact powers of two — bit-identical in every IEEE engine
_EMB384 = (
    "flatten(["
    + ", ".join(
        f"list_transform(embedding, x -> CAST(x AS DOUBLE) * {s!r})"
        for s in refshape.REF_SCALES
    )
    + "])"
)

_REF_IVF_SQL = f"""
WITH emb384 AS (
  SELECT vec_id, vec_id % {refshape.REF_CLUSTERS} AS label, {_EMB384} AS v
  FROM embeddings
),
dims AS (SELECT i FROM range(1, {refshape.REF_DIM + 1}) t(i)),
cent_flat AS (
  SELECT e.label, d.i, round(avg(e.v[d.i]), 8) AS c
  FROM emb384 e CROSS JOIN dims d
  GROUP BY e.label, d.i
),
cent AS (SELECT label, list(c ORDER BY i) AS centroid FROM cent_flat GROUP BY label),
q AS (SELECT v AS qvec FROM emb384 WHERE vec_id = {QUERY_ID}),
coarse AS (
  SELECT c.label,
         round(list_dot_product(c.centroid, q.qvec) /
               (sqrt(list_dot_product(c.centroid, c.centroid)) *
                sqrt(list_dot_product(q.qvec, q.qvec)) + 1e-8), 6) AS cscore
  FROM cent c CROSS JOIN q
),
probes AS (
  SELECT label FROM coarse ORDER BY cscore DESC, label DESC LIMIT {refshape.REF_N_PROBE}
),
fine AS (
  SELECT e.vec_id,
         round(list_dot_product(e.v, q.qvec) /
               (sqrt(list_dot_product(e.v, e.v)) *
                sqrt(list_dot_product(q.qvec, q.qvec)) + 1e-8), 6) AS score
  FROM emb384 e CROSS JOIN q
  WHERE e.label IN (SELECT label FROM probes)
)
SELECT score, vec_id FROM fine ORDER BY score DESC, vec_id DESC LIMIT {K}
"""

QUERIES = {
    "refshape_search_cli": partial(refshape.refshape_search_cli, query_id=QUERY_ID, k=K),
    "refshape_search_bq": partial(refshape.refshape_search_bq, query_id=QUERY_ID, k=K),
    "refshape_kmeans_invariants": refshape.refshape_kmeans_invariants,
    "refshape_graph_build": refshape.refshape_graph_build,
    "refshape_graph_beam": partial(refshape.refshape_graph_beam, query_id=QUERY_ID, k=K),
    "refshape_graph_cli": partial(refshape.refshape_graph_cli, query_id=QUERY_ID, k=K),
    "refshape_graph_bq": partial(refshape.refshape_graph_bq, query_id=QUERY_ID, k=K),
}

# the graph family's staged-CTE oracle with the derived 384-dim corpus
# substituted for `e` — build, walk, and doc mapback all replay in SQL
from gpu_accelerated_vector_indexing_spark.queries._graph_ann_oracle import (  # noqa: E402
    beam_bq_sql,
    beam_search_sql,
    build_digest_sql,
    search_with_docs_sql,
)

_REF_E = (
    f"e AS (SELECT vec_id, vec_id % {refshape.REF_CLUSTERS} AS label,"
    f" {_EMB384} AS v FROM embeddings)"
)

ORACLES = {
    "refshape_search_cli": _REF_IVF_SQL,
    # bq variant returns (vec_id, score); same values, column order is
    # irrelevant to the gate's name-sorted compare
    "refshape_search_bq": _REF_IVF_SQL,
    # learned 128-cluster layout at reference shape: MLlib centroids are
    # not SQL-restatable, but the invariant CONTRACT is fully determined
    # by corpus size (the kmeans_invariants template) — 128 non-empty
    # clusters, every row present, every assignment the argmin. An empty
    # cluster or a non-argmin assignment fails the value hash.
    "refshape_kmeans_invariants": f"""
SELECT CAST({refshape.REF_CLUSTERS} AS BIGINT) AS n_clusters,
       count(*) AS n_rows,
       count(*) AS n_nearest_ok
FROM embeddings
""",
    # the build digest certifies every edge of the 128×384 NN-descent
    # build (the graph_build_digest contract at reference shape)
    "refshape_graph_build": build_digest_sql(e_sql=_REF_E),
    "refshape_graph_beam": search_with_docs_sql(query_id=QUERY_ID, k=K, e_sql=_REF_E),
    # the persisted-index facade path must equal the in-session walk
    "refshape_graph_cli": beam_search_sql(query_id=QUERY_ID, k=K, e_sql=_REF_E),
    # multi-word compressed walk + rescore-all, replayed over the
    # derived corpus (sign agreements as exact small-integer doubles)
    "refshape_graph_bq": beam_bq_sql(
        query_id=QUERY_ID, k=K, rescore_n=None, e_sql=_REF_E
    ),
}
