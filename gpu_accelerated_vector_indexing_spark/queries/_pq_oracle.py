"""DuckDB staged-CTE replay of the deterministic PQ training + ADC scan.

The PQ codebooks (`operators/quantize.pq_codebooks`) are trained with NO
randomness: sample = first ``PQ_TRAIN_SAMPLE`` rows by vec_id, init =
the first ``PQ_K`` sample rows per subspace, ``PQ_ITERS`` Lloyd rounds
whose distances round to 6 d.p. before the argmin (ties → lowest
codeword index) and whose means round to 8 d.p. That makes the whole
fit replayable as chained SQL CTEs — the same staged-replay device the
MMR and PageRank oracles use — so `knn_pq` / `knn_ivf_pq` get FULL
value oracles instead of rows-only checks.

CTE names are prefixed ``pq_`` so the block composes with the shared
IVF coarse/probe CTEs (`ivf_q._ivf_ctes`) without collisions.
"""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators.quantize import (
    PQ_ITERS,
    PQ_K,
    PQ_SUBSPACES,
    PQ_TRAIN_SAMPLE,
)


def pq_replay_ctes(
    query_id: int,
    dim: int,
    residual: bool = False,
    sample_rel: str = "embeddings",
    corpus_rel: str = "embeddings",
) -> str:
    """CTE chain ending in ``{p}approx(vec_id, label, ascore)`` — the
    rounded ADC approximate score of every corpus vector for one query
    (prefix ``p`` = ``pq_`` for raw-vector codes, ``pqr_`` for residual
    codes so both can compose into one statement).

    Mirrors quantize.py exactly: per-iteration CTEs ``{p}b{i}`` (rounded
    d² argmin assignment), ``{p}mu{i}`` (8-d.p. per-dimension means) and
    ``{p}c{i}`` (codebook update; empty codewords keep their previous
    centroid via the LEFT JOIN + coalesce). Iteration CTEs are
    ``MATERIALIZED`` — each ``{p}c{i}`` is referenced twice, so without
    the hint DuckDB's CTE inlining doubles the plan per iteration
    (2^ITERS blowup).

    With ``residual=True`` (the IVFADC layout,
    ``quantize.knn_ivf_pq_residual``) the trained/encoded value is
    ``embedding − centroid(label)`` and the reconstruction adds the
    centroid back; the block then REQUIRES the shared IVF ``cent`` and
    ``q`` CTEs (``ivf_q._ivf_ctes``) in scope — the same rounded
    centroids Spark memoizes as index state.

    ``sample_rel``/``corpus_rel`` (r10, non-residual only) decouple the
    TRAINING corpus from the ENCODED corpus — the PQ CDC refresh trains
    on the OLD snapshot and encodes the LIVE one with those stored
    books; both default to ``embeddings`` (byte-identical SQL to the
    pre-parameter form). The relations must expose
    (vec_id, label, embedding).
    """
    p = "pqr_" if residual else "pq_"
    sub = dim // PQ_SUBSPACES
    d2 = (
        "round(list_sum(list_transform(generate_series(1, {n}), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), 6)"
    )
    if residual:
        sample_src = f"""
  SELECT e.vec_id,
         list_transform(generate_series(1, {dim}),
                        i -> e.embedding[i]::DOUBLE - c.centroid[i]) AS v
  FROM embeddings e JOIN cent c ON e.label = c.label
  ORDER BY e.vec_id LIMIT {PQ_TRAIN_SAMPLE}"""
        allsub_x = (
            f"list_transform(generate_series(1, {sub}), "
            f"i -> e.embedding[ss.s * {sub} + i]::DOUBLE "
            f"- c.centroid[ss.s * {sub} + i])"
        )
        allsub_from = f"FROM embeddings e JOIN cent c ON e.label = c.label CROSS JOIN {p}ss ss"
    else:
        sample_src = f"""
  SELECT vec_id, embedding::DOUBLE[] AS v FROM {sample_rel}
  ORDER BY vec_id LIMIT {PQ_TRAIN_SAMPLE}"""
        allsub_x = (
            f"list_transform(generate_series(1, {sub}), "
            f"i -> e.embedding[ss.s * {sub} + i]::DOUBLE)"
        )
        allsub_from = f"FROM {corpus_rel} e CROSS JOIN {p}ss ss"
    parts = [
        f"""
{p}sample AS ({sample_src}
),
{p}ss AS (SELECT unnest(range(0, {PQ_SUBSPACES})) AS s),
{p}subv AS MATERIALIZED (
  SELECT ss.s, sm.vec_id,
         list_transform(generate_series(1, {sub}), i -> sm.v[ss.s * {sub} + i]) AS x
  FROM {p}sample sm CROSS JOIN {p}ss ss
),
{p}c0 AS MATERIALIZED (
  SELECT s, rn AS cw, x AS c FROM (
    SELECT s, x, row_number() OVER (PARTITION BY s ORDER BY vec_id) AS rn FROM {p}subv
  ) WHERE rn <= {PQ_K}
)"""
    ]
    for it in range(1, PQ_ITERS + 1):
        prev = f"{p}c{it - 1}"
        dist = d2.format(n=sub, a="sv.x", b="c.c")
        parts.append(
            f"""
{p}b{it} AS MATERIALIZED (
  SELECT s, vec_id, x, cw FROM (
    SELECT sv.s, sv.vec_id, sv.x, c.cw,
           row_number() OVER (PARTITION BY sv.s, sv.vec_id ORDER BY {dist}, c.cw) AS rn
    FROM {p}subv sv JOIN {prev} c ON sv.s = c.s
  ) WHERE rn = 1
),
{p}mu{it} AS (
  SELECT b.s, b.cw, d.i, round(avg(b.x[d.i]), 8) AS mv
  FROM {p}b{it} b CROSS JOIN (SELECT unnest(range(1, {sub + 1})) AS i) d
  GROUP BY b.s, b.cw, d.i
),
{p}c{it} AS MATERIALIZED (
  SELECT c.s, c.cw, coalesce(m.cm, c.c) AS c
  FROM {prev} c LEFT JOIN (
    SELECT s, cw, list(mv ORDER BY i) AS cm FROM {p}mu{it} GROUP BY s, cw
  ) m ON m.s = c.s AND m.cw = c.cw
)"""
        )
    enc_dist = d2.format(n=sub, a="a.x", b="c.c")
    if residual:
        recon = f"""
{p}recon AS (
  SELECT vec_id, any_value(label) AS label, flatten(list(c ORDER BY s)) AS dv
  FROM {p}codes GROUP BY vec_id
),
{p}rv AS (
  SELECT r.vec_id, r.label,
         list_transform(generate_series(1, {dim}), i -> c.centroid[i] + r.dv[i]) AS rv
  FROM {p}recon r JOIN cent c ON r.label = c.label
),
{p}approx AS MATERIALIZED (
  SELECT r.vec_id, r.label,
         round(list_dot_product(r.rv, q.qvec) /
               (sqrt(list_dot_product(r.rv, r.rv)) *
                sqrt(list_dot_product(q.qvec, q.qvec)) + 1e-8), 6) AS ascore
  FROM {p}rv r CROSS JOIN q
)"""
    else:
        recon = f"""
{p}recon AS (
  SELECT vec_id, any_value(label) AS label, flatten(list(c ORDER BY s)) AS rv
  FROM {p}codes GROUP BY vec_id
),
{p}q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {query_id}),
{p}approx AS MATERIALIZED (
  SELECT r.vec_id, r.label,
         round(list_dot_product(r.rv, q.qvec) /
               (sqrt(list_dot_product(r.rv, r.rv)) *
                sqrt(list_dot_product(q.qvec, q.qvec)) + 1e-8), 6) AS ascore
  FROM {p}recon r CROSS JOIN {p}q q
)"""
    parts.append(
        f"""
{p}allsub AS (
  SELECT ss.s, e.vec_id, e.label,
         {allsub_x} AS x
  {allsub_from}
),
{p}codes AS MATERIALIZED (
  SELECT s, vec_id, label, c FROM (
    SELECT a.s, a.vec_id, a.label, c.c,
           row_number() OVER (PARTITION BY a.vec_id, a.s ORDER BY {enc_dist}, c.cw) AS rn
    FROM {p}allsub a JOIN {p}c{PQ_ITERS} c ON a.s = c.s
  ) WHERE rn = 1
),{recon.lstrip()}"""
    )
    return ",".join(parts)


_COS = (
    "round(list_dot_product(e.embedding::DOUBLE[], q.qvec) /"
    " (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qvec, q.qvec)) + 1e-8), 6)"
)


def knn_pq_sql(query_id: int, dim: int, k: int, n_candidates: int) -> str:
    """Full-value oracle for ``knn_pq``: ADC candidate ranking (rounded,
    vec_id-DESC tie-break) then exact rescore of the candidate set."""
    return f"""
WITH {pq_replay_ctes(query_id, dim)},
pq_cand AS (
  SELECT vec_id FROM pq_approx ORDER BY ascore DESC, vec_id DESC LIMIT {n_candidates}
)
SELECT e.vec_id, {_COS} AS score
FROM embeddings e CROSS JOIN pq_q q
WHERE e.vec_id IN (SELECT vec_id FROM pq_cand)
ORDER BY score DESC, vec_id DESC LIMIT {k}
"""


def knn_ivf_pq_sql(
    ivf_ctes: str, query_id: int, dim: int, k: int, n_candidates: int
) -> str:
    """Full-value oracle for ``knn_ivf_pq``: the shared IVF coarse/probe
    CTEs restrict the ADC candidate scan to the probed labels; the exact
    rescore then runs over the candidate ids (matching the Spark plan,
    which joins candidates back to the full float table by vec_id)."""
    return (
        ivf_ctes
        + ","
        + pq_replay_ctes(query_id, dim)
        + f""",
pq_cand AS (
  SELECT vec_id FROM pq_approx
  WHERE label IN (SELECT label FROM probes)
  ORDER BY ascore DESC, vec_id DESC LIMIT {n_candidates}
)
SELECT e.vec_id, {_COS} AS score
FROM embeddings e CROSS JOIN pq_q q
WHERE e.vec_id IN (SELECT vec_id FROM pq_cand)
ORDER BY score DESC, vec_id DESC LIMIT {k}
"""
    )


def knn_ivf_pq_residual_sql(
    ivf_ctes: str, query_id: int, dim: int, k: int, n_candidates: int
) -> str:
    """Full-value oracle for ``knn_ivf_pq_residual``: replays the
    residual-codebook fit (training vectors = embedding − the shared
    8-d.p. ``cent`` centroids), reconstructs ``centroid + decoded
    residual``, ranks candidates inside the probed labels, exact-rescores
    — mirroring quantize.knn_ivf_pq_residual stage for stage."""
    return (
        ivf_ctes
        + ","
        + pq_replay_ctes(query_id, dim, residual=True)
        + f""",
pqr_cand AS (
  SELECT vec_id FROM pqr_approx
  WHERE label IN (SELECT label FROM probes)
  ORDER BY ascore DESC, vec_id DESC LIMIT {n_candidates}
)
SELECT e.vec_id, {_COS} AS score
FROM embeddings e CROSS JOIN q
WHERE e.vec_id IN (SELECT vec_id FROM pqr_cand)
ORDER BY score DESC, vec_id DESC LIMIT {k}
"""
    )


def _cdc_v0_rel_sql() -> str:
    """The OLD vector-corpus snapshot (original vectors) — the sample
    relation every CDC-PQ oracle fits books on, and version 0's serve
    corpus in the time-travel oracle."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        GRAPH_CDC_ADD_MOD as AM,
        GRAPH_CDC_ADD_REM as AR,
    )

    return (
        f"(SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % {AM} <> {AR})"
    )


def _cdc_v1_live_rel_sql() -> str:
    """Snapshot N+1's live corpus (changed rows element-reversed) —
    graph_ann's ONE vector-corpus snapshot definition restated."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        GRAPH_CDC_ADD_MOD as AM,
        GRAPH_CDC_ADD_REM as AR,
        GRAPH_CDC_CHG_MOD as CM,
        GRAPH_CDC_CHG_REM as CR,
        GRAPH_CDC_DEL_MOD as DM,
        GRAPH_CDC_DEL_REM as DR,
    )

    return f"""(
  SELECT vec_id, label,
         CASE WHEN vec_id % {AM} <> {AR} AND vec_id % {CM} = {CR}
              THEN list_reverse(embedding::DOUBLE[])
              ELSE embedding::DOUBLE[] END AS embedding
  FROM embeddings WHERE vec_id % {DM} <> {DR})"""


def _pq_version_block_sql(
    query_id: int, dim: int, k: int, n_candidates: int, live_rel: str
) -> str:
    """One version's full replay: fit on the old corpus, encode
    ``live_rel`` with those books, ADC-rank, exact-rescore — the body
    shared by the single-cycle, gen-2, and per-version asof oracles."""
    return f"""
WITH {pq_replay_ctes(query_id, dim, sample_rel=_cdc_v0_rel_sql(), corpus_rel=live_rel)},
pq_cand AS (
  SELECT vec_id FROM pq_approx ORDER BY ascore DESC, vec_id DESC LIMIT {n_candidates}
)
SELECT e.vec_id, {_COS} AS score
FROM {live_rel} e CROSS JOIN pq_q q
WHERE e.vec_id IN (SELECT vec_id FROM pq_cand)
ORDER BY score DESC, vec_id DESC LIMIT {k}
"""


def pq_refresh_cdc_sql(query_id: int, dim: int, k: int, n_candidates: int) -> str:
    """Full-value oracle for ``quantize.pq_refresh_cdc``: replay the
    OLD-snapshot Lloyd fit (codebooks = stored state), encode the LIVE
    corpus with those books (changed rows carry their element-reversed
    replacement vector — exactly what the Spark side's delta append
    encodes), ADC-rank, then exact-rescore candidates against the live
    vectors. Slice predicates restate graph_ann's ONE vector-corpus
    snapshot definition."""
    return _pq_version_block_sql(query_id, dim, k, n_candidates, _cdc_v1_live_rel_sql())


def _cdc_v2_live_rel_sql() -> str:
    """Snapshot N+2's live corpus (twice-changed rows carry negate ∘
    reverse of the original) — graph_ann's delta-2 slice map restated."""
    from gpu_accelerated_vector_indexing_spark.operators.graph_ann import (
        GRAPH_CDC2_ADD_MOD as A2M,
        GRAPH_CDC2_ADD_REM as A2R,
        GRAPH_CDC2_CHG_MOD as C2M,
        GRAPH_CDC2_CHG_REM as C2R,
        GRAPH_CDC2_DEL_MOD as D2M,
        GRAPH_CDC2_DEL_REM as D2R,
        GRAPH_CDC_ADD_MOD as AM,
        GRAPH_CDC_ADD_REM as AR,
        GRAPH_CDC_CHG_MOD as CM,
        GRAPH_CDC_CHG_REM as CR,
        GRAPH_CDC_DEL_MOD as DM,
        GRAPH_CDC_DEL_REM as DR,
    )

    in_v2 = f"vec_id % {DM} <> {DR}"
    chg2 = f"({in_v2} AND vec_id % {D2M} <> {D2R} AND vec_id % {C2M} = {C2R})"
    in_v3 = (
        f"(({in_v2} AND vec_id % {D2M} <> {D2R})"
        f" OR (vec_id % {DM} = {DR} AND vec_id % {A2M} = {A2R}))"
    )
    v2_vec = (
        f"CASE WHEN vec_id % {AM} <> {AR} AND {in_v2} AND vec_id % {CM} = {CR}"
        f" THEN list_reverse(embedding::DOUBLE[])"
        f" ELSE embedding::DOUBLE[] END"
    )
    return f"""(
  SELECT vec_id, label,
         CASE WHEN {chg2} THEN list_transform({v2_vec}, x -> -x)
              ELSE {v2_vec} END AS embedding
  FROM embeddings WHERE {in_v3})"""


def pq_refresh_cdc_gen2_sql(query_id: int, dim: int, k: int, n_candidates: int) -> str:
    """Full-value oracle for ``quantize.pq_refresh_cdc_gen2``: same
    replay as the single-cycle oracle, pointed at snapshot N+2 — the
    stored old-corpus codebooks encode the v3-live corpus
    (twice-changed rows carry negate ∘ reverse of the original), which
    is exactly the live code set two stacked tombstone generations
    leave behind."""
    return _pq_version_block_sql(query_id, dim, k, n_candidates, _cdc_v2_live_rel_sql())


def pq_read_asof_sql(query_id: int, dim: int, k: int, n_candidates: int) -> str:
    """Full-value oracle for ``quantize.pq_read_asof``: one complete
    replay block per version — books fit on the old corpus every time
    (they are version-invariant stored state), the version's corpus
    encoded/ranked/rescored — UNION'd with the version tag. A value
    match certifies the gen-windowed code reads reconstruct each
    version's code set exactly."""
    rels = [_cdc_v0_rel_sql(), _cdc_v1_live_rel_sql(), _cdc_v2_live_rel_sql()]
    blocks = []
    for v, rel in enumerate(rels):
        body = _pq_version_block_sql(query_id, dim, k, n_candidates, rel)
        blocks.append(
            f"SELECT {v} AS asof_gen, vec_id, score FROM ({body})"
        )
    return (
        "SELECT asof_gen, vec_id, score FROM (\n"
        + "\nUNION ALL\n".join(blocks)
        + "\n)"
    )
