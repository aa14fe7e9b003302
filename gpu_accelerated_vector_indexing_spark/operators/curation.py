"""Corpus curation for training-data pipelines (EXT, SURVEY.md §2.3).

Four operators a 100 TB pre-training corpus needs between raw ingest and
embedding/indexing (the reference's pipeline starts at already-curated
Wikipedia text, embedding.py:26-31; curation is the step before it):

- ``quality_filter`` — Gopher-style rule filter (Rae et al. 2021,
  arXiv:2112.11446 §A1.1): token-count bounds, mean-word-length bounds,
  stopword floor, symbol-ratio ceiling. Pure native column expressions.
- ``decontaminate_ngram_overlap`` — train/eval n-gram-overlap
  decontamination (GPT-3 paper, arXiv:2005.14165 §C): flags training
  documents sharing 5-gram shingles with a held-out eval slice.
- ``pii_redact`` — regex PII scrubbing (emails, phone numbers) with
  per-document redaction counts.
- ``corpus_mix_rebalance`` — per-source sampling weights that rebalance
  the corpus toward a uniform source mix (domain-mixing step).

Scale notes (100 TB posture):
- quality_filter / pii_redact are embarrassingly parallel scans — no
  shuffle, whole-stage-codegen'd, filters push down to Parquet.
- decontamination shuffles once on the shingle string; at real scale the
  join key would be ``xxhash64(ngram)`` (8 bytes vs ~30) — kept as the
  raw string here only because the DuckDB oracle must compute the
  identical key. The eval side is exploded-distinct per doc first, so
  the join input is already deduplicated (map-side combine before the
  exchange).
- corpus_mix_rebalance aggregates to |sources| rows — partial aggs
  map-side, final agg tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
    LANG_STOPWORDS,
    PUNCT_CLASS,
    TOKEN_RE,
    tokens,
)
from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

# Gopher-style rule thresholds (deterministic, fixture-calibrated)
QF_MIN_TOKENS = 10
QF_MAX_TOKENS = 100_000
QF_MIN_AVG_TOKEN_LEN = 2.0
QF_MAX_AVG_TOKEN_LEN = 10.0
QF_MIN_STOPWORD_RATIO = 0.02
QF_MAX_PUNCT_RATIO = 0.1

# decontamination parameters
DECON_NGRAM = 5
DECON_EVAL_MOD = 20  # doc_id % 20 == 0 ⇒ held-out eval slice (5%)
DECON_MIN_SHARED = 3  # ≥ this many shared shingles ⇒ contaminated

# PII regexes — common Java-regex / RE2 subset so Spark and DuckDB agree
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "555-[0-9]{4}"


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher-style quality rules + keep verdict.

    Scan-shaped (zero shuffles); at 100 TB this runs at scan speed and
    the ``keep`` predicate composes with downstream filters for
    pushdown. Staged projections: the token array and the interpreted
    HOFs over it (length fold, stopword filter) are evaluated once and
    referenced by column — interpreted higher-order expressions get no
    codegen CSE, so a flat select re-tokenizes per referencing column.
    """
    return quality_flags(load_table(spark, sf_dir, "documents"))


def quality_flags(docs: DataFrame) -> DataFrame:
    """The Gopher gate over ANY ``(doc_id, text)`` relation — the
    reusable core of :func:`quality_filter` (the gated index refresh
    applies it to the CDC append batch's NEW text)."""
    staged = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("n"),
        F.aggregate(
            F.transform(F.col("toks"), lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("tc"),
        F.size(F.filter(F.col("toks"), lambda t: t.isin(LANG_STOPWORDS["en"]))).alias(
            "stop"
        ),
        (F.length("text") - F.length(F.regexp_replace("text", PUNCT_CLASS, ""))).alias(
            "punct"
        ),
        F.length("text").alias("len_chars"),
    )
    n_tokens = F.col("n")
    avg_tok = F.col("tc") / n_tokens
    stop_ratio = F.col("stop") / n_tokens
    punct_ratio = F.col("punct") / F.col("len_chars")

    f_len = (n_tokens < QF_MIN_TOKENS) | (n_tokens > QF_MAX_TOKENS)
    f_avg = (avg_tok < QF_MIN_AVG_TOKEN_LEN) | (avg_tok > QF_MAX_AVG_TOKEN_LEN)
    f_stop = stop_ratio < QF_MIN_STOPWORD_RATIO
    f_punct = punct_ratio > QF_MAX_PUNCT_RATIO
    n_failed = (
        f_len.cast("int") + f_avg.cast("int") + f_stop.cast("int") + f_punct.cast("int")
    )
    reasons = F.concat_ws(
        ",",
        F.when(f_len, F.lit("len")),
        F.when(f_avg, F.lit("avg_token_len")),
        F.when(f_stop, F.lit("stopwords")),
        F.when(f_punct, F.lit("punct")),
    )
    return staged.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        n_failed.alias("n_failed"),
        (n_failed == 0).alias("keep"),
        reasons.alias("fail_reasons"),
    )


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """doc_id × distinct 5-gram shingle (exploded; empty for short docs).

    Round-robin repartitions first (dedup._spread): the fixture corpus
    arrives as one input split, and shingling is the expensive per-row
    projection — without the spread it would serialize on one core. At
    production scale the scan already has many splits and the shuffle
    moves only raw text.
    """
    from gpu_accelerated_vector_indexing_spark.operators.dedup import _spread

    docs = _spread(docs)
    toks = tokens(F.col("text"))
    n = F.size(toks)
    grams = F.when(
        n >= DECON_NGRAM,
        F.transform(
            F.sequence(F.lit(1), n - (DECON_NGRAM - 1)),
            lambda i: F.array_join(F.slice(toks, i, DECON_NGRAM), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("ngram")
    )


def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs whose 5-gram shingles overlap the eval slice.

    Eval slice = ``doc_id % 20 == 0`` (deterministic 5% held-out);
    training docs are the rest. Returns one row per training doc with
    any overlap: shared shingle count, distinct eval docs hit, and the
    ``contaminated`` verdict (≥ DECON_MIN_SHARED shared shingles).

    The eval shingle set is broadcast (held-out benchmarks stay small
    while training data grows), so the only shuffle is the final per-doc
    aggregation of the join hits. At 100 TB the key becomes
    ``xxhash64(ngram)`` (see module docstring).
    """
    docs = load_table(spark, sf_dir, "documents")
    ev = _doc_shingles(docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)).withColumnRenamed(
        "doc_id", "eval_doc_id"
    )
    tr = _doc_shingles(docs.filter(F.col("doc_id") % DECON_EVAL_MOD != 0))
    # The eval slice is a few percent of the corpus at ANY scale (held-out
    # benchmarks stay small while training data grows), so its exploded
    # shingle set broadcasts — the big training-shingle relation never
    # shuffles for this join.
    hits = tr.join(F.broadcast(ev), "ngram")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("ngram").alias("shared_ngrams"),
            F.countDistinct("eval_doc_id").alias("eval_docs_hit"),
        )
        .select(
            "doc_id",
            "shared_ngrams",
            "eval_docs_hit",
            (F.col("shared_ngrams") >= DECON_MIN_SHARED).alias("contaminated"),
        )
    )


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub with per-doc counts.

    The fixture corpus contains no PII, so a deterministic email +
    phone are first woven in from ``doc_id`` (making the redaction path
    actually exercised and oracle-checkable), then scrubbed back out.
    Pure projection — no shuffle; at scale this is a scan-speed pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" "),
        F.col("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), 0)).alias("n_phones"),
        F.substring(redacted, 1, 120).alias("redacted_head"),
    )


def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights toward a uniform source mix.

    ``weight = min(1, (total_docs / n_sources) / n_docs)`` — sources
    over target get down-sampled, sources at/under target keep
    everything. Aggregates to |sources| rows; the totals join is a
    broadcast of a 1-row DataFrame.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
    )
    totals = per_src.agg(
        F.sum("n_docs").alias("total_docs"), F.count("*").alias("n_sources")
    )
    j = per_src.crossJoin(F.broadcast(totals))
    target = F.col("total_docs") / F.col("n_sources")
    weight = F.least(F.lit(1.0), target / F.col("n_docs"))
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_docs") / F.col("total_docs")).alias("share"),
        weight.alias("weight"),
        F.floor(F.col("n_docs") * weight).alias("expected_docs"),
    )


TEMP_BUDGET = 10_000  # documents per training epoch in the mixed corpus


def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (α = 0.5) language-sampling weights — the
    multilingual-corpus mixing rule (Conneau et al. 2020 "XLM-R" §3.1;
    Arivazhagan et al. 2019 §4.2): sample language i with probability
    ``q_i ∝ p_i^α``, flattening the natural distribution so low-resource
    languages are seen more often without collapsing to uniform (which
    would over-repeat tiny corpora). α = 0.5 makes ``p^α = √p`` — the
    one exponent that needs NO transcendental call (√ is IEEE-754
    correctly rounded in every engine; ``pow``/``exp``/``ln`` are not).

    Cross-engine determinism: the weight numerator is floor-scaled to
    integer micro-units ``si = ⌊√n_docs · 10⁶⌋`` so the normalizing
    denominator ``Σ si`` is an EXACT bigint sum (no float-accumulation
    order anywhere), and ``expected_docs`` is bigint floor division.
    Plan shape: one |langs|-row aggregate, one 1-row broadcast — the
    same scan-shaped profile as :func:`corpus_mix_rebalance`, valid at
    any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    wl = per_lang.select(
        "lang",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(1000000.0))
        .cast("long")
        .alias("si"),
    )
    tot = wl.agg(
        F.sum("n_docs").alias("total_docs"), F.sum("si").alias("s_total")
    )
    return wl.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (
            F.floor(
                F.col("n_docs").cast("double")
                / F.col("total_docs").cast("double")
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("share"),
        (
            F.floor(
                F.col("si").cast("double")
                / F.col("s_total").cast("double")
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("temp_weight"),
        F.expr(f"(CAST({TEMP_BUDGET} AS BIGINT) * si) div s_total").alias(
            "expected_docs"
        ),
    )


# Repetition-rule thresholds (Gopher arXiv:2112.11446 §A1.1 rules,
# fixture-calibrated: the synthetic word-bag corpus has top-bigram
# fractions p50≈0.033 / p95≈0.087, duplicate-trigram p95≈0.011,
# duplicate-token p50≈0.54 — Gopher's own 0.20-of-chars thresholds
# would pass everything, so the cutoffs sit at the fixture tails)
REP_MAX_TOP_BIGRAM_FRAC = 0.08
REP_MAX_DUP_TRIGRAM_FRAC = 0.05
REP_MAX_DUP_TOKEN_FRAC = 0.70

# semantic decontamination parameters (embedding twin of the n-gram
# form; same eval-slice convention)
SEMDECON_THRESHOLD = 0.85

# shard-manifest parameters: Knuth multiplicative constant mod a
# Mersenne prime — integer-only and portable to any SQL engine (same
# family as approx.portable_hash_unit / the CMS hashes). The id is
# pre-reduced mod P before the multiply, so (P-1)·A + B ≈ 5.7e18 stays
# inside int64 for ANY doc_id (the unreduced form overflowed — ANSI
# error in Spark, HUGEINT promotion in DuckDB — past doc_id ≈ 3.5e9).
SHARD_N = 8
SHARD_A = 2654435761
SHARD_B = 961748927
SHARD_P = 2**31 - 1


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals, one codegen'd scan.

    Per document (Rae et al. 2021, §A1.1 "repetition" rules, restated
    over token counts so the DuckDB oracle divides the same integers):

    - ``top_bigram_frac`` — occurrences of the most frequent bigram /
      total bigrams. Computed with ZERO shuffles: sort the per-doc
      bigram array and fold it for the longest equal-run
      (``F.aggregate`` over ``array_sort``), instead of the
      explode → groupBy(doc, gram) → max two-shuffle plan — at 100 TB
      the whole operator stays a scan-speed projection.
    - ``dup_trigram_frac`` — fraction of trigram slots occupied by a
      repeated trigram: ``(total − distinct) / total``.
    - ``dup_token_frac`` — same at token granularity.
    - ``keep`` — all three under their thresholds.

    The reference corpus (curated Wikipedia, embedding.py:26-31) never
    needed this; a crawled 100 TB corpus does — boilerplate/SEO spam is
    exactly what these rules drop.

    Plan shape: the computation is STAGED through nested projections so
    each expensive higher-order result (token array, gram arrays, the
    run-length fold) is named once and referenced by column — a single
    flat select re-evaluates the un-CSE'd interpreted HOF tree per
    reference, measured 85× slower (42.8 s → 0.5 s at sf0.1). The only
    exchange is ``dedup._spread``'s round-robin (fixture single-split
    pathology; production scans already have many splits) — no gram
    rows ever shuffle.
    """
    from gpu_accelerated_vector_indexing_spark.operators.dedup import _spread

    docs = _spread(load_table(spark, sf_dir, "documents"))

    def gram_col(width: int) -> F.Column:
        return (
            F.when(
                F.col("n") >= width,
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - (width - 1)),
                    lambda i: F.array_join(F.slice(F.col("toks"), i, width), " "),
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias(f"grams{width}")
        )

    # longest equal-run over the sorted bigram array == max occurrence
    # count of any bigram; empty array folds to best=0
    run0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best"))

    def run_step(acc: F.Column, x: F.Column) -> F.Column:
        bump = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), bump.alias("run"), F.greatest(acc["best"], bump).alias("best")
        )

    staged = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", "toks", F.size("toks").alias("n"))
        .select("doc_id", "toks", "n", gram_col(2), gram_col(3))
        .select(
            "doc_id",
            "n",
            F.aggregate(
                F.array_sort(F.col("grams2")), run0, run_step, lambda acc: acc["best"]
            ).alias("top_cnt"),
            F.size("grams2").alias("nb"),
            F.size("grams3").alias("nt"),
            F.size(F.array_distinct(F.col("grams3"))).alias("ndt"),
            F.size(F.array_distinct(F.col("toks"))).alias("ndk"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.col("top_cnt").alias("top_bigram_count"),
            F.when(F.col("nb") > 0, F.col("top_cnt") / F.col("nb"))
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
            F.when(F.col("nt") > 0, (F.col("nt") - F.col("ndt")) / F.col("nt"))
            .otherwise(F.lit(0.0))
            .alias("dup_trigram_frac"),
            F.when(F.col("n") > 0, (F.col("n") - F.col("ndk")) / F.col("n"))
            .otherwise(F.lit(0.0))
            .alias("dup_token_frac"),
        )
    )
    keep = (
        (F.col("top_bigram_frac") <= REP_MAX_TOP_BIGRAM_FRAC)
        & (F.col("dup_trigram_frac") <= REP_MAX_DUP_TRIGRAM_FRAC)
        & (F.col("dup_token_frac") <= REP_MAX_DUP_TOKEN_FRAC)
    )
    return staged.select(
        "doc_id",
        "n_tokens",
        "top_bigram_count",
        "top_bigram_frac",
        "dup_trigram_frac",
        "dup_token_frac",
        keep.alias("keep"),
    )


def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: training vectors too close to a
    held-out eval vector (max cosine ≥ SEMDECON_THRESHOLD) are flagged —
    the semantic twin of ``decontaminate_ngram_overlap`` that catches
    paraphrased benchmark leakage n-gram overlap misses.

    Same eval-slice convention (``vec_id % DECON_EVAL_MOD == 0``), and
    the same scale posture: the eval side is a broadcast (held-out
    benchmarks stay ~thousands of rows while training data grows to
    100 TB), so the big side streams through one codegen'd
    broadcast-nested-loop score + a per-doc max aggregation — no
    shuffle of the training corpus, no n² pair materialization.
    Exact-cosine brute force is deliberate here: decontamination must
    not miss near-misses, so this is one place approximate pruning is
    the wrong trade.
    """
    from gpu_accelerated_vector_indexing_spark.functions.vector import (
        as_double_array,
        dot_product_seq_pandas,
        l2_normalize,
    )

    # both sides pre-normalized ONCE in a staged projection (SURVEY §4
    # P4 hoisting): the per-pair work is a bare dot — the inline-cosine
    # form recomputed both norms per (train, eval) pair, 2×+ the flops.
    # The pair dot runs through the fold-exact Arrow kernel: the JVM
    # ``aggregate``/``zip_with`` fold is interpreted (no codegen), so at
    # |train|·|eval| pairs it dominated the query; ``_dot_seq_batch``
    # keeps the EXACT sequential float association of the JVM fold /
    # DuckDB ``list_dot_product`` (functions/vector.py invariant), and
    # rounding stays in-plan so decimal semantics are Spark's.
    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % DECON_EVAL_MOD == 0).select(
        F.col("vec_id").alias("eval_vec_id"),
        l2_normalize(as_double_array("embedding")).alias("eval_embedding"),
    )
    tr = emb.filter(F.col("vec_id") % DECON_EVAL_MOD != 0).select(
        "vec_id", l2_normalize(as_double_array("embedding")).alias("embedding")
    )
    sim = F.round(
        dot_product_seq_pandas(F.col("embedding"), F.col("eval_embedding")), 6
    )
    scored = tr.join(F.broadcast(ev)).select("vec_id", sim.alias("sim"))
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max("sim").alias("max_eval_sim"),
            F.sum((F.col("sim") >= SEMDECON_THRESHOLD).cast("int")).alias("n_eval_close"),
        )
        .select(
            "vec_id",
            "max_eval_sim",
            "n_eval_close",
            (F.col("max_eval_sim") >= SEMDECON_THRESHOLD).alias("contaminated"),
        )
    )


def shard_manifest(spark: SparkSession, sf_dir: str, n_shards: int = SHARD_N) -> DataFrame:
    """Training-shard assignment manifest: each document hashes to one
    of ``n_shards`` output shards via the portable affine hash
    ``((doc_id·A + B) mod P) mod n_shards`` (integer-only — identical
    in any engine), and the manifest aggregates per-shard document,
    token, and char totals plus the share of the corpus.

    This is the last step of a curation pipeline — the actual write is
    ``df.repartition(n_shards, "shard").write.partitionBy("shard")``;
    the manifest is what the trainer's data loader consumes. One
    map-side-combined aggregation to ``n_shards`` rows; the affine hash
    balances shards to within sampling noise regardless of doc_id
    clustering (verified by the share column).
    """
    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(
        F.pmod(
        F.pmod(F.col("doc_id"), F.lit(SHARD_P)) * F.lit(SHARD_A) + F.lit(SHARD_B),
        F.lit(SHARD_P),
    ),
        F.lit(n_shards),
    ).cast("int")
    per = (
        docs.select(
            shard.alias("shard"),
            F.size(tokens(F.col("text"))).alias("n_toks"),
            F.col("n_chars"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    # total via an unpartitioned window over the n_shards-row aggregate
    # (a second agg subtree would re-scan + re-tokenize the corpus)
    return per.select(
        "shard",
        "n_docs",
        "n_tokens",
        "total_chars",
        (F.col("n_docs") / F.sum("n_docs").over(W.partitionBy())).alias("share"),
    )


def decontaminate_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of ``decontaminate_ngram_overlap``: the shuffle
    key is ``xxhash64(ngram)`` (8 bytes) instead of the ~30-byte shingle
    string — the form a 100 TB run would use. The string-keyed form is
    its full value oracle: xxhash64 only changes the shuffle key, so the
    per-doc counts are identical absent collisions (odds at fixture
    scale ≈ |shingles|²/2⁶⁴ — negligible, and deterministic at a fixed
    sf; equality is also asserted in tests).
    """
    docs = load_table(spark, sf_dir, "documents")
    ev = (
        _doc_shingles(docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 0))
        .select(F.col("doc_id").alias("eval_doc_id"), F.xxhash64("ngram").alias("gram_key"))
    )
    tr = _doc_shingles(docs.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)).select(
        "doc_id", F.xxhash64("ngram").alias("gram_key")
    )
    return (
        tr.join(F.broadcast(ev), "gram_key")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram_key").alias("shared_ngrams"),
            F.countDistinct("eval_doc_id").alias("eval_docs_hit"),
        )
        .select(
            "doc_id",
            "shared_ngrams",
            "eval_docs_hit",
            (F.col("shared_ngrams") >= DECON_MIN_SHARED).alias("contaminated"),
        )
    )


# domain-capping parameters: no source may contribute more than
# DOMAIN_CAP documents (the single-domain-dominance guard)
DOMAIN_CAP = 40


def domain_cap(spark: SparkSession, sf_dir: str, cap: int = DOMAIN_CAP) -> DataFrame:
    """Per-source document capping — the anti-dominance guard a crawled
    corpus runs so one domain cannot swamp the mix (the hard-cap
    complement of ``corpus_mix_rebalance``'s soft weights).

    Within each source, documents rank by the portable affine hash
    (``shard_manifest``'s constants — integer-only, engine-agnostic)
    with ``doc_id`` as the tie-break, and ranks past the cap drop.
    Output is the per-source summary (kept/dropped) — the keep
    predicate itself is ``rank <= cap``, composable into any downstream
    scan. One window shuffle on source + a sources-sized aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    hkey = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(SHARD_P)) * F.lit(SHARD_A) + F.lit(SHARD_B),
        F.lit(SHARD_P),
    )
    from pyspark.sql import Window as W

    rank = F.row_number().over(
        W.partitionBy("source").orderBy(hkey.asc(), F.col("doc_id").asc())
    )
    ranked = docs.select("source", rank.alias("rank"))
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("rank") <= cap).cast("int")).alias("n_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
            (F.col("n_docs") > cap).alias("capped"),
        )
    )


# Quality + repetition verdicts are CURATION PIPELINE STATE: a
# production pipeline computes the per-doc verdict table once per
# corpus snapshot and every downstream job (the clean-manifest
# composition, ad-hoc audits) joins the materialized form. Memoized
# per (session, corpus dir) and cache()d — same device as the dedup
# grams/sigs and IVF centroid state. Without this, Catalyst's filter
# pushdown substitutes the verdict expressions through the staged
# projections into the scan (one ~4 KB interpreted-HOF predicate per
# row, measured 21 s at sf0.1 for the composition vs ~2 s joined).
_VERDICT_STATE: dict[tuple[SparkSession, str], DataFrame] = {}


def verdict_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(doc_id, q_keep, r_keep)`` — cached quality + repetition
    verdicts, computed once per (session, corpus)."""
    key = (spark, sf_dir)
    if key not in _VERDICT_STATE:
        qf = quality_filter(spark, sf_dir).select(
            "doc_id", F.col("keep").alias("q_keep")
        )
        rep = repetition_signals(spark, sf_dir).select(
            "doc_id", F.col("keep").alias("r_keep")
        )
        df = qf.join(rep, "doc_id").cache()
        df.count()
        _VERDICT_STATE[key] = df
    return _VERDICT_STATE[key]


def clean_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP end-to-end curation composition — the whole cleaning
    pipeline a pre-training corpus runs, as ONE declarative plan over
    six of this module's operators:

      1. Gopher rule filter        (``quality_filter.keep``)
      2. repetition filter         (``repetition_signals.keep``)
      3. exact dedup               (survivor = lowest doc_id per content
                                    hash, ``dedup.exact_dedup_keep``)
      4. eval-slice exclusion      (held-out docs never train)
      5. n-gram decontamination    (``decontaminate_ngram_overlap``,
                                    docs with no overlap row are clean)
      6. per-domain cap            (rank survivors within source by the
                                    portable hash, keep ≤ DOMAIN_CAP)

    and emits the training-shard manifest of what remains (the
    ``shard_manifest`` aggregation over survivors).

    Every stage is a doc_id-keyed verdict relation joined onto the doc
    spine, so Catalyst sees one plan: the scan-side verdicts
    (quality/repetition) fuse into projections, dedup/decon join on
    hashed keys, and the only orderings are the per-source cap window
    and the final n_shards-row aggregate. At 100 TB this composition is
    why verdict operators return predicates instead of filtered copies
    — no stage materializes an intermediate corpus.
    """
    from gpu_accelerated_vector_indexing_spark.operators.dedup import exact_dedup_keep

    docs = load_table(spark, sf_dir, "documents")
    verdicts = verdict_state(spark, sf_dir)
    canon = exact_dedup_keep(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    decon = decontaminate_ngram_overlap(spark, sf_dir).select(
        "doc_id", "contaminated"
    )
    survivors = (
        docs.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
        .join(verdicts, "doc_id")
        .join(canon, "doc_id", "left_semi")
        .join(decon, "doc_id", "left")
        .filter(
            F.col("q_keep")
            & F.col("r_keep")
            & ~F.coalesce(F.col("contaminated"), F.lit(False))
        )
    )
    hkey = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(SHARD_P)) * F.lit(SHARD_A) + F.lit(SHARD_B),
        F.lit(SHARD_P),
    )
    capped = (
        survivors.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("source").orderBy(hkey.asc(), F.col("doc_id").asc())
            ),
        )
        .filter(F.col("rank") <= DOMAIN_CAP)
    )
    shard = F.pmod(hkey, F.lit(SHARD_N)).cast("int")
    per = (
        capped.select(
            shard.alias("shard"),
            F.size(tokens(F.col("text"))).alias("n_toks"),
            F.col("n_chars"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    # corpus total via an unpartitioned window over the n_shards-row
    # aggregate — a second agg subtree (crossJoin(broadcast(per.agg)))
    # would RE-RUN the whole upstream pipeline: Spark DAGs share no
    # intermediate results between subtrees, and this upstream is the
    # entire composition (measured 31.6 s vs 3.4 s at sf0.1)
    total = F.sum("n_docs").over(W.partitionBy())
    return per.select(
        "shard",
        "n_docs",
        "n_tokens",
        "total_chars",
        (F.col("n_docs") / total).alias("share"),
    )


# --- Naive-Bayes language/quality classifier ----------------------------------

NB_TARGET_LANG = "en"


def nb_language_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive-Bayes classifier scoring every document for
    "is this {target}-language text" from its token counts — the
    fastText/CCNet-style linear quality classifier of a training-data
    pipeline (Wenzek et al. 2019, arXiv:1911.00359), trained and applied
    in one Catalyst plan with no ML library and no UDF.

    Training = two hash aggregates over the exploded token stream
    (per-token class counts + class totals); the model is the per-token
    add-1-smoothed log-likelihood ratio, a |vocab|-row relation that
    broadcasts back onto the token stream for scoring. At 100 TB the
    token explode is the same shuffle every dedup/TF-IDF op here pays,
    the model stays bounded by vocabulary (broadcastable), and scoring
    is one broadcast-join + one groupBy — fully distributed, no driver
    state, retrainable per corpus snapshot.

    Determinism (repo transcendental policy, ≙ bigram_logprob_score):
    each ln is rounded to 6 d.p. and the per-doc sum runs through
    DECIMAL(18,6), so partial-aggregation order cannot move the result;
    the prior joins the sum before the single final cast to double.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("lang") == NB_TARGET_LANG).alias("is_tgt"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("c_tgt"),
        F.sum(F.when(F.col("is_tgt"), 0).otherwise(1)).alias("c_oth"),
    )
    tot = counts.agg(
        F.sum("c_tgt").alias("n_tgt"),
        F.sum("c_oth").alias("n_oth"),
        F.count("*").alias("v"),
    )
    weights = counts.join(F.broadcast(tot)).select(
        "token",
        F.round(
            F.log((F.col("c_tgt") + 1).cast("double") / (F.col("n_tgt") + F.col("v")).cast("double"))
            - F.log((F.col("c_oth") + 1).cast("double") / (F.col("n_oth") + F.col("v")).cast("double")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("w"),
    )
    prior = docs.agg(
        F.round(
            F.log(
                F.sum(F.when(F.col("lang") == NB_TARGET_LANG, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double")
            )
            - F.log(
                F.sum(F.when(F.col("lang") != NB_TARGET_LANG, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double")
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("p")
    )
    scored = (
        toks.join(F.broadcast(weights), "token")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("w").alias("sw"))
    )
    return (
        scored.join(F.broadcast(prior))
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            (F.col("p") + F.col("sw")).cast("double").alias("nb_score"),
            ((F.col("p") + F.col("sw")) > 0).alias("pred_tgt"),
        )
    )


# --- DSIR-style hashed n-gram importance sampling (r6) -----------------------
# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score raw documents by how much their hashed
# n-gram feature distribution looks like a TARGET corpus's, then keep
# the high-affinity tail. The target here is the English slice (the
# fixture's "wiki-like" subset); features are the engine's portable
# 5-char shingle hashes folded into DSIR_BUCKETS buckets.
DSIR_BUCKETS = 256

_DSIR_AFFINITY_STATE: dict[tuple[SparkSession, str], DataFrame] = {}


def dsir_bucket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, r_b, t_b, aff_micro) — per-bucket raw/target gram
    occurrence counts and the floor-scaled target-affinity weight
    ``floor(1e6·(t_b+1)/(r_b+2))`` (+1/+2 Laplace smoothing so empty
    buckets score the uninformative midpoint instead of dividing by
    zero). This is DSIR's learned importance model: a ≤DSIR_BUCKETS-row
    relation computed ONCE per corpus snapshot and broadcast to every
    scoring pass — memoized per (session, corpus) like the quantizer
    stats and centroid state (a pipeline fits the model on a sample
    once; per-document scoring must never re-aggregate the corpus).

    Determinism: counts are exact integers; the weight is one double
    multiply + divide on exact-integer operands (identical in any
    engine) floored to LONG micro-units — no libm anywhere.
    """
    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        _doc_shingle_hashes,
    )

    key = (spark, sf_dir)
    if key not in _DSIR_AFFINITY_STATE:
        docs = load_table(spark, sf_dir, "documents")
        grams = _doc_shingle_hashes(docs, keep=("lang",)).select(
            "lang", (F.col("h") % DSIR_BUCKETS).alias("bucket")
        )
        counts = grams.groupBy("bucket").agg(
            F.count("*").alias("r_b"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_b"),
        )
        df = counts.select(
            "bucket",
            "r_b",
            "t_b",
            F.floor(
                F.lit(1000000.0)
                * (F.col("t_b") + F.lit(1)).cast("double")
                / (F.col("r_b") + F.lit(2)).cast("double")
            )
            .cast("long")
            .alias("aff_micro"),
        ).cache()
        df.count()
        _DSIR_AFFINITY_STATE[key] = df
    return _DSIR_AFFINITY_STATE[key]


def dsir_importance_sample(
    spark: SparkSession, sf_dir: str, model: DataFrame | None = None
) -> DataFrame:
    """Per-document DSIR importance score + keep decision: every gram
    occurrence looks up its bucket's target affinity (broadcast join
    against the memoized ≤DSIR_BUCKETS-row model), the per-doc exact
    LONG micro-unit sum divides by the gram count (integer DIV — exact
    in any engine), and ``selected`` keeps documents whose per-gram
    affinity is ABOVE THE CORPUS-WEIGHTED MEAN — a relative cut
    (``mean_pg = Σ r_b·aff_micro DIV Σ r_b`` over the model rows), so
    the decision survives corpus-composition shifts where any absolute
    micro-unit threshold goes stale (measured: the sf0.01-calibrated
    absolute cut keeps 0 rows at sf0.1; the mean cut keeps the
    target-enriched half at both scales). The Σ r_b·aff_micro fold is
    a DECIMAL(38,0) promotion (applied in r8 — it was LONG with a
    documented ~9e12-gram bound; DuckDB's oracle promotes to HUGEINT
    automatically), so the mean cut cannot wrap at any corpus size;
    the quotient itself is ≤10⁶ and travels as BIGINT.

    Output: (doc_id, lang, n_grams, affinity_micro_sum,
    affinity_micro_per_gram, selected) for every document long enough
    to carry one shingle — the full per-document relation, so the
    oracle checks the score of every row, not just the kept set.

    Scale shape: ONE corpus gram pass (the same explode the dedup
    family prices), a broadcast lookup, one doc_id aggregate — no
    global sort and no top-N window; the threshold is ONE scalar off
    the ≤DSIR_BUCKETS-row model (no extra corpus pass), so 1000
    executors keep/drop their own partitions independently (the DSIR
    paper's own motivation for importance weights over pairwise
    comparisons).

    ``model`` swaps in an externally-loaded affinity relation (the
    persisted-state serve path, ``dsir_score_pretrained``) — ONE
    scoring definition for the in-session and pretrained forms, the
    graph family's beam_visited_over parameterization applied here.
    """
    from gpu_accelerated_vector_indexing_spark.operators.dedup import (
        _doc_shingle_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    grams = _doc_shingle_hashes(docs).select(
        "doc_id", (F.col("h") % DSIR_BUCKETS).alias("bucket")
    )
    if model is None:
        model = dsir_bucket_affinity(spark, sf_dir)
    baseline = model.agg(
        F.expr(
            "CAST(sum(CAST(r_b AS DECIMAL(38,0)) * aff_micro)"
            " DIV sum(CAST(r_b AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("mean_pg")
    )
    aff = model.select("bucket", "aff_micro")
    scored = (
        grams.join(F.broadcast(aff), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("aff_micro").alias("affinity_micro_sum"),
        )
    )
    per_gram = F.expr("affinity_micro_sum DIV n_grams")
    return (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .crossJoin(F.broadcast(baseline))
        .select(
            "doc_id",
            "lang",
            "n_grams",
            "affinity_micro_sum",
            per_gram.alias("affinity_micro_per_gram"),
            (per_gram >= F.col("mean_pg")).alias("selected"),
        )
    )


# one materialized DSIR-model dir per (session, corpus), like the
# dedup/PQ/graph state dirs: the roundtrip query is gate-checked and
# benched at N-run medians — without the memo every invocation would
# leave another state copy on disk
_DSIR_STATE_DIR: dict[tuple[SparkSession, str], str] = {}


def write_dsir_state(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Materialize the DSIR bucket-affinity model to parquet — the
    production form of ``dsir_bucket_affinity``: a sampler fits the
    ≤DSIR_BUCKETS-row model ONCE per corpus snapshot and ships it;
    every scoring job loads the table instead of re-aggregating the
    corpus grams (the tokenizer/PQ/dedup/graph state posture applied
    to the fourth learned-state family — VERDICT r6 missing #4)."""
    dsir_bucket_affinity(spark, sf_dir).write.mode("overwrite").parquet(
        f"{out_dir}/affinity"
    )


def dsir_state_dir(spark: SparkSession, sf_dir: str) -> str:
    """The persisted DSIR model's directory, written once per
    (session, corpus) — shared by the roundtrip digest and the
    pretrained scoring path."""
    import tempfile

    key = (spark, sf_dir)
    if key not in _DSIR_STATE_DIR:
        out = tempfile.mkdtemp(prefix="gpu_accelerated_vector_indexing_dsirstate_")
        write_dsir_state(spark, sf_dir, out)
        _DSIR_STATE_DIR[key] = out
    return _DSIR_STATE_DIR[key]


def dsir_state_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persist the DSIR model, read it back, and value-summarize it in
    one row — pinning that what lands on disk is EXACTLY the in-session
    model (the oracle re-derives the model straight from the text and
    computes the same sums). All checksums are order-free exact
    integers: bucket/count sums are plain bigint folds (int64 covers
    ~9e18 grams ≈ exabytes of text); ``Σ r_b·aff_micro`` — the exact
    weighted sum the relative keep-cut divides — is a DECIMAL(38,0)
    fold (r8: the LONG form wrapped past ~9e12 grams) shipped as two
    bigint-safe digits ``wsum_micro_hi/lo`` = (quotient, remainder)
    by 10¹⁸, because DuckDB collapses HUGEINT/DECIMAL pandas output
    to lossy float64 — so the digest stays exact AND comparable at
    every scale. A drift in ANY bucket's count or affinity moves the
    row."""
    m = spark.read.parquet(f"{dsir_state_dir(spark, sf_dir)}/affinity")
    return m.agg(
        F.count("*").alias("n_buckets"),
        F.sum("bucket").alias("bucket_id_sum"),
        F.sum("r_b").alias("raw_gram_sum"),
        F.sum("t_b").alias("target_gram_sum"),
        F.sum("aff_micro").alias("aff_micro_sum"),
        F.min("aff_micro").alias("aff_micro_min"),
        F.max("aff_micro").alias("aff_micro_max"),
        F.expr(
            "CAST(sum(CAST(r_b AS DECIMAL(38,0)) * aff_micro)"
            " DIV 1000000000000000000 AS BIGINT)"
        ).alias("wsum_micro_hi"),
        F.expr(
            "CAST(sum(CAST(r_b AS DECIMAL(38,0)) * aff_micro)"
            " % 1000000000000000000 AS BIGINT)"
        ).alias("wsum_micro_lo"),
    )


def dsir_score_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the corpus THROUGH the persisted DSIR model — the serve
    path of the fourth state family (fit → persist → score), mirroring
    the graph family's repair → persist → serve closure: the affinity
    relation is ``spark.read.parquet`` off :func:`dsir_state_dir`, not
    the in-session memo, and flows through the ONE scoring definition
    (``dsir_importance_sample``'s ``model`` parameter). Shares the
    in-session query's full oracle — persistence must be value-neutral
    down to every document's keep decision, or the hash breaks."""
    model = spark.read.parquet(f"{dsir_state_dir(spark, sf_dir)}/affinity")
    return dsir_importance_sample(spark, sf_dir, model=model)


# ---------------------------------------------------------------------------
# Curriculum scheduling (r7)
# ---------------------------------------------------------------------------

CURRICULUM_PHASES = 4
CURRICULUM_BUCKETS = 1000  # stopword_ratio snapped to a fixed 1e-3 grid


# The (doc_id, n_tokens, bucket) relation is CURRICULUM STATE shared
# by the plan rollup and the packing composition — and, within the
# packing query, by BOTH its phase side and its doc side. Without the
# memo each reference re-runs quality_filter's interpreted tokenize/
# stopword pass over the whole corpus (the cost its own docstring
# flags); cached, the scan is paid once per (session, corpus) like
# _pack_counts_state.
_CURRICULUM_BUCKETS_STATE: dict[tuple[SparkSession, str], DataFrame] = {}


def _curriculum_doc_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curriculum key: ``(doc_id, n_tokens, bucket)`` —
    the stopword-ratio quality signal snapped to the fixed 1e-3 grid.
    ONE definition (memoized + cached) shared by the plan rollup and
    the packing composition, so a doc can never sit in different
    buckets across the two queries."""
    key = (spark, sf_dir)
    if key not in _CURRICULUM_BUCKETS_STATE:
        df = quality_filter(spark, sf_dir).select(
            "doc_id",
            "n_tokens",
            F.floor(F.col("stopword_ratio") * CURRICULUM_BUCKETS)
            .cast("int")
            .alias("bucket"),
        ).cache()
        df.count()
        _CURRICULUM_BUCKETS_STATE[key] = df
    return _CURRICULUM_BUCKETS_STATE[key]


def curriculum_bucket_phases(
    spark: SparkSession, sf_dir: str, n_phases: int = CURRICULUM_PHASES
) -> DataFrame:
    """The bounded bucket→phase relation ``(bucket, n_docs, toks,
    phase)`` — the curriculum plan's middle stage, factored out (r8)
    so the packing composition consumes the SAME phase boundaries the
    plan publishes. One corpus shuffle to ≤1001 bucket rows; every
    ordered/cumulative step runs on that bounded relation."""
    per_bucket = _curriculum_doc_buckets(spark, sf_dir).groupBy("bucket").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("toks")
    )
    desc = W.orderBy(F.desc("bucket"))
    return per_bucket.select(
        "bucket",
        "n_docs",
        "toks",
        F.coalesce(
            F.sum("toks").over(desc.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("cum_before"),
        F.sum("toks").over(W.partitionBy()).alias("total"),
    ).select(
        "bucket",
        "n_docs",
        "toks",
        F.least(
            F.expr(f"cum_before DIV ((total + {n_phases - 1}) DIV {n_phases})"),
            F.lit(n_phases - 1),
        ).cast("int").alias("phase"),
    )


def corpus_curriculum_plan(
    spark: SparkSession, sf_dir: str, n_phases: int = CURRICULUM_PHASES
) -> DataFrame:
    """Curriculum-learning schedule: order the corpus easy→hard by a
    quality signal and split it into ``n_phases`` phases of roughly
    equal TOKEN budget — the plan a staged pre-training run consumes
    (clean prose first, noisier text in later phases).

    Easy-first proxy: stopword_ratio DESC (the Gopher-style signal
    ``quality_filter`` already computes — high stopword density marks
    conventional prose). The scale-safe shape is two-pass, never a
    corpus-wide ordered window:

    1. snap each doc's ratio to a fixed 1e-3 grid and aggregate
       (n_docs, sum_tokens) per bucket — ONE shuffle to ≤1001 rows;
    2. cumulative token sums + phase assignment run as windows over
       that bounded bucket relation (driver-sized at any corpus size),
       then one tiny rollup to ``n_phases`` rows.

    Docs sharing a grid bucket stay in one phase (grid granularity is
    the documented resolution — phase budgets are equal to within one
    bucket's tokens). All arithmetic is integer (token sums, ceil-div
    budget, integer-DIV phase), so the plan is exact cross-engine.
    """
    return (
        curriculum_bucket_phases(spark, sf_dir, n_phases)
        .groupBy("phase")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("toks").alias("tokens"),
            F.count("*").alias("n_buckets"),
            F.round(F.max("bucket") / F.lit(CURRICULUM_BUCKETS), 6).alias("quality_hi"),
            F.round(F.min("bucket") / F.lit(CURRICULUM_BUCKETS), 6).alias("quality_lo"),
        )
        .orderBy("phase")
    )


def curriculum_pack_manifest(
    spark: SparkSession,
    sf_dir: str,
    seq_len: int | None = None,
    n_phases: int = CURRICULUM_PHASES,
    n_ranges: int | None = None,
) -> DataFrame:
    """Phase-aware sequence packing: the curriculum × packing
    composition (VERDICT r7 #3). Each curriculum phase's documents
    concatenate — easy→hard WITHIN the phase (bucket DESC, doc_id ASC)
    — into that phase's own token stream, which cuts into fixed
    ``seq_len`` chunks exactly like ``text_analysis.pack_sequences``.
    Output: one row per (phase, chunk_id) — the manifest a STAGED
    pre-training loader consumes (phase 0's packed sequences first).

    Phase boundaries are ``curriculum_bucket_phases``' — the same
    relation ``corpus_curriculum_plan`` publishes, so the packed
    phases ARE the plan's phases. Packed token counts are the pack
    family's BPE-ish counts (``_pack_counts_state``); budget counts
    stay the plan's whitespace tokens — each composition partner keeps
    its own published semantics.

    Scale shape — a per-phase prefix sum with NO corpus-wide ordered
    window, generalizing ``range_prefix_sum``'s two-pass recipe to
    (phase, bucket) streams:

    1. per-doc work keys on (phase, bucket, pid) where ``pid`` is a
       fixed-width doc_id range — corpus-partitioned, fully parallel;
    2. subtotals aggregate to the BOUNDED (phase, bucket, pid)
       relation (≤ buckets × ranges rows, corpus-size-independent);
       base offsets cumulate as a window over THAT relation in phase
       order (bucket DESC, pid ASC) — the curriculum plan's
       bounded-relation posture, replacing range_prefix_sum's driver
       collect so nothing scales with |corpus|;
    3. each doc's stream start = its (phase, bucket, pid) base + a
       running sum WITHIN its pid range (per-range window, parallel);
    4. the chunk fan-out is ⌈tokens/seq_len⌉ segment rows, never
       quadratic, and the final rollup keys on (phase, chunk_id).

    All arithmetic is integer (token counts, DIV chunking), so the
    manifest is exact cross-engine.
    """
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import (
        PACK_SEQ_LEN,
        _pack_counts_state,
    )

    if seq_len is None:
        seq_len = PACK_SEQ_LEN
    n_ranges = n_ranges or spark.sparkContext.defaultParallelism
    phases = curriculum_bucket_phases(spark, sf_dir, n_phases).select("bucket", "phase")
    counts = _pack_counts_state(spark, sf_dir)  # (doc_id, n_toks) — cached state
    docs = (
        _curriculum_doc_buckets(spark, sf_dir)
        .select("doc_id", "bucket")
        .join(F.broadcast(phases), "bucket")
        .join(counts, "doc_id")
    )
    lo, hi = counts.agg(F.min("doc_id"), F.max("doc_id")).first()
    span = max((int(hi) - int(lo)) // n_ranges + 1, 1) if hi is not None else 1
    parted = docs.withColumn("pid", F.expr(f"(doc_id - {int(lo or 0)}) div {span}"))
    w_base = (
        W.partitionBy("phase")
        .orderBy(F.desc("bucket"), F.asc("pid"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    bases = (
        parted.groupBy("phase", "bucket", "pid")
        .agg(F.sum("n_toks").alias("pv"))
        .select(
            "phase",
            "bucket",
            "pid",
            F.coalesce(F.sum("pv").over(w_base), F.lit(0)).alias("base"),
        )
    )
    w_run = (
        W.partitionBy("phase", "bucket", "pid")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    with_s = parted.join(F.broadcast(bases), ["phase", "bucket", "pid"]).withColumn(
        "s", F.col("base") + F.sum("n_toks").over(w_run) - F.col("n_toks")
    )
    from gpu_accelerated_vector_indexing_spark.operators.text_analysis import chunk_manifest

    return chunk_manifest(with_s, seq_len, group_cols=("phase",))


# ---------------------------------------------------------------------------
# Corpus snapshot diff (r8) — dataset versioning
# ---------------------------------------------------------------------------

# Deterministic snapshot derivation from the one fixture corpus: "old"
# lacks the docs added later, "new" lacks the docs removed later, and a
# slice of surviving docs is edited in place — the three change classes
# a dataset-version diff must classify.
SNAP_REMOVED_MOD, SNAP_REMOVED_REM = 17, 3  # in old only  → removed
SNAP_ADDED_MOD, SNAP_ADDED_REM = 19, 5      # in new only  → added
SNAP_EDIT_MOD, SNAP_EDIT_REM = 23, 1        # text changed in new
# The in-place edit: case change + an appended revision marker. The
# marker matters for the CDC → index-refresh composition
# (index_build.index_refresh_cdc): the hash featurizer lowercases, so
# a case-only edit would re-embed to the SAME vector and the refresh's
# re-embedding path would be vacuously exercised; the extra token makes
# an edited doc's embedding genuinely move.
SNAP_EDIT_SUFFIX = " rev2"


def snapshot_old_docs(docs: DataFrame) -> DataFrame:
    """``(doc_id, text)`` of the OLD snapshot — the ONE definition,
    shared by the diff and the CDC index refresh."""
    return docs.filter(
        F.col("doc_id") % SNAP_REMOVED_MOD != SNAP_REMOVED_REM
    ).select("doc_id", "text")


def snapshot_new_docs(docs: DataFrame) -> DataFrame:
    """``(doc_id, text)`` of the NEW snapshot (edited slice rewritten)."""
    return docs.filter(F.col("doc_id") % SNAP_ADDED_MOD != SNAP_ADDED_REM).select(
        "doc_id",
        F.when(
            F.col("doc_id") % SNAP_EDIT_MOD == SNAP_EDIT_REM,
            F.concat(F.upper(F.col("text")), F.lit(SNAP_EDIT_SUFFIX)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


# --- snapshot N+2 (r10): the SECOND nightly cycle --------------------------
# Generation 2 is where a CDC refresh design is actually tested: v3's
# change classes deliberately OVERLAP v2's so cycle 2 must retire
# cycle-1 APPENDS, not just base rows. Each class below names the
# lifecycle edge it exercises (populations at the 500-doc fixture):
#   - v2-edited docs split by parity: even → REMOVED in v3 (a gen-1
#     append gets tombstoned; 10 docs), odd → edited AGAIN (" rev3" on
#     top of " rev2": gen-1 retired, gen-2 appended; 10 docs);
#   - a slice of v2-ADDED docs is removed (pure gen-1 row, no gen-0
#     ancestor; 6 docs);
#   - a slice of v1-removed docs is RE-ADDED (its gen-0 tombstone from
#     cycle 1 must not shadow the gen-2 resurrection; 9 docs);
#   - a fresh mod-43 slice of previously-unchanged docs is edited
#     (gen-0 retired at dead-gen 1, gen-2 appended; 12 docs).
SNAP3_READD_MOD, SNAP3_READD_REM = 3, 0   # among docs absent from v2
SNAP3_DROPADD_MOD, SNAP3_DROPADD_REM = 5, 0  # among v2-added docs
SNAP3_EDIT_MOD, SNAP3_EDIT_REM = 43, 6    # fresh v3 edits
SNAP3_EDIT_SUFFIX = " rev3"


def _in_v2(col):
    return col % SNAP_ADDED_MOD != SNAP_ADDED_REM


def _v3_membership(col):
    """(in_v3, removed_in_v3, edited_in_v3) boolean exprs over a doc_id
    column — the ONE row-local definition of snapshot N+2, shared by
    the snapshot relation, the v2→v3 diff, and the gen-2 refresh."""
    v2_edited = col % SNAP_EDIT_MOD == SNAP_EDIT_REM
    v2_added = col % SNAP_REMOVED_MOD == SNAP_REMOVED_REM
    removed_v3 = _in_v2(col) & (
        (v2_edited & (col % 2 == 0))
        | (v2_added & (col % SNAP3_DROPADD_MOD == SNAP3_DROPADD_REM))
    )
    readded_v3 = (col % SNAP_ADDED_MOD == SNAP_ADDED_REM) & (
        col % SNAP3_READD_MOD == SNAP3_READD_REM
    )
    in_v3 = (_in_v2(col) & ~removed_v3) | readded_v3
    edited_v3 = in_v3 & (
        (v2_edited & (col % 2 == 1))
        | (col % SNAP3_EDIT_MOD == SNAP3_EDIT_REM)
    )
    return in_v3, removed_v3, edited_v3


def snapshot_v3_docs(docs: DataFrame) -> DataFrame:
    """``(doc_id, text)`` of snapshot N+2. Text is a pure row-local
    function: the v2 edit rule applied first (so a twice-edited doc
    carries BOTH suffixes), then the v3 suffix for the v3-edited
    slice — both engines reconstruct it from (doc_id, text) alone."""
    col = F.col("doc_id")
    in_v3, _, edited_v3 = _v3_membership(col)
    v2_text = F.when(
        col % SNAP_EDIT_MOD == SNAP_EDIT_REM,
        F.concat(F.upper(F.col("text")), F.lit(SNAP_EDIT_SUFFIX)),
    ).otherwise(F.col("text"))
    v3_text = F.when(
        edited_v3, F.concat(v2_text, F.lit(SNAP3_EDIT_SUFFIX))
    ).otherwise(v2_text)
    return docs.filter(in_v3).select("doc_id", v3_text.alias("text"))


def corpus_snapshot_diff_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff snapshot N+1 → N+2 by content hash — the SECOND cycle's
    change feed, same md5 full-outer-join shape (and scale posture) as
    :func:`corpus_snapshot_diff`."""
    docs = load_table(spark, sf_dir, "documents")
    old = snapshot_new_docs(docs).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("old_md5")
    )
    new = snapshot_v3_docs(docs).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("new_md5")
    )
    return old.join(new, "doc_id", "full_outer").select(
        "doc_id",
        "old_md5",
        "new_md5",
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two corpus snapshots by content hash — the CDC primitive of
    dataset VERSIONING (which documents were added, removed, or edited
    between two crawls/releases), the corpus-level sibling of the
    events family's merge/SCD2 ops. One row per doc_id present in
    either snapshot: ``status ∈ {added, removed, changed, unchanged}``
    plus both snapshots' md5 (NULL where absent).

    Snapshots derive deterministically from the fixture (modular
    doc_id slices; the "edit" uppercases the text), so both engines
    reconstruct identical inputs. Scale shape: two scans of the SAME
    table feed ONE doc_id-keyed full-outer join (at 100 TB: two
    snapshot scans co-partitioned on the join key) and the hash
    compare is a projection — no pair-space anywhere, and content
    equality via md5 means the diff never ships text through the
    shuffle, only 32-byte digests.
    """
    docs = load_table(spark, sf_dir, "documents")
    old = snapshot_old_docs(docs).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("old_md5")
    )
    new = snapshot_new_docs(docs).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("new_md5")
    )
    # NOTE: a doc sliced out of OLD by the removed-mod and out of NEW
    # by the added-mod appears in neither snapshot and (correctly)
    # not in the diff.
    return old.join(new, "doc_id", "full_outer").select(
        "doc_id",
        "old_md5",
        "new_md5",
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
