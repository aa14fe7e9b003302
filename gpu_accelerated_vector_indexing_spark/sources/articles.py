"""JSON article-directory ingestion (the reference's document store).

The reference keeps its corpus as a directory of JSON files, each a
top-level ARRAY of article objects with a ``"text"`` field, addressed
positionally: global id = (rows of all sorted-earlier files) + in-file
offset (SURVEY.md §2 O4/O5; reference IVF.cpp:52-81 builds exactly that
``idx2file`` index from ``file_lengths.json``, and embedding.py:26-31
defines the ordering with ``sorted(glob.glob(...))``).

Spark-first shape:

- whole-file text read (executor-side, parallel over files) →
  ``from_json`` into ``ARRAY<STRUCT>`` → ``posexplode`` keeps the
  in-file offset as a column.
- The global id is assigned from per-file article COUNTS (tiny, one row
  per file) via a running-offset window — document text never shuffles
  for id assignment.
- ``file_lengths.json`` (O4) is derived output here, not required
  input: :func:`file_lengths` reproduces it from the data.
- Positional ``mapBack.get(idx)`` (O6, IVF.cpp:104-118) becomes an
  equi-join on ``doc_id``; the whole-file cache (O5, IVF.cpp:84-101)
  becomes ``df.cache()`` at the caller's discretion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

ARTICLE_SCHEMA = "ARRAY<STRUCT<id: STRING, title: STRING, text: STRING>>"


def read_article_dir(
    spark: SparkSession, docs_dir: str, schema: str = ARTICLE_SCHEMA
) -> DataFrame:
    """Directory of JSON array files → ``(doc_id, file, offset, title, text)``.

    ``doc_id`` follows the reference's global ordering contract
    (sorted file path, then in-file position — embedding.py:26).
    """
    raw = (
        spark.read.text(f"{docs_dir}/*.json", wholetext=True)
        .select(F.input_file_name().alias("file"), F.from_json("value", schema).alias("arts"))
    )
    exploded = raw.select("file", F.posexplode("arts").alias("offset", "a")).select(
        "file", "offset", F.col("a.title").alias("title"), F.col("a.text").alias("text")
    )
    counts = exploded.groupBy("file").agg(F.count("*").alias("n_articles"))
    offsets = counts.withColumn(
        "base",
        F.sum("n_articles").over(W.orderBy("file").rowsBetween(W.unboundedPreceding, -1)),
    ).select("file", F.coalesce("base", F.lit(0)).alias("base"))
    return (
        exploded.join(F.broadcast(offsets), "file")
        .select(
            (F.col("base") + F.col("offset")).alias("doc_id"),
            "file",
            "offset",
            "title",
            "text",
        )
    )


def file_lengths(articles: DataFrame) -> DataFrame:
    """``(file, num_articles)`` — the ``file_lengths.json`` manifest
    (reference embedding.py:30, 37-38; consumed by IVF.cpp:52-81)."""
    return articles.groupBy("file").agg(F.count("*").alias("num_articles")).orderBy("file")


def write_article_dir(
    docs: DataFrame, out_dir: str, docs_per_file: int = 512
) -> None:
    """Export documents to the reference's article-JSON layout: a
    directory of files, each a top-level JSON ARRAY of article objects
    (the store ``read_article_dir`` ingests; reference IVF.cpp:52-81,
    embedding.py:26-31).

    File = zero-padded ``doc_id // docs_per_file`` bucket, so
    sorted-filename order reproduces ``doc_id`` order and the reader's
    positional global ids equal the originals. Executor-side: each
    bucket lands wholly in one task (``repartition(bucket)``) and
    streams its array out row by row — no driver collect, O(1) task
    memory beyond one document.
    """
    parted = (
        docs.select(
            (F.col("doc_id") / docs_per_file).cast("long").alias("bucket"),
            "doc_id",
            "text",
        )
        .repartition(F.col("bucket"))
        .sortWithinPartitions("bucket", "doc_id")
    )

    def write_partition(rows) -> None:
        import json
        import os

        cur, fh, first = None, None, True
        try:
            for r in rows:
                if r[0] != cur:
                    if fh is not None:
                        fh.write("]")
                        fh.close()
                    cur = r[0]
                    fh = open(
                        os.path.join(out_dir, f"articles_{int(cur):06d}.json"), "w"
                    )
                    fh.write("[")
                    first = True
                if not first:
                    fh.write(",")
                first = False
                fh.write(
                    json.dumps(
                        {"id": str(r[1]), "title": "", "text": r[2]},
                        ensure_ascii=True,
                    )
                )
        finally:
            if fh is not None:
                fh.write("]")
                fh.close()

    parted.foreachPartition(write_partition)


def lookup_texts(articles: DataFrame, ids: DataFrame, truncate: int = 200) -> DataFrame:
    """Join result ids to article snippets.

    ≙ the reference's print loop ``mapBack.get(id)`` + 200-char
    truncation (IVF.cpp:688-710). ``ids`` carries a ``doc_id`` column
    and is expected to be top-k-sized → broadcast, so the document
    store is never shuffled.
    """
    snippet: Column = F.substring("text", 1, truncate).alias("snippet")
    return articles.join(F.broadcast(ids), "doc_id").select("doc_id", snippet)
