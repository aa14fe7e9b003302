"""Raw float32 ``.bin`` / ``.npy`` vector ingestion.

Format parity with the reference's binary index files (SURVEY.md §2
O1/O2/O7/O24): headerless row-major float32 matrices whose row count is
inferred from file size (reference IVF.cpp:456-486, 650-672), and
``.npy`` files as written by the build pipeline (reference
clusters.py:32-35, test.py:25; the header-strip conversion is
convert_npy_bin.py:4-10).

Spark-first shape:

- ``spark.read.format("binaryFile")`` lists and reads files as
  executors-side rows — no driver I/O, so a directory of thousands of
  cluster files ingests in parallel.
- Decoding is an Arrow-batched ``mapInPandas`` over whole files
  (NumPy ``frombuffer`` — zero-copy per file).
- Global row identity follows the reference's convention: files in
  sorted-path order, rows in file order (reference embedding.py:26
  ``sorted(glob.glob(...))`` defines global ids). Per-file base offsets
  come from file SIZES alone (size // (4·dim)), so the id assignment
  never shuffles the vector payload.
- The size-divisibility check of IVF.cpp:473-476/662-664 is enforced at
  decode time (malformed file → ValueError naming the file).

These readers exist for ingestion/migration parity; the engine's
canonical storage is Parquet (``sources.fixtures``).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

FLOAT32_BYTES = 4

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _with_global_ids(decoded: DataFrame, counts: DataFrame) -> DataFrame:
    """vec_id = (cumulative rows of all sorted-earlier files) + in-file pos.

    ``counts`` is (path, n_rows) — tiny (one row per FILE), so the
    running-offset window and the join back are broadcast-cheap.
    """
    offsets = counts.withColumn(
        "base",
        F.sum("n_rows").over(W.orderBy("path").rowsBetween(W.unboundedPreceding, -1)),
    ).select("path", F.coalesce("base", F.lit(0)).alias("base"))
    return (
        decoded.join(F.broadcast(offsets), "path")
        .select((F.col("base") + F.col("pos")).alias("vec_id"), "path", "pos", "embedding")
    )


def read_float32_bin(spark: SparkSession, path: str, dim: int) -> DataFrame:
    """Headerless row-major float32 matrix file(s) → vectors.

    ≙ reference O1/O2/O7 (IVF.cpp:456-510, 650-672): row count is
    ``file_size / (4·dim)``, asserted exactly divisible.

    Returns ``(vec_id BIGINT, path STRING, pos BIGINT,
    embedding ARRAY<FLOAT>)`` with vec_id global over sorted paths.
    """
    files = spark.read.format("binaryFile").load(path)

    bad = files.filter(F.col("length") % (FLOAT32_BYTES * dim) != 0).select("path").take(1)
    if bad:  # ≙ IVF.cpp:473-476 divisibility assert, checked from listing metadata only
        raise ValueError(f"file size not divisible by {FLOAT32_BYTES * dim}: {bad[0].path}")

    counts = files.select("path", (F.col("length") / (FLOAT32_BYTES * dim)).cast("long").alias("n_rows"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                mat = np.frombuffer(content, dtype="<f4").reshape(-1, dim)
                yield pd.DataFrame(
                    {
                        "path": path_,
                        "pos": np.arange(mat.shape[0], dtype=np.int64),
                        "embedding": list(mat),
                    }
                )

    decoded = files.select("path", "content").mapInPandas(decode, _DECODED_SCHEMA)
    return _with_global_ids(decoded, counts)


def read_npy(spark: SparkSession, path: str) -> DataFrame:
    """``.npy`` file(s) → vectors, self-describing dtype/shape.

    ≙ reference O24's input side (convert_npy_bin.py:6 ``np.load``):
    the 128-byte header the reference strips is instead parsed, so any
    float dtype widens losslessly to float32 storage. 1-D arrays are
    treated as a single vector (shape (d,) ≙ a (1, d) query file).

    Returns the same schema as :func:`read_float32_bin`; here the
    per-file row counts come from the decoded matrices (npy headers are
    not visible to the file listing), still one tiny row per file.
    """
    files = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                arr = np.load(io.BytesIO(content), allow_pickle=False)
                if arr.ndim == 1:
                    arr = arr.reshape(1, -1)
                if arr.ndim != 2:
                    raise ValueError(f"expected 1-D/2-D array in {path_}, got shape {arr.shape}")
                mat = np.ascontiguousarray(arr, dtype=np.float32)
                yield pd.DataFrame(
                    {
                        "path": path_,
                        "pos": np.arange(mat.shape[0], dtype=np.int64),
                        "embedding": list(mat),
                    }
                )

    decoded = files.select("path", "content").mapInPandas(decode, _DECODED_SCHEMA).cache()
    counts = decoded.groupBy("path").agg(F.count("*").alias("n_rows"))
    return _with_global_ids(decoded, counts)


# Ceiling for the driver-side single-file export: 100k × 384-dim
# float32 ≈ 150 MB — comfortably collectable; anything bigger is a
# corpus and must go through the distributed per-cluster writer.
BIN_EXPORT_MAX_ROWS = 100_000


def write_float32_bin(df: DataFrame, vec_col: str, out_path: str) -> int:
    """Export vectors to one headerless float32 ``.bin`` file.

    ≙ reference convert_npy_bin.py:6-10 (``.npy → .bin``) — an
    interchange utility for handing query/centroid vectors back to a
    reference-format consumer. Rows are written in ``vec_id`` order.
    Deliberately driver-side (np.tofile): the reference format is a
    single unsplittable file, so this is for SMALL relations (queries,
    centroids) — exporting a corpus goes to Parquet instead. The
    small-relation contract is self-enforcing: relations past
    ``BIN_EXPORT_MAX_ROWS`` are refused with a pointer to the
    distributed ``write_float32_bin_clustered`` (VERDICT r3 #4 —
    nothing else stopped a caller collecting a corpus to the driver).
    """
    import numpy as np

    # one execution, bounded collect: limit(MAX+1) caps what can ever
    # reach the driver, and the guard checks the collected length — the
    # upstream plan runs ONCE (ADVICE r4: probe-then-collect ran it
    # twice, doubling the export cost of an expensive derived relation)
    rows = df.orderBy("vec_id").select(vec_col).limit(BIN_EXPORT_MAX_ROWS + 1).collect()
    if len(rows) > BIN_EXPORT_MAX_ROWS:
        raise ValueError(
            f"write_float32_bin is a driver-side export for small relations "
            f"(queries/centroids): more than {BIN_EXPORT_MAX_ROWS} rows. "
            f"Use write_float32_bin_clustered for corpus-sized exports."
        )
    mat = np.asarray([r[0] for r in rows], dtype=np.float32)
    mat.tofile(out_path)
    return mat.shape[0]


def write_float32_bin_clustered(
    df: DataFrame,
    out_dir: str,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Distributed export to the reference's per-cluster ``.bin`` layout
    (clusters.py:32-35: one ``cluster_embeddings_{label:03d}.bin`` per
    cluster, rows in id order) — executor-side, no driver collect.

    Shape: ``repartition(label)`` puts each cluster wholly inside one
    task; ``sortWithinPartitions(label, id)`` lets the task stream rows
    straight into the current cluster's file with O(1) memory (a plain
    buffered append — no per-cluster matrix is ever materialized). A
    task that receives several labels (hash co-residency) just rolls to
    the next file when the label changes. At cluster scale ``out_dir``
    is a mounted DFS path; the writer is format-identical either way.
    """
    parted = (
        df.select(label_col, id_col, vec_col)
        .repartition(F.col(label_col))
        .sortWithinPartitions(label_col, id_col)
    )

    def write_partition(rows) -> None:
        import os

        import numpy as np

        cur_label, fh = None, None
        try:
            for r in rows:
                lab = r[0]
                if lab != cur_label:
                    if fh is not None:
                        fh.close()
                    cur_label = lab
                    fh = open(
                        os.path.join(out_dir, f"cluster_embeddings_{int(lab):03d}.bin"),
                        "wb",
                    )
                fh.write(np.asarray(r[2], dtype="<f4").tobytes())
        finally:
            if fh is not None:
                fh.close()

    parted.foreachPartition(write_partition)


def write_npy_clustered(
    df: DataFrame,
    out_dir: str,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Distributed per-cluster ``.npy`` export — the reference build
    pipeline's own output layout (clusters.py:32-35 ``np.save`` per
    cluster matrix), written executor-side.

    Unlike the headerless ``.bin`` writer, the npy header needs the row
    count up front, so each task buffers ONE cluster's matrix before
    ``np.save`` — memory is bounded by the largest cluster, exactly the
    reference's own per-cluster materialization shape. Same
    repartition(label) + sortWithinPartitions placement contract as
    :func:`write_float32_bin_clustered`.
    """
    parted = (
        df.select(label_col, id_col, vec_col)
        .repartition(F.col(label_col))
        .sortWithinPartitions(label_col, id_col)
    )

    def write_partition(rows) -> None:
        import os

        import numpy as np

        state: dict = {"label": None, "buf": []}

        def flush() -> None:
            if state["label"] is not None and state["buf"]:
                np.save(
                    os.path.join(
                        out_dir, f"cluster_embeddings_{int(state['label']):03d}.npy"
                    ),
                    np.asarray(state["buf"], dtype=np.float32),
                )

        for r in rows:
            if r[0] != state["label"]:
                flush()
                state["label"] = r[0]
                state["buf"] = []
            state["buf"].append(list(r[2]))
        flush()

    parted.foreachPartition(write_partition)
