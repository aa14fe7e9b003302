"""A custom Spark Python DataSource for the reference's raw float32
``.bin`` matrix format — ``spark.read.format("float32bin")``.

Where ``sources/binary.read_float32_bin`` composes built-ins
(binaryFile + mapInPandas), this is the first-class connector form of
the same reader (SURVEY.md §2 O1/O2/O7: headerless row-major float32,
row count = file_size / (4·dim), IVF.cpp:456-486): a DataSource V2
implementation through the Python DataSource API (Spark 4), with

* schema declared up front (``vec_id BIGINT, path STRING, pos BIGINT,
  embedding ARRAY<FLOAT>``) — consumers get column pruning and a real
  plan node, not an opaque RDD;
* one InputPartition PER FILE — a directory of cluster files scans in
  parallel with no driver I/O beyond the listing;
* global ``vec_id`` assignment identical to the reference's
  sorted-filename convention (embedding.py:26): base offsets are
  computed from file SIZES at planning time, so identity costs nothing.

Registration is idempotent: ``register(spark)`` then
``spark.read.format("float32bin").option("dim", 64).load(path)``.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FLOAT32_BYTES = 4

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("path", StringType()),
        StructField("pos", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


class _BinPartition(InputPartition):
    def __init__(self, path: str, base: int, dim: int):
        self.path = path
        self.base = base
        self.dim = dim


class Float32BinReader(DataSourceReader):
    def __init__(self, options: dict):
        if "path" not in options:
            raise ValueError("float32bin: .load(path) is required")
        if "dim" not in options:
            raise ValueError("float32bin: .option('dim', N) is required")
        self.path = options["path"]
        self.dim = int(options["dim"])

    def partitions(self) -> Sequence[InputPartition]:
        """One partition per file; base ids from sizes alone (no reads).

        ≙ IVF.cpp:473-476 divisibility assert + embedding.py:26
        sorted-order global ids.
        """
        paths = sorted(glob.glob(self.path)) if any(
            c in self.path for c in "*?["
        ) else (
            sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".bin")
            )
            if os.path.isdir(self.path)
            else [self.path]
        )
        if not paths:
            raise ValueError(f"float32bin: no files under {self.path}")
        row_bytes = FLOAT32_BYTES * self.dim
        parts, base = [], 0
        for p in paths:
            size = os.path.getsize(p)
            if size % row_bytes != 0:
                raise ValueError(f"file size not divisible by {row_bytes}: {p}")
            parts.append(_BinPartition(p, base, self.dim))
            base += size // row_bytes
        return parts

    def read(self, partition: _BinPartition) -> Iterator[tuple]:
        import numpy as np

        mat = np.fromfile(partition.path, dtype="<f4").reshape(-1, partition.dim)
        for pos in range(mat.shape[0]):
            yield (partition.base + pos, partition.path, pos, [float(x) for x in mat[pos]])


class _BinStreamPartition(InputPartition):
    def __init__(self, path: str, base: int, dim: int, n_rows: int):
        self.path = path
        self.base = base
        self.dim = dim
        self.n_rows = n_rows


class Float32BinStreamReader(DataSourceStreamReader):
    """File-arrival streaming over a ``.bin`` directory with
    EXECUTOR-SIDE decode: each new file between two offsets becomes one
    ``InputPartition`` whose numpy decode runs as an executor task —
    the driver only LISTS files and stats sizes. (The r9-r10 form used
    ``SimpleDataSourceStreamReader``, whose ``read()`` materializes
    every row ON THE DRIVER — at 100 TB the driver reads every byte;
    the partition API is the difference between that bottleneck and
    per-file scan tasks. VERDICT r10 next #4.)

    Offset format is unchanged from the Simple form: the sorted list of
    ``[path, row_count]`` pairs already processed plus the running row
    base, so ``vec_id`` assignment stays globally consistent with the
    batch reader's sorted-filename convention (embedding.py:26) as long
    as files arrive in name order (the index-build pipeline writes
    cluster_embeddings_{i} in order). ``partitions(start, end)`` derives
    each new file's base deterministically from the two offsets alone
    (new files in sorted-path order, bases running from ``start.base``
    with the RECORDED row counts — not current file sizes), so a
    committed range replays identically after a restart; a file
    replaced/appended after commit is detected by the size-vs-recorded
    check and raised instead of silently re-basing replayed ``vec_id``s.
    """

    def __init__(self, options: dict):
        if "path" not in options:
            raise ValueError("float32bin: .load(path) is required")
        if "dim" not in options:
            raise ValueError("float32bin: .option('dim', N) is required")
        self.path = options["path"]
        self.dim = int(options["dim"])
        # running listing state for latestOffset (driver-side, listing
        # only): path -> recorded row count, in arrival order semantics
        self._seen: dict[str, int] = {}
        self._base = 0

    def _list(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".bin")
            )
        return sorted(glob.glob(self.path))

    def initialOffset(self) -> dict:
        return {"seen": [], "base": 0}

    def latestOffset(self) -> dict:
        row_bytes = FLOAT32_BYTES * self.dim
        for p in self._list():
            if p in self._seen:
                continue
            size = os.path.getsize(p)
            if size % row_bytes != 0:
                raise ValueError(f"file size not divisible by {row_bytes}: {p}")
            n_rows = size // row_bytes
            self._seen[p] = n_rows
            self._base += n_rows
        return {
            "seen": sorted([p, n] for p, n in self._seen.items()),
            "base": self._base,
        }

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        start_seen = {p for p, _ in start.get("seen", [])}
        base = int(start.get("base", 0))
        row_bytes = FLOAT32_BYTES * self.dim
        parts: list[InputPartition] = []
        for p, n_recorded in sorted(
            (p, int(n)) for p, n in end.get("seen", []) if p not in start_seen
        ):
            size = os.path.getsize(p)
            if size != n_recorded * row_bytes:
                raise ValueError(
                    f"float32bin replay: {p} changed since commit "
                    f"({size} bytes on disk vs {n_recorded} recorded rows "
                    f"x {row_bytes} bytes) — refusing to re-base vec_ids"
                )
            parts.append(_BinStreamPartition(p, base, self.dim, n_recorded))
            base += n_recorded
        return parts

    def read(self, partition: _BinStreamPartition) -> Iterator[tuple]:
        # executor-side: one task per file, same rows as the batch reader
        import numpy as np

        mat = np.fromfile(partition.path, dtype="<f4").reshape(-1, partition.dim)
        if mat.shape[0] != partition.n_rows:
            raise ValueError(
                f"float32bin: {partition.path} holds {mat.shape[0]} rows on "
                f"disk vs {partition.n_rows} recorded at planning time"
            )
        for pos in range(mat.shape[0]):
            yield (partition.base + pos, partition.path, pos, [float(x) for x in mat[pos]])

    def commit(self, end: dict) -> None:
        pass


class Float32BinDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "float32bin"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> Float32BinReader:
        return Float32BinReader(self.options)

    def streamReader(self, schema: StructType) -> Float32BinStreamReader:
        # the PARTITIONED stream API (executor-side decode); the Simple
        # form this replaces decoded every row on the driver
        return Float32BinStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(Float32BinDataSource)
