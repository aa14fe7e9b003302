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
    InputPartition,
    SimpleDataSourceStreamReader,
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


class Float32BinStreamReader(SimpleDataSourceStreamReader):
    """File-arrival streaming over a ``.bin`` directory: each
    micro-batch picks up files not seen by the previous offset — the
    same semantics as Spark's file stream source, for the reference's
    raw matrix format.

    Offsets are the sorted list of ``[path, row_count]`` pairs already
    processed plus the running row base, so ``vec_id`` assignment stays
    globally consistent with the batch reader's sorted-filename
    convention (embedding.py:26) as long as files arrive in name order
    (the index-build pipeline writes cluster_embeddings_{i} in order).
    ``readBetweenOffsets`` replays a committed range deterministically
    from the RECORDED row counts — not current file sizes — so a file
    appended/replaced after commit cannot shift replayed ``vec_id``s;
    a size drift is detected and raised instead of silently re-basing.
    """

    def __init__(self, options: dict):
        if "path" not in options:
            raise ValueError("float32bin: .load(path) is required")
        if "dim" not in options:
            raise ValueError("float32bin: .option('dim', N) is required")
        self.path = options["path"]
        self.dim = int(options["dim"])

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

    def _rows(self, path: str, base: int) -> Iterator[tuple]:
        import numpy as np

        mat = np.fromfile(path, dtype="<f4").reshape(-1, self.dim)
        for pos in range(mat.shape[0]):
            yield (base + pos, path, pos, [float(x) for x in mat[pos]])

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # Rows materialize on the driver: the Simple stream reader API
        # prefetch-caches each batch (and copy.copy()s its iterator, so
        # a generator is not acceptable here) — the right tool for
        # modest per-batch volumes; a partition-parallel variant would
        # implement the full DataSourceStreamReader instead.
        seen = {p: int(n) for p, n in start.get("seen", [])}
        base = int(start.get("base", 0))
        row_bytes = FLOAT32_BYTES * self.dim
        new = [p for p in self._list() if p not in seen]
        rows: list[tuple] = []
        for p in new:
            size = os.path.getsize(p)
            if size % row_bytes != 0:
                raise ValueError(f"file size not divisible by {row_bytes}: {p}")
            rows.extend(self._rows(p, base))
            n_rows = size // row_bytes
            seen[p] = n_rows
            base += n_rows
        return iter(rows), {
            "seen": sorted([p, n] for p, n in seen.items()),
            "base": base,
        }

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        start_seen = {p for p, _ in start.get("seen", [])}
        base = int(start.get("base", 0))
        row_bytes = FLOAT32_BYTES * self.dim
        replay = sorted(
            (p, int(n)) for p, n in end.get("seen", []) if p not in start_seen
        )
        rows: list[tuple] = []
        for p, n_recorded in replay:
            size = os.path.getsize(p)
            if size != n_recorded * row_bytes:
                raise ValueError(
                    f"float32bin replay: {p} changed since commit "
                    f"({size} bytes on disk vs {n_recorded} recorded rows "
                    f"x {row_bytes} bytes) — refusing to re-base vec_ids"
                )
            rows.extend(self._rows(p, base))
            base += n_recorded
        return iter(rows)


class Float32BinDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "float32bin"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> Float32BinReader:
        return Float32BinReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> Float32BinStreamReader:
        return Float32BinStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(Float32BinDataSource)
