"""User-defined function surface: grouped-agg Pandas UDAF + Python UDTF.

The reference has no UDF/UDAF/UDTF surface (SURVEY.md §2.2) — its only
"UDF" is the embedding-model batch call (embedding.py:32), which this
engine covers with a scalar-iterator pandas_udf (functions/embedder.py).
This module completes the category with the two remaining shapes:

- a **grouped aggregate Pandas UDF** (Arrow-batched UDAF) — the escape
  hatch for aggregates Catalyst can't express natively;
- a **Python UDTF** (Spark 4 table function) — one input row → many
  output rows with a declared schema, used here for sentence splitting.

Scale posture: both are Arrow-transferred Python paths — correct for
genuinely-custom logic, but never used where a built-in expression
exists (SURVEY.md §4: UDFs are the slow path). The UDAF runs after a
map-side-combinable shuffle on the group key; the UDTF is embarrassingly
parallel per input partition and never shuffles.
"""

from __future__ import annotations

import math
import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import udtf

from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table

_SENT_RE = re.compile(r"[.!?]\s+")


@F.pandas_udf(T.DoubleType())
def _geomean(prices: pd.Series) -> float:
    """Geometric mean via mean-of-logs (numerically safe for big groups)."""
    import numpy as np

    return float(math.exp(np.log(prices.to_numpy(dtype="float64")).mean()))


def udaf_geomean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg Pandas UDAF: geometric-mean order price per priority.

    Rounded to 6 d.p. on both sides — the log-sum's accumulation order
    differs between engines (float-parity policy, SURVEY.md §7.3).
    Spark forbids mixing a group-agg pandas UDF with built-in aggregates
    in one ``agg`` (INVALID_PANDAS_UDF_PLACEMENT), so the UDAF stands
    alone here.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(_geomean("o_totalprice"), 6).alias("geomean_price"),
    )


@udtf(returnType="sent_idx int, sentence string")
class _SentenceSplit:
    """Split one document into sentences; index counts empty splits so
    the oracle's pre-filter ``range(len(parts))`` indices line up."""

    def eval(self, text: str):  # noqa: D102
        for i, s in enumerate(_SENT_RE.split(text or "")):
            if s:
                yield i, s


def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: explode each document into (doc_id, sent_idx, sentence).

    Registered as a SQL table function and applied LATERAL — the Spark-4
    idiom for one-to-many row generators with a fixed output schema.
    """
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    spark.udtf.register("sentence_split", _SentenceSplit)
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM documents_v d, LATERAL sentence_split(d.text) s
        """
    )
