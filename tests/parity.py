"""Engine-vs-DuckDB-oracle comparison, mimicking the driver's check
(row-count + schema + order-insensitive value equality).

Generalizes the reference's GPU-vs-CPU consistency check
(check_cos_sim.cpp:18-79) to every operator (SURVEY.md §5.2).
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _register_views(con, sf_dir: str) -> None:
    from gpu_accelerated_vector_indexing_spark.sources.fixtures import TABLES

    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact match expected (both engines compute deterministic doubles);
        # repr at 12 significant digits guards only against float64 printing noise
        return f"{v:.12g}"
    if isinstance(v, (pd.Timestamp, datetime, date)):
        return pd.Timestamp(v).tz_localize(None) if pd.Timestamp(v).tzinfo else pd.Timestamp(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "?") -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows, d_rows = _canon(spark_pdf), _canon(duck_pdf)
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def assert_parity(spark, duck, name: str, sf_dir: str) -> None:
    """Run queries()[name] and oracle_sql()[name], compare like the driver."""
    from gpu_accelerated_vector_indexing_spark.queries import merged

    queries, oracles = merged()
    spark_pdf = queries[name](spark, sf_dir).toPandas()
    _register_views(duck, sf_dir)
    duck_pdf = duck.execute(oracles[name]).df()
    compare_frames(spark_pdf, duck_pdf, name)
