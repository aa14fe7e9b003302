"""Physical-plan inspection — plan quality as a testable contract.

The reference hand-codes its execution strategy (SURVEY.md §4); this
engine delegates to Catalyst, so the strategies it relies on must be
VERIFIED, not assumed. These helpers read the executed plan so tests
can pin the properties that make queries scale:

- ``PushedFilters`` non-empty → predicates reach the Parquet reader
- ``ReadSchema`` minimal → column pruning happened (a scan reading all
  columns for a 2-column projection is a bug)
- ``PartitionFilters`` present → partition pruning (the IVF probe path)
- ``BroadcastHashJoin`` → small sides broadcast, no shuffle of the big
  side
- ``TakeOrderedAndProject`` → top-k runs as bounded heaps, never a full
  sort (≙ reference IVF.cpp:185-191)
- ``WholeStageCodegen`` spans → expressions stay in generated JVM code

Used by tests/test_plans.py; also handy interactively:
``print(physical_plan(df))``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` list in the plan, flattened.

    Plan metadata strings are truncated at ``spark.sql.maxMetadataStringLength``
    (the closing bracket may be cut) — the match stops at ``]`` or at
    the truncation ellipsis, so long lists yield a partial-but-correct
    prefix.
    """
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\n]*?)(?:\]|\.\.\.)", physical_plan(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each ``ReadSchema: struct<...>`` scan (possibly a
    truncated prefix — see :func:`pushed_filters`)."""
    out: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^\n]*?)(?:>|\.\.\.)", physical_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider/fewer is better).

    Under AQE the codegen markers only appear in the FINAL plan — run an
    action on ``df`` first, then call this.
    """
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))


def assert_plan(
    df: DataFrame,
    contains: tuple[str, ...] = (),
    absent: tuple[str, ...] = (),
) -> str:
    """Assert physical-plan substrings; returns the plan for debugging."""
    plan = physical_plan(df)
    for frag in contains:
        assert frag in plan, f"expected {frag!r} in physical plan:\n{plan}"
    for frag in absent:
        assert frag not in plan, f"did not expect {frag!r} in physical plan:\n{plan}"
    return plan
