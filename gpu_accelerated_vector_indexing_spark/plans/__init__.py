from gpu_accelerated_vector_indexing_spark.plans.inspect import (
    assert_plan,
    codegen_span_count,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "assert_plan",
    "codegen_span_count",
    "physical_plan",
    "pushed_filters",
    "read_schema_columns",
]
