from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
