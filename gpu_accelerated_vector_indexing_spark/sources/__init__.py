from gpu_accelerated_vector_indexing_spark.sources.articles import file_lengths, lookup_texts, read_article_dir
from gpu_accelerated_vector_indexing_spark.sources.binary import read_float32_bin, read_npy, write_float32_bin
from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table, load_tables, register_views

__all__ = [
    "file_lengths",
    "load_table",
    "load_tables",
    "lookup_texts",
    "read_article_dir",
    "read_float32_bin",
    "read_npy",
    "register_views",
    "write_float32_bin",
]
