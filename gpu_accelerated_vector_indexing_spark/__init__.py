"""gpu_accelerated_vector_indexing_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of the reference system
(PranavGrandhi/GPU_Accelerated_Vector_Indexing): IVF-pruned approximate
nearest-neighbor search over dense embeddings, plus the relational,
dedup, text-analysis, multimodal, and streaming surfaces a large-scale
training-data pipeline needs.

Architecture (SURVEY.md §1.3/§4): everything is declared through the
DataFrame/SQL API so Catalyst supplies predicate pushdown, partition
pruning, broadcast joins, partial aggregation and whole-stage codegen.
No RDDs; Pandas UDFs only where built-ins cannot express the semantics
(model inference, multimodal decode, winnowing fingerprints).
"""

from gpu_accelerated_vector_indexing_spark.memo import clear_session_caches
from gpu_accelerated_vector_indexing_spark.session import get_spark
from gpu_accelerated_vector_indexing_spark.sources.fixtures import load_table, load_tables, register_views

__all__ = ["clear_session_caches", "get_spark", "load_table", "load_tables", "register_views"]
