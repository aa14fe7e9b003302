"""UDF-surface queries (UDAF + UDTF) with DuckDB oracles."""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators import udx as U

QUERIES = {
    "udaf_geomean_price": U.udaf_geomean_price,
    "udtf_sentences": U.udtf_sentences,
}

ORACLES = {
    # geometric mean = exp(mean(ln x)); rounded 6 d.p. both sides
    "udaf_geomean_price": """
SELECT o_orderpriority,
       round(exp(avg(ln(o_totalprice))), 6) AS geomean_price
FROM orders GROUP BY o_orderpriority
""",
    # same regex split, same pre-filter indices (empty parts counted);
    # lateral range() can't see outer columns in DuckDB, so the index
    # pairing is built with a list comprehension instead
    "udtf_sentences": r"""
SELECT doc_id, CAST(s['i'] - 1 AS INT) AS sent_idx, s['sentence'] AS sentence
FROM (
  SELECT doc_id,
         unnest([{'i': i, 'sentence': parts[i]}
                 for i in generate_series(1, len(parts))]) AS s
  FROM (SELECT doc_id, string_split_regex(text, '[.!?]\s+') AS parts
        FROM documents)
)
WHERE s['sentence'] <> ''
""",
}
