"""Multimodal query family (EXT, SURVEY.md §2.3).

The mapInPandas feature/frames operators have FULL value oracles: the
fixture payload is the documents' UTF-8 bytes (ASCII corpus), so DuckDB
replicates byte math via encode()/octet_length — proving the Arrow
plumbing end-to-end, not just row counts.
"""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators import multimodal as M

QUERIES = {
    "multimodal_features": M.multimodal_features,
    "multimodal_frames": M.frame_sample,
    "multimodal_meta": M.multimodal_meta,
}

ORACLES = {
    "multimodal_features": """
WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents)
SELECT doc_id, nb AS byte_len, nb // 1000 + 1 AS n_frames,
       ascii(substr(text, 1, 1)) AS first_byte,
       ascii(substr(text, length(text), 1)) AS last_byte
FROM d
""",
    "multimodal_frames": """
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents)
SELECT doc_id, i::INT AS frame_idx, (nb // 4)::BIGINT AS frame_bytes
FROM d CROSS JOIN range(0, 4) t(i)
WHERE nb >= 4
""",
    "multimodal_meta": """
SELECT 'text/plain' AS mime, lang, count(*) AS n_docs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents GROUP BY lang
""",
}
