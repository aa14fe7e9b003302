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


QUERIES["multimodal_decode"] = M.multimodal_decode

# the encoders are canonical single-fmt/single-data containers, so every
# decoded header field is pure arithmetic over the payload length — the
# oracle recomputes all of them from the same bytes with no codec, and
# roundtrip_ok must come back uniformly true from the Spark side
ORACLES["multimodal_decode"] = f"""
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
  WHERE octet_length(encode(text)) > 0
)
SELECT doc_id,
       {M.WAV_SAMPLE_RATE} AS sample_rate,
       1 AS n_channels,
       8 AS bits_per_sample,
       nb::BIGINT AS n_samples,
       (nb * 1000 // {M.WAV_SAMPLE_RATE})::BIGINT AS duration_ms,
       {M.BMP_WIDTH} AS bmp_width,
       greatest(1, (nb + {M.BMP_WIDTH} - 1) // {M.BMP_WIDTH})::INT AS bmp_height,
       (14 + 40 + 1024
        + greatest(1, (nb + {M.BMP_WIDTH} - 1) // {M.BMP_WIDTH})
          * {M.BMP_WIDTH})::BIGINT AS bmp_file_size,
       true AS roundtrip_ok
FROM d
"""


QUERIES["multimodal_audio_energy"] = M.multimodal_audio_energy

# the ASCII corpus makes decoded 8-bit PCM samples == ascii(char) — the
# oracle recomputes the windowed energies from the same characters
ORACLES["multimodal_audio_energy"] = f"""
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents
  WHERE octet_length(encode(text)) > 0
),
s AS (
  SELECT doc_id,
         (i - 1) // {M.AUDIO_WINDOW} AS w,
         abs(ascii(substr(text, i, 1)) - 128) AS e
  FROM d CROSS JOIN LATERAL unnest(range(1, nb + 1)) t(i)
),
we AS (SELECT doc_id, w, CAST(sum(e) AS BIGINT) AS we FROM s GROUP BY doc_id, w),
peak AS (
  SELECT doc_id, we AS peak_energy, w AS peak_window,
         row_number() OVER (PARTITION BY doc_id ORDER BY we DESC, w ASC) AS rk
  FROM we
)
SELECT d2.doc_id,
       ((d2.nb + {M.AUDIO_WINDOW} - 1) // {M.AUDIO_WINDOW})::INT AS n_windows,
       tot.total_energy,
       p.peak_energy,
       p.peak_window::INT AS peak_window
FROM d d2
JOIN (SELECT doc_id, CAST(sum(we) AS BIGINT) AS total_energy FROM we GROUP BY doc_id) tot
  ON tot.doc_id = d2.doc_id
JOIN peak p ON p.doc_id = d2.doc_id AND p.rk = 1
"""


from gpu_accelerated_vector_indexing_spark.operators.multimodal import corpus_integrity  # noqa: E402

QUERIES["corpus_integrity"] = corpus_integrity

ORACLES["corpus_integrity"] = """
WITH d AS (SELECT doc_id AS id, 1 AS has_doc FROM documents),
e AS (SELECT vec_id AS id, 1 AS has_vec, len(embedding) AS dim FROM embeddings),
j AS (SELECT coalesce(d.id, e.id) AS id, has_doc, has_vec, dim
      FROM d FULL OUTER JOIN e ON d.id = e.id)
SELECT count(*)::BIGINT AS n_ids,
       sum(CASE WHEN has_vec IS NULL THEN 1 ELSE 0 END)::BIGINT AS docs_without_vec,
       sum(CASE WHEN has_doc IS NULL THEN 1 ELSE 0 END)::BIGINT AS vecs_without_doc,
       min(id) AS min_id,
       max(id) AS max_id,
       max(id) - min(id) + 1 - count(*)::BIGINT AS id_gaps,
       count(DISTINCT dim)::BIGINT AS n_distinct_dims
FROM j
"""
