"""Multimodal plans — binary-column pipeline entries (SURVEY.md §7 M5).

Fixture: :func:`multimodal.synthesize_media` derives a deterministic
media table from ``documents`` (payload = UTF-8 bytes of text, meta
arithmetic over lengths), so these plans stay reproducible against
DuckDB where SQL can express the semantics.

- ``multimodal_meta``   — metadata-only aggregation (oracle-checked):
  proves meta filters/aggregates never touch payload bytes.
- ``multimodal_decode`` — mapInPandas decode summaries (rows-only
  check: byte statistics of opaque payloads are not ANSI-SQL).
- ``multimodal_frames`` — video frame-sample explode (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.multimodal import (
    decode_media,
    frame_sample,
    synthesize_media,
)
from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import fan_out, load


@register(
    "multimodal_meta",
    oracle="""
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           count(*) AS media_ct,
           CAST(sum(len(text) % 640 + 16) AS BIGINT) AS width_sum,
           CAST(sum(len(text) * 10) AS BIGINT) AS duration_ms_sum
    FROM documents
    WHERE len(text) % 640 + 16 > 100
    GROUP BY 1
    """,
    covers=(),
    doc="typed-metadata aggregation over opaque media payloads",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-level query on the media table: filter + aggregate on
    the typed ``meta`` struct. The payload column is never read —
    at scale this is the projection/pruning path that lets a 100 TB
    media lake answer inventory queries from parquet footers and
    metadata columns alone.
    """
    media = synthesize_media(load(spark, sf_dir, "documents"))
    return (
        media.filter(F.col("meta.width") > 100)
        .groupBy("kind")
        .agg(
            F.count("*").alias("media_ct"),
            F.sum(F.col("meta.width").cast("long")).alias("width_sum"),
            F.sum("meta.duration_ms").alias("duration_ms_sum"),
        )
    )


#: UTF-8 byte count / byte-value sum of one character, from its code
#: point (DuckDB ``ascii``) — the arithmetic that makes the decode
#: plan's fake-path byte statistics oracle-expressible: the payload
#: is ``encode(text)``, and a code point's UTF-8 bytes are a pure
#: function of its value (RFC 3629 layout).
_UTF8_NB = (
    "CASE WHEN ascii(c) < 128 THEN 1 WHEN ascii(c) < 2048 THEN 2 "
    "WHEN ascii(c) < 65536 THEN 3 ELSE 4 END"
)
_UTF8_SB = (
    "CASE WHEN ascii(c) < 128 THEN ascii(c) "
    "WHEN ascii(c) < 2048 THEN 192 + (ascii(c) // 64) + 128 + (ascii(c) % 64) "
    "WHEN ascii(c) < 65536 THEN 224 + (ascii(c) // 4096) + 128 + ((ascii(c) // 64) % 64) + 128 + (ascii(c) % 64) "
    "ELSE 240 + (ascii(c) // 262144) + 128 + ((ascii(c) // 4096) % 64) + 128 + ((ascii(c) // 64) % 64) + 128 + (ascii(c) % 64) END"
)


@register(
    "multimodal_decode",
    # r07: no longer rows-only — the fixture's payloads are
    # encode(text), so the fake-path byte statistics are UTF-8
    # arithmetic over code points (exact IEEE division of identical
    # integers on both sides); decode columns are typed NULLs because
    # no fixture payload decodes as PNG/WAV.
    oracle=f"""
    WITH stats AS (
        SELECT doc_id,
               CAST(coalesce(list_aggregate(list_transform(
                   regexp_extract_all(text, '(?s).'), c -> CAST({_UTF8_NB} AS BIGINT)), 'sum'), 0) AS BIGINT) AS byte_ct,
               CAST(coalesce(list_aggregate(list_transform(
                   regexp_extract_all(text, '(?s).'), c -> CAST({_UTF8_SB} AS BIGINT)), 'sum'), 0) AS BIGINT) AS byte_sum
        FROM documents
    )
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           byte_ct,
           CASE WHEN byte_ct = 0 THEN 0.0 ELSE CAST(byte_sum AS DOUBLE) / byte_ct END AS mean_byte,
           'fake' AS decoder,
           CAST(NULL AS INTEGER) AS width,
           CAST(NULL AS INTEGER) AS height,
           CAST(NULL AS INTEGER) AS sample_rate,
           CAST(NULL AS BIGINT) AS duration_ms
    FROM stats
    """,
    covers=(),
    doc="mapInPandas decode step over binary payloads",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode summaries for every media row; on the
    fixture every payload takes the deterministic fake path (UTF-8
    stand-ins decode as neither PNG nor WAV), whose byte statistics
    the DuckDB twin reproduces from code-point arithmetic — so this
    plan is value-hash-checked since r07, while the REAL decode paths
    stay pinned on constructed PNG/WAV payloads in
    tests/test_multimodal.py. Schema, batch shape and partitioning
    identical either way.
    """
    media = synthesize_media(fan_out(load(spark, sf_dir, "documents")))
    return decode_media(media)


@register(
    "multimodal_frames",
    # r07: no longer rows-only — the fake sampler's frame geometry
    # (1 frame/s over duration_ms = 10·chars, 64-byte slices at
    # proportional BYTE offsets) is integer arithmetic over the
    # char/byte lengths, both SQL-derivable from the text.
    oracle=f"""
    WITH vid AS (
        SELECT doc_id AS media_id,
               greatest(1, (length(text) * 10) // 1000) AS n,
               CAST(coalesce(list_aggregate(list_transform(
                   regexp_extract_all(text, '(?s).'), c -> CAST({_UTF8_NB} AS BIGINT)), 'sum'), 0) AS BIGINT) AS nb
        FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(i * 1000 AS BIGINT) AS frame_ms,
           CAST(least(64, nb - (i * nb) // n) AS BIGINT) AS frame_byte_ct
    FROM vid, unnest(generate_series(0, n - 1)) AS u(i)
    """,
    covers=(),
    doc="video frame sampling explode via mapInPandas",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample every synthetic video at 1 frame/second; emits
    (media_id, frame_idx, frame_ms, byte_ct) — payload bytes dropped
    from the checked output to keep the driver compare light. The
    fake sampler's slice geometry is pure integer arithmetic, so the
    DuckDB twin reproduces it exactly (value-hash-checked since r07).
    """
    media = synthesize_media(fan_out(load(spark, sf_dir, "documents")))
    frames = frame_sample(media, every_ms=1000)
    return frames.select(
        "media_id",
        "frame_idx",
        "frame_ms",
        F.length("frame_payload").cast("long").alias("frame_byte_ct"),
    )
