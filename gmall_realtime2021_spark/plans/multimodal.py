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


@register(
    "multimodal_decode",
    oracle=None,  # byte-level decode of opaque payloads — not ANSI-SQL
    covers=(),
    doc="mapInPandas decode step over binary payloads (rows-only check)",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode summaries for every media row; the fake
    decoder runs here (no codec libs in the container) — schema,
    batch shape and partitioning identical to the real path.
    """
    media = synthesize_media(fan_out(load(spark, sf_dir, "documents")))
    return decode_media(media)


@register(
    "multimodal_frames",
    oracle=None,  # 1→N frame explode of binary payloads — not ANSI-SQL
    covers=(),
    doc="video frame sampling explode via mapInPandas (rows-only check)",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample every synthetic video at 1 frame/second; emits
    (media_id, frame_idx, frame_ms, byte_ct) — payload bytes dropped
    from the checked output to keep the driver compare light.
    """
    media = synthesize_media(fan_out(load(spark, sf_dir, "documents")))
    frames = frame_sample(media, every_ms=1000)
    return frames.select(
        "media_id",
        "frame_idx",
        "frame_ms",
        F.length("frame_payload").cast("long").alias("frame_byte_ct"),
    )
