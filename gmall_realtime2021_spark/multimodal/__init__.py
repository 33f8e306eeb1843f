"""Multimodal columns — opaque binary payloads with typed metadata.

Part of the large-scale training-data pipeline surface (alongside
dedup / similarity / text analysis). See ``media.py``.
"""

from gmall_realtime2021_spark.multimodal.media import (
    MEDIA_META_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    frame_sample,
    resize_images,
    synthesize_media,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "MEDIA_SCHEMA",
    "decode_media",
    "extract_features",
    "frame_sample",
    "resize_images",
    "synthesize_media",
]
