"""Video near-dup fingerprinting — completes the multimodal dedup
story (image dHash + audio envelope hash + THIS): a 64-bit per-video
fingerprint composed from sampled-frame hashes, paired through the
same pigeonhole byte-band Hamming join as the image/audio families.
Reference analog: the media payload rows the DWD layer routes
(``BaseLogApp.java:235-247`` display records).

Composition (each stage already exists and is pinned separately):

1. ``media.frame_sample`` — 1 frame/s sampler (the ffmpeg-shaped
   1→N explode; REAL MJPEG-AVI demux for RIFF payloads since r11,
   deterministic byte-slice fake for everything else — the fixture's
   text payloads take the fake path, keeping the oracles exact).
2. Per-frame hash — the frame's BYTES are a 1-D envelope through
   ``afp.py_afp_envelope_hash`` (window means → adjacent-compare →
   64-bit pack). Same kernel as audio, so one pinned hash algebra
   covers both families.
3. Per-video fold — MAJORITY BIT over the frame hashes: bit k of the
   video fingerprint is set iff a strict majority of frames set bit
   k. Invariant to any single frame's corruption for 3+ frame videos
   and robust to per-frame noise, which is the near-duplicate
   tolerance video dedup wants (re-muxed copies, small overlays,
   single-frame edits).

Everything is integer arithmetic over byte values, so the fold is
DuckDB-expressible end to end (``plans/video.py``) and both registered
plans are value-hash oracle plans on the fixture.

Scale: frames never leave their scan partition (one linear Arrow pass
payload→frame→hash), the majority fold is a single JVM-side groupBy
with 64 conditional sums (no UDF, no explode — bit counts come from
``fh & mask`` predicates), and downstream pairing touches only the
8-byte fingerprint column at distinct-fingerprint grain.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_realtime2021_spark.multimodal.afp import py_afp_envelope_hash
from gmall_realtime2021_spark.multimodal.media import frame_sample

__all__ = [
    "VIDEO_FRAME_BYTES",
    "VIDEO_FRAME_MS",
    "video_frame_hashes",
    "video_fingerprints",
]

#: Sampler geometry shared with ``multimodal_frames`` (1 frame/s,
#: 64-byte fake-path slices) so the frames oracle's proven geometry
#: carries over verbatim.
VIDEO_FRAME_MS = 1000
VIDEO_FRAME_BYTES = 64

_FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("fh", T.LongType()),
    ]
)

#: Bit-k masks as SIGNED 64-bit literals (bit 63 is the sign bit) —
#: ``fh & mask != 0`` extracts bit k identically in Spark LongType
#: and DuckDB BIGINT, negative fingerprints included.
_BIT_MASKS = [(1 << k) if k < 63 else -(1 << 63) for k in range(64)]


def video_frame_hashes(media: DataFrame) -> DataFrame:
    """Per-sampled-frame 64-bit envelope hashes:
    ``(media_id, frame_idx, fh)``.

    REAL frames (r11): a frame payload that is a decodable baseline
    JPEG — what the MJPEG-AVI demux emits — is DECODED first and the
    envelope hash runs over the reconstructed PIXEL bytes: two
    encodings of the same content (different quality/subsampling →
    entirely different compressed bytes) land at nearby fingerprints,
    which is the property video near-dup needs and compressed-byte
    hashing cannot give (pinned in
    ``tests/test_multimodal.py::test_video_fingerprint_real_avi_near_copy_recall``).

    FAKE frames (the fixture's byte slices): the raw bytes are the
    envelope (no text decode — byte slices of UTF-8 payloads cut
    mid-codepoint, so hashing BYTES keeps the fake path deterministic
    AND oracle-expressible); a slice that happens to start with the
    JPEG magic fails the decode attempt and falls through to the same
    raw-byte hash. Empty frames (empty/NULL payloads) drop, like docs
    shorter than a shingle in the text family."""
    from gmall_realtime2021_spark.multimodal.jpeg import JPEG_MAGIC, decode_jpeg

    frames = frame_sample(media, every_ms=VIDEO_FRAME_MS, frame_bytes=VIDEO_FRAME_BYTES)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "fh": []}
            for mid, idx, payload in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame_payload"]
            ):
                if payload is None or len(payload) == 0:
                    continue
                env_src = None
                if bytes(payload[:2]) == JPEG_MAGIC:
                    try:
                        _w, _h, _c, pixels = decode_jpeg(bytes(payload))
                        env_src = np.frombuffer(pixels, dtype=np.uint8)
                    except Exception:
                        env_src = None  # not a real frame after all
                if env_src is None:
                    env_src = np.frombuffer(payload, dtype=np.uint8)
                h = py_afp_envelope_hash(env_src)
                if h is None:
                    continue
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["fh"].append(h)
            yield pd.DataFrame(out).astype(
                {"media_id": "int64", "frame_idx": "int32", "fh": "int64"}
            )

    return frames.mapInPandas(run, _FRAME_HASH_SCHEMA)


def video_fingerprints(media: DataFrame) -> DataFrame:
    """Majority-bit video fingerprints: ``(media_id, vhash,
    n_frames)``. One shuffle at media grain; the 64 bit-counts are
    conditional sums over ``fh & mask`` predicates and the pack is a
    sum of signed weights (bit 63 folds in as the two's-complement
    minimum, the same trick as ``plans/images._dhash_pack_sql``) — all
    whole-stage-codegen expressions, no Python on the agg path."""
    fh = video_frame_hashes(media)
    bit_counts = [
        F.sum(
            F.when(F.col("fh").bitwiseAND(F.lit(m)) != 0, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"c{k}")
        for k, m in enumerate(_BIT_MASKS)
    ]
    agg = fh.groupBy("media_id").agg(F.count("*").alias("n_frames"), *bit_counts)
    packed = reduce(
        lambda a, b: a + b,
        [
            F.when(2 * F.col(f"c{k}") > F.col("n_frames"), F.lit(m).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for k, m in enumerate(_BIT_MASKS)
        ],
    )
    return agg.select("media_id", packed.alias("vhash"), "n_frames")
