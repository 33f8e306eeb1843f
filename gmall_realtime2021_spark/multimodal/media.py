"""Multimodal column plumbing: image/audio/video as ``binary`` + meta.

Design (100 TB posture):

- A media row is ``(media_id, kind, payload binary, meta struct)`` —
  the payload is opaque to Catalyst (no JVM decode), metadata is a
  typed struct so filters/partition pruning work on it ("all 16 kHz
  audio", "all frames wider than 512") *without touching bytes*.
- Every byte-touching operator is ``mapInPandas`` over Arrow record
  batches: payloads stream executor→Python in columnar batches, the
  UDF yields typed rows, and the operator composes with ordinary
  DataFrame ops before/after. Batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
  large payloads never materializes at once.
- Codec libraries (PIL/librosa/ffmpeg) are NOT in this container,
  but every kind's real path still EXECUTES here through pure-stdlib
  decoders: images via Pillow when present, else baseline PNG
  (``multimodal/png.py``) and baseline JPEG (``multimodal/jpeg.py``);
  audio via the PCM-WAV reader (``multimodal/wav.py``); video via the
  MJPEG-AVI demux (``multimodal/avi.py``, r11) whose frames are
  complete JPEGs the image decoder then decodes for real.
  Undecodable payloads fall back to the deterministic fake decoder —
  same signature, same schema, stable values — so the Spark-side
  plumbing (schemas, batch shapes, partitioning, explode semantics)
  stays fully testable and a production codec swap is a one-function
  change.

The fake decode is explicitly labeled: it derives "pixels"/"samples"
statistics from payload bytes (rolling means over the byte stream),
deterministic for oracle-style assertions.
"""

from __future__ import annotations

from collections.abc import Iterator
from struct import error as struct_error

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "MEDIA_SCHEMA",
    "synthesize_media",
    "decode_media",
    "resize_images",
    "frame_sample",
    "extract_features",
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)


try:  # resolve Pillow ONCE at import — a failed per-row import would re-walk
    # sys.path for every payload inside the mapInPandas hot loop
    from PIL import Image as _PIL_Image  # pragma: no cover - not in this container
except ImportError:
    _PIL_Image = None


def _decode_image_real(payload: bytes):
    """Real image decode → ``(width, height, channels, pixels)`` or
    None (fall back to the deterministic fake). Paths tried in order:
    Pillow if the library is present (any format it reads); else the
    pure-Python decoders dispatched on magic bytes — baseline PNG
    (``multimodal/png.py``) and baseline JFIF JPEG
    (``multimodal/jpeg.py``) — both of which EXECUTE in this
    container, so the real path covers the two dominant web-corpus
    image formats here, not just behind a gated import. ANY decode
    failure (corrupt IDAT → zlib.error, truncated header →
    struct.error, bad Huffman scan → ValueError, …) means "not
    decodable for real", never a task failure."""
    if _PIL_Image is not None:  # pragma: no cover - lib not installed here
        try:
            import io

            img = _PIL_Image.open(io.BytesIO(payload))
            img.load()
            mode_channels = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}
            ch = mode_channels.get(img.mode)
            if ch is None:
                img = img.convert("RGB")
                ch = 3
            return img.width, img.height, ch, img.tobytes()
        except Exception:
            return None
    try:
        from gmall_realtime2021_spark.multimodal.jpeg import JPEG_MAGIC, decode_jpeg
        from gmall_realtime2021_spark.multimodal.png import decode_png

        if payload[:2] == JPEG_MAGIC:
            return decode_jpeg(bytes(payload))
        return decode_png(payload)
    except Exception:  # zlib.error / struct.error / ValueError on corrupt bytes
        return None


def _image_fragment(payload: bytes):
    decoded = _decode_image_real(payload)
    if decoded is None:
        return None
    w, h, _ch, pixels = decoded
    return {
        "width": w,
        "height": h,
        "mean_byte": float(sum(pixels)) / len(pixels) if pixels else 0.0,
    }


def _audio_fragment(payload: bytes):
    """Real audio decode via the stdlib WAV reader
    (``multimodal/wav.py``): true sample rate and duration from the
    RIFF header, mean absolute amplitude (full-scale-normalized) from
    the PCM frames. None on anything that isn't decodable PCM WAV."""
    try:
        from gmall_realtime2021_spark.multimodal.wav import decode_wav

        sr, _ch, _n_frames, duration_ms, mean_amp = decode_wav(payload)
    except ValueError:
        return None
    return {"sample_rate": sr, "duration_ms": duration_ms, "mean_byte": mean_amp}


def _parse_video_real(payload: bytes):
    """Real video demux → ``AviVideo`` or None: dispatch on the RIFF
    magic (like the image path dispatches on PNG/JPEG magic), then a
    full MJPEG-AVI container parse (``multimodal/avi.py``). ANY
    malformation — truncated chunk, non-MJPEG stream, zero frames —
    means "not decodable for real", never a task failure."""
    try:
        from gmall_realtime2021_spark.multimodal.avi import is_avi, parse_avi

        if not is_avi(payload):
            return None
        return parse_avi(payload)
    except (ValueError, struct_error):
        return None


def _video_fragment(payload: bytes):
    """Real video decode fragment: geometry and duration from the AVI
    headers, ``mean_byte`` = mean pixel value of the FIRST decoded
    frame (each MJPEG frame is a complete baseline JPEG —
    ``multimodal/jpeg.py`` decodes it for real). The first frame must
    decode AND agree with the container geometry, else the whole
    payload falls back to fake — a container lying about its stream
    is not 'decodable for real'."""
    vid = _parse_video_real(payload)
    if vid is None:
        return None
    try:
        from gmall_realtime2021_spark.multimodal.jpeg import decode_jpeg

        w, h, _ch, pixels = decode_jpeg(vid.frames[0])
    except Exception:
        return None
    if (w, h) != (vid.width, vid.height) or not pixels:
        return None
    return {
        "width": vid.width,
        "height": vid.height,
        "duration_ms": vid.duration_ms,
        "mean_byte": float(sum(pixels)) / len(pixels),
    }


#: kind → real decoder; returns a column fragment (merged over the
#: all-NULL defaults) or None when the payload can't be decoded for
#: real (then the deterministic fake path runs instead). All three
#: kinds now have genuinely executable stdlib paths in this
#: container: PNG/JPEG images, PCM-WAV audio, MJPEG-AVI video
#: (r11 — the former labeled stub).
DECODERS = {"image": _image_fragment, "audio": _audio_fragment, "video": _video_fragment}


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake corpus: documents → media rows.

    payload = UTF-8 bytes of the text (opaque stand-in), kind cycles
    image/audio/video by doc_id, meta derived arithmetically — all
    JVM-side, no Python. This is the fixture generator for the
    plumbing tests and the ``queries()`` entry.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    ln = F.length("text")
    meta = F.struct(
        (ln % 640 + 16).cast("int").alias("width"),
        (ln % 480 + 16).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        (ln * 10).cast("long").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_ct", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode step: payload → per-item decoded summary.

    Real paths: ``DECODERS[kind]`` attempts an actual decode — images
    via Pillow or the stdlib baseline-PNG decoder (true dimensions,
    mean pixel value), audio via the stdlib PCM-WAV reader (true
    sample rate, duration, mean absolute amplitude) — and emits
    decoder='real' with the kind's fragment filled in, the other
    kinds' columns NULL. Fake path (video, undecodable payloads):
    byte count + mean payload byte, all decode columns NULL
    (decoder='fake') — deterministic, cheap, same schema.
    ``mapInPandas`` keeps payloads off the driver and streams Arrow
    batches through Python workers either way.
    """
    frag_cols = ("width", "height", "sample_rate", "duration_ms")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "kind", "byte_ct", "mean_byte", "decoder", *frag_cols
            )}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    # NULL-text docs synthesize a NULL payload; the
                    # batch oracles pin byte_ct=0 fake rows for them
                    payload = b""
                real = DECODERS.get(kind)
                frag = real(payload) if real is not None else None
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["byte_ct"].append(len(payload))
                if frag is not None:
                    out["mean_byte"].append(frag["mean_byte"])
                    out["decoder"].append("real")
                    for c in frag_cols:
                        out[c].append(frag.get(c))
                else:
                    out["mean_byte"].append(
                        float(sum(payload)) / len(payload) if len(payload) else 0.0
                    )
                    out["decoder"].append("fake")
                    for c in frag_cols:
                        out[c].append(None)
            yield pd.DataFrame(out).astype(
                {
                    "byte_ct": "int64",
                    "width": "Int32",
                    "height": "Int32",
                    "sample_rate": "Int32",
                    "duration_ms": "Int64",
                }
            )

    return media.mapInPandas(run, _DECODED_SCHEMA)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize step (images only — filter is metadata-level, pushed to
    the scan). Fake path: payload truncated/padded to width*height
    bytes — preserves the real operator's contract (output payload
    is a function of target dims) without a codec.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: bytes(b[:target]) + b"\x00" * max(0, target - len(b))
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, _RESIZED_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def frame_sample(media: DataFrame, every_ms: int = 1000, frame_bytes: int = 64) -> DataFrame:
    """Frame sampling (video): one row per sampled frame — the
    1→N explode shape of a real ffmpeg sampler.

    REAL path (r11): payloads carrying the RIFF magic demux through
    the MJPEG-AVI parser (``multimodal/avi.py``) — sample instant
    ``i·every_ms`` maps to the stream frame covering it
    (``t·1000 // µs_per_frame``, clamped to the last frame), and
    ``frame_payload`` is that frame's COMPLETE JPEG stream
    (``frame_bytes`` does not apply — a real sampler emits whole
    frames; downstream hashing/decoding consumes them as opaque
    bytes, and ``multimodal/jpeg.py`` can decode each for real).
    Duration comes from the container (frames × µs/frame), not the
    meta column — the container is the ground truth.

    FAKE path (non-RIFF / unparseable payloads, e.g. the synthesized
    fixture): frame i is the ``frame_bytes``-byte slice at its
    proportional payload offset, duration from meta — bit-identical
    to the pre-r11 behavior, which the value-hash oracles pin.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame_payload": []}
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""  # NULL payload → empty frames
                vid = _parse_video_real(bytes(payload))
                if vid is not None:
                    n = max(1, vid.duration_ms // every_ms)
                    for i in range(n):
                        t_ms = i * every_ms
                        src = min(vid.n_frames - 1, t_ms * 1000 // vid.usec_per_frame)
                        out["media_id"].append(row["media_id"])
                        out["frame_idx"].append(i)
                        out["frame_ms"].append(t_ms)
                        out["frame_payload"].append(vid.frames[src])
                    continue
                dur = int(row["meta"]["duration_ms"] or 0)
                n = max(1, dur // every_ms)
                for i in range(n):
                    off = (i * len(payload)) // n
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["frame_payload"].append(bytes(payload[off : off + frame_bytes]))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(run, _FRAMES_SCHEMA)


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """Feature extraction: payload → ``array<float>`` embedding with
    the same column shape as the ``embeddings`` fixture, so outputs
    feed straight into ``operators.similarity`` (cosine/LSH top-k).
    Fake path: L2-normalized byte-bucket histogram — deterministic
    and locality-preserving enough to test ANN plumbing end-to-end.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def embed(b: bytes) -> list[float]:
            v = [0.0] * dim
            for i, byte in enumerate(b):
                v[(byte + i) % dim] += 1.0
            norm = math.sqrt(sum(x * x for x in v)) or 1.0
            return [x / norm for x in v]

        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "embedding": pdf["payload"].map(embed)}
            )

    return media.mapInPandas(run, _FEATURES_SCHEMA)
