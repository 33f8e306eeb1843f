"""Perceptual audio fingerprinting (envelope dHash) — the audio
analog of ``multimodal/phash.py``, completing the multimodal dedup
story (image + audio over the same banded-Hamming machinery).

Fingerprint: split the signal's ABSOLUTE-AMPLITUDE ENVELOPE into
``AFP_WINDOWS`` integer window means and emit one bit per adjacent
window pair — ``bit(i) = w[i+1] > w[i]`` — packed into 64 bits. Like
image dHash, only the ORDER of adjacent energies matters, so the
fingerprint is invariant to uniform gain and robust to small sample
noise (window means), which is the near-duplicate tolerance audio
dedup wants (re-encodes, level-normalized copies, tiny edits).

Two decode paths, same hash algebra (mirroring ``media.DECODERS``):

- REAL — payloads that decode as PCM WAV (``multimodal/wav.py``)
  hash the per-frame channel-summed |amplitude| envelope. All-integer
  (sums and floor-divided means of integer samples), so the value is
  bit-exact across platforms. Pinned by transformed-copy recall
  tests on constructed WAVs.
- FAKE — undecodable payloads (the parquet fixture's UTF-8
  stand-ins) hash the text's code points as the envelope, through
  the identical window/compare/pack pipeline. Deterministic and
  DuckDB-expressible (``plans/audio.py``), so the registered plans
  stay value-hash oracle plans on the fixture.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_realtime2021_spark.multimodal.phash import _pack_bits

__all__ = [
    "AFP_WINDOWS",
    "py_afp_envelope_hash",
    "py_afp_real",
    "py_afp_fake",
    "audio_afp",
]

#: 65 windows -> 64 adjacent comparisons -> a 64-bit fingerprint.
AFP_WINDOWS = 65


def py_afp_envelope_hash(env) -> int | None:
    """Fingerprint of a 1-D integer envelope (list or int ndarray):
    AFP_WINDOWS integer window means (windows partition the sequence;
    short sequences re-sample — every window covers >= 1 element and
    windows may OVERLAP, hence prefix sums rather than reduceat),
    then the adjacent greater-than bits packed into a signed 64-bit
    value (same two's-complement packing as the image dHash). None
    for an empty envelope. numpy-vectorized (r08), bit-identical to
    the scalar spec (equivalence property test)."""
    n = len(env)
    if n == 0:
        return None
    e = np.asarray(env, dtype=np.int64)
    S = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(e, out=S[1:])
    i = np.arange(AFP_WINDOWS, dtype=np.int64)
    a = (i * n) // AFP_WINDOWS
    b = np.maximum(a + 1, ((i + 1) * n) // AFP_WINDOWS)
    w = (S[b] - S[a]) // (b - a)
    return _pack_bits(w[1:] > w[:-1])


def py_afp_real(payload: bytes) -> int | None:
    """Envelope hash over decoded PCM frames: per frame, the sum of
    channel |amplitudes| (8-bit: |b-128|; 16-bit: |v|) — integers
    end to end, via a vectorized ``np.frombuffer`` + reshape-sum
    pass. None when the payload isn't decodable PCM WAV."""
    import io
    import wave

    from gmall_realtime2021_spark.multimodal.wav import _MAX_SAMPLE_BYTES

    try:
        with wave.open(io.BytesIO(bytes(payload))) as wv:
            n_ch, sw, sr = wv.getnchannels(), wv.getsampwidth(), wv.getframerate()
            n_frames = wv.getnframes()
            if sr <= 0 or n_ch <= 0 or n_frames * n_ch * sw > _MAX_SAMPLE_BYTES:
                return None
            frames = wv.readframes(n_frames)
    except Exception:
        return None
    n_frames = len(frames) // (n_ch * sw)
    if n_frames == 0:
        return None
    if sw == 1:
        samp = np.frombuffer(frames, dtype=np.uint8, count=n_frames * n_ch)
        vals = np.abs(samp.astype(np.int32) - 128)
    elif sw == 2:
        samp = np.frombuffer(frames, dtype="<i2", count=n_frames * n_ch)
        vals = np.abs(samp.astype(np.int32))
    else:
        return None
    env = vals.reshape(n_frames, n_ch).sum(axis=1, dtype=np.int64)
    return py_afp_envelope_hash(env)


def py_afp_fake(text: str) -> int | None:
    """Deterministic fallback for payloads that aren't decodable
    audio: the UTF-8 text's code points ARE the envelope. Chosen to
    be expressible in DuckDB (``plans/audio._afp_fake_cte``) so the
    registered plans stay value-hash-checked on the fixture. None
    for empty text."""
    return py_afp_envelope_hash([ord(c) for c in text])


_AFP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("afp", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def audio_afp(media: DataFrame) -> DataFrame:
    """Per-audio fingerprints: ``(media_id, afp, decoder)``.

    Arrow-batched ``mapInPandas`` over audio payloads only (the kind
    filter is metadata-level, pushed to the scan). REAL PCM-WAV
    decode is attempted first; anything undecodable hashes through
    the deterministic fake path. NULL/empty payloads drop — mirrored
    by the SQL twin's length filter. One linear pass, no shuffle;
    downstream pairing touches only the 8-byte fingerprint column.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "afp": [], "decoder": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                h = py_afp_real(payload)
                dec = "real"
                if h is None:
                    h = py_afp_fake(bytes(payload).decode("utf-8", errors="replace"))
                    dec = "fake"
                if h is None:
                    continue
                out["media_id"].append(mid)
                out["afp"].append(h)
                out["decoder"].append(dec)
            yield pd.DataFrame(out).astype({"media_id": "int64", "afp": "int64"})

    return media.filter(F.col("kind") == "audio").mapInPandas(run, _AFP_SCHEMA)
