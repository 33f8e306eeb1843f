"""Pure-stdlib WAV (RIFF PCM) decode — the REAL audio path.

Same rationale as the PNG module (``multimodal/png.py``): the
container ships no codec libraries, but WAV's PCM profile is fully
decodable with the standard library's ``wave`` reader. A real WAV
streamed through the ``mapInPandas`` decode pipeline yields its true
sample rate, duration, and amplitude statistics, in this container,
today. Non-PCM or corrupt payloads raise ValueError and the caller
falls back to the deterministic fake — the same contract as a
missing codec library.

Supported: 8-bit unsigned and 16-bit signed little-endian PCM, any
channel count (the ``wave`` module's own envelope).
"""

from __future__ import annotations

import io
import struct
import wave

__all__ = ["WAV_MAGIC", "decode_wav"]

WAV_MAGIC = b"RIFF"

#: Hard ceiling on decoded sample bytes (~64 MiB ≈ 11 min of 48 kHz
#: stereo 16-bit) — headers claiming more fail fast, mirroring the
#: PNG module's geometry budget.
_MAX_SAMPLE_BYTES = 1 << 26


def decode_wav(data: bytes) -> tuple[int, int, int, int, float]:
    """Decode a PCM WAV → ``(sample_rate, n_channels, n_frames,
    duration_ms, mean_abs_amplitude)`` with amplitude normalized to
    [0, 1] (|sample| / full scale) so 8- and 16-bit payloads are
    comparable. Raises ValueError on non-WAV bytes or unsupported
    profiles.
    """
    try:
        with wave.open(io.BytesIO(bytes(data))) as w:
            n_ch = w.getnchannels()
            sw = w.getsampwidth()
            sr = w.getframerate()
            n_frames = w.getnframes()
            if sr <= 0 or n_ch <= 0:
                raise ValueError("bad WAV header")
            if n_frames * n_ch * sw > _MAX_SAMPLE_BYTES:
                raise ValueError("WAV exceeds decode budget")
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError, struct.error) as exc:
        raise ValueError(f"not a decodable WAV: {exc}") from exc
    n_frames = len(frames) // (n_ch * sw)  # trust data present, not the header
    duration_ms = round(n_frames * 1000 / sr)
    n_samples = n_frames * n_ch
    if n_samples == 0:
        return sr, n_ch, 0, 0, 0.0
    if sw == 1:  # unsigned 8-bit, silence at 128
        total = sum(abs(b - 128) for b in frames[: n_samples])
        mean = total / n_samples / 128.0
    elif sw == 2:  # signed 16-bit little-endian
        vals = struct.unpack(f"<{n_samples}h", frames[: n_samples * 2])
        mean = sum(abs(v) for v in vals) / n_samples / 32768.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    return sr, n_ch, n_frames, duration_ms, mean
