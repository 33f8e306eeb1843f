"""Pure-stdlib PNG decode (zlib + struct) — the REAL image path.

The container ships no codec libraries, but PNG's baseline profile is
decodable with nothing beyond the standard library: chunk framing,
IHDR geometry, zlib-inflated IDAT, and the five scanline filters from
the public specification (RFC 2083 / W3C PNG). Implementing it here
turns the multimodal decode step from "plumbing-real, kernel-stubbed"
into a genuinely executable real path: a real PNG streamed through
the same ``mapInPandas`` pipeline yields its true dimensions and
pixel statistics, in this container, today.

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace. Anything else raises ValueError and the
caller falls back to the deterministic fake — same contract as a
missing codec library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["PNG_MAGIC", "decode_png"]

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: Hard ceiling on inflated scanline bytes (256 MiB ≈ an 8k×8k RGBA
#: frame) — a crafted IHDR claiming absurd geometry fails fast
#: instead of sizing the decompression bound itself.
_MAX_PIXEL_BYTES = 1 << 28


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline PNG → ``(width, height, channels, pixels)``
    with ``pixels`` as row-major unfiltered bytes (len = w·h·channels).
    Raises ValueError on non-PNG bytes or unsupported profiles.
    """
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    width = height = channels = None
    idat: list[bytes] = []
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # payload + CRC (integrity is the transport's job here)
        if typ == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or interlace != 0 or color not in _CHANNELS:
                raise ValueError("unsupported PNG profile")
            channels = _CHANNELS[color]
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    stride = width * channels
    expected = height * (stride + 1)
    # Bounded inflate: IDAT is untrusted worker input, and a tiny
    # zlib bomb would otherwise allocate unbounded memory before the
    # scanline-length check. Geometry is known from IHDR, so cap the
    # claimed size first, then decompress at most expected+1 bytes —
    # any overrun (or leftover compressed input) is a hard error
    # without the allocation ever happening.
    if expected > _MAX_PIXEL_BYTES:
        raise ValueError("PNG geometry exceeds decode budget")
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected + 1)
    if len(raw) != expected or d.decompress(b"", 1) or not d.eof or d.unused_data:
        raise ValueError("bad scanline payload")
    # Unfilter (r08: row-vectorized where the spec recurrence allows).
    # None (0) is a copy; Up (2) is element-wise mod-256 addition over
    # the previous ROW — fully vectorizable (uint8 wraps natively);
    # Sub (1) is a per-channel-lane running sum along the row —
    # np.add.accumulate on each of <=4 strided lanes IS that mod-256
    # recurrence. Average (3) and Paeth (4) predict from the
    # just-reconstructed LEFT pixel, a serial data dependency that
    # cannot be row-vectorized; those (rarer) rows keep the scalar
    # spec loop over a bytearray.
    raw_a = np.frombuffer(raw, dtype=np.uint8)
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(height):
        f = raw[p]
        rline = raw_a[p + 1 : p + 1 + stride]
        p += 1 + stride
        cur = out[y]
        if f == 0:
            cur[:] = rline
        elif f == 1:  # Sub
            for j in range(channels):
                np.add.accumulate(rline[j::channels], out=cur[j::channels])
        elif f == 2:  # Up
            np.add(rline, prev, out=cur)
        elif f == 3:  # Average
            line = bytearray(rline.tobytes())
            pv = prev.tobytes()
            for j in range(channels):  # lane-wise: branch-free left lookup
                a = 0
                for i in range(j, stride, channels):
                    a = line[i] = (line[i] + ((a + pv[i]) >> 1)) & 0xFF
            cur[:] = np.frombuffer(line, dtype=np.uint8)
        elif f == 4:  # Paeth
            line = bytearray(rline.tobytes())
            pv = prev.tobytes()
            for j in range(channels):
                a = c = 0
                for i in range(j, stride, channels):
                    b = pv[i]
                    # |p-a| = |b-c|, |p-b| = |a-c|, |p-c| = |a+b-2c|
                    pa = b - c if b >= c else c - b
                    pb = a - c if a >= c else c - a
                    pc = a + b - 2 * c
                    if pc < 0:
                        pc = -pc
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    a = line[i] = (line[i] + pred) & 0xFF
                    c = b
            cur[:] = np.frombuffer(line, dtype=np.uint8)
        else:
            raise ValueError(f"bad filter byte {f}")
        prev = cur
    return width, height, channels, out.tobytes()
