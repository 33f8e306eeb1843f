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
    # Unfilter (r08: row-vectorized where the spec recurrence allows;
    # r09: anti-diagonal wavefront for Average/Paeth row runs).
    # None (0) is a copy; Up (2) is element-wise mod-256 addition over
    # the previous ROW — fully vectorizable (uint8 wraps natively);
    # Sub (1) is a per-channel-lane running sum along the row —
    # np.add.accumulate on each of <=4 strided lanes IS that mod-256
    # recurrence. Average (3) and Paeth (4) predict from the
    # just-reconstructed LEFT pixel — serial along a row, but cells on
    # an ANTI-DIAGONAL of a run of consecutive 3/4 rows are mutually
    # independent (each depends only on the two previous diagonals),
    # so maximal runs go through :func:`_unfilter_wavefront`; isolated
    # rows (and tiny images) keep the scalar spec loop.
    raw_a = np.frombuffer(raw, dtype=np.uint8)
    scan = raw_a.reshape(height, stride + 1)
    filters = scan[:, 0]
    if filters.max(initial=0) > 4:
        raise ValueError(f"bad filter byte {int(filters.max())}")
    lines = scan[:, 1:]
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    y = 0
    while y < height:
        f = filters[y]
        rline = lines[y]
        cur = out[y]
        if f == 0:
            cur[:] = rline
        elif f == 1:  # Sub
            for j in range(channels):
                np.add.accumulate(rline[j::channels], out=cur[j::channels])
        elif f == 2:  # Up
            np.add(rline, prev, out=cur)
        else:  # Average (3) / Paeth (4)
            y2 = y + 1
            while y2 < height and filters[y2] >= 3:
                y2 += 1
            if y2 - y >= _WAVE_MIN_ROWS and width >= _WAVE_MIN_WIDTH:
                _unfilter_wavefront(
                    lines[y:y2], filters[y:y2], prev, out[y:y2], channels
                )
            else:
                for yy in range(y, y2):
                    _unfilter_row_scalar(
                        lines[yy], int(filters[yy]), prev, out[yy], channels
                    )
                    prev = out[yy]
            y = y2
            prev = out[y2 - 1]
            continue
        prev = cur
        y += 1
    return width, height, channels, out.tobytes()


#: Wavefront engages for runs of >= 4 Average/Paeth rows on images at
#: least 32 px wide; below that the per-diagonal numpy dispatch costs
#: more than the scalar loop it replaces (measured, tools/
#: media_kernel_bench.py).
_WAVE_MIN_ROWS = 4
_WAVE_MIN_WIDTH = 32
#: Rows per wavefront chunk — bounds the sheared workspace to
#: ~(W+129)·129·C int16 cells regardless of image height (a 8k-wide
#: RGBA image chunks at ~17 MB) while keeping diagonals long enough
#: to amortize dispatch.
_WAVE_BLOCK_ROWS = 128


def _unfilter_row_scalar(rline, f: int, prev, cur, channels: int) -> None:
    """Spec-literal scalar Average/Paeth unfilter for one row (the
    reference recurrence; also the fallback for short runs)."""
    stride = len(cur)
    line = bytearray(rline.tobytes())
    pv = prev.tobytes()
    if f == 3:  # Average
        for j in range(channels):  # lane-wise: branch-free left lookup
            a = 0
            for i in range(j, stride, channels):
                a = line[i] = (line[i] + ((a + pv[i]) >> 1)) & 0xFF
    else:  # Paeth
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
    cur[:] = np.frombuffer(bytes(line), dtype=np.uint8)


def _unfilter_wavefront(lines, filts, prev, out_rows, channels: int) -> None:
    """Anti-diagonal wavefront unfilter for a run of consecutive
    Average/Paeth rows (public technique from parallel PNG decoders;
    bit-identical to the spec recurrence, pinned in
    tools/media_kernel_bench.py).

    Cell (r, x) depends on (r, x−1), (r−1, x), (r−1, x−1) — all on the
    two previous anti-diagonals — so diagonal d = r + x is computable
    as ONE vector op once d−1 and d−2 exist. The workspace is stored
    SHEARED with diagonals as contiguous rows (``T[u, rp] =
    grid[rp, u−rp]``): reads hit rows u−1/u−2 as contiguous slices and
    the write is contiguous, which is what moves the speedup from
    ~1.5× (fancy-indexed gather) to ~4–5× at 256–512 px RGB/RGBA.
    Runs chunk at :data:`_WAVE_BLOCK_ROWS` rows (prev chains across
    chunks) so workspace stays bounded for tall images.
    """
    total = len(filts)
    for base in range(0, total, _WAVE_BLOCK_ROWS):
        r_n = min(_WAVE_BLOCK_ROWS, total - base)
        W = len(prev) // channels
        # T[u, rp] = grid[rp, u-rp]; grid row 0 = prev, grid col 0 = 0
        # (the a = c = 0 seeds at x = 0); cell (r, x) lives at
        # (u, rp) = (r + x + 2, r + 1).
        shape = (r_n + W + 2, r_n + 1, channels)
        T = np.zeros(shape, np.int16)
        T[1 : W + 1, 0] = prev.reshape(W, channels)
        Tx = np.zeros(shape, np.int16)
        Xr = lines[base : base + r_n].reshape(r_n, W, channels)
        for r in range(r_n):
            Tx[r + 2 : r + 2 + W, r + 1] = Xr[r]
        is_avg = np.zeros(r_n + 2, bool)
        is_avg[1 : r_n + 1] = filts[base : base + r_n] == 3
        all_avg = bool(is_avg[1 : r_n + 1].all())
        any_avg = bool(is_avg.any())
        for d in range(r_n + W - 1):
            lo = max(0, d - W + 1)
            hi = min(r_n - 1, d)
            u = d + 2
            s0, s1 = lo + 1, hi + 2
            a = T[u - 1, s0:s1]
            b = T[u - 1, s0 - 1 : s1 - 1]
            c = T[u - 2, s0 - 1 : s1 - 1]
            x = Tx[u, s0:s1]
            if all_avg:
                T[u, s0:s1] = (x + ((a + b) >> 1)) & 0xFF
                continue
            pa = np.abs(b - c)
            pb = np.abs(a - c)
            pc = np.abs(a + b - 2 * c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            if any_avg:
                av = is_avg[s0:s1]
                if av.any():
                    pred = np.where(av[:, None], (a + b) >> 1, pred)
            T[u, s0:s1] = (x + pred) & 0xFF
        for r in range(r_n):
            out_rows[base + r] = (
                T[r + 2 : r + 2 + W, r + 1].astype(np.uint8).reshape(W * channels)
            )
        prev = out_rows[base + r_n - 1]
