"""Pure-Python/numpy baseline-JPEG decode — the REAL image path for
the dominant web-corpus format.

The container ships no codec libraries, but baseline JFIF is decodable
from the public specification alone (ITU-T T.81 / ISO 10918-1 + the
JFIF colorspace note): marker segments, DQT/DHT tables, the
interleaved Huffman-coded MCU scan, dequantization, the 8×8 inverse
DCT, chroma upsampling and the JFIF YCbCr→RGB transform. This module
extends the PNG/WAV real-media precedent (``multimodal/png.py``,
``multimodal/wav.py``) to JPEG, so ``image_phash`` and the decode
operators are honest on actual photographs, in this container, today.

Supported profile (the baseline that covers the overwhelming majority
of web JPEGs): SOF0 (baseline sequential DCT), 8-bit samples, 1 or 3
components, sampling factors 1 or 2 per axis (4:4:4, 4:2:2, 4:2:0),
restart intervals, FF00 byte stuffing. Anything else (progressive
SOF2, arithmetic coding, 12-bit, CMYK) raises ValueError and the
caller falls back to the deterministic fake — the same contract as a
missing codec library.

Pipeline definition (pinned by ``tools/media_kernel_bench.py``
against a spec-literal scalar reconstruction and an in-test encoder,
like 828e065 did for PNG; the pin allows ±1 LSB on ≤0.5% of pixels —
the two pipelines associate the IDCT differently, so coefficients
within fp-noise of the rounding boundary may legitimately differ by
one, ADVICE r10):

1. entropy-decode → per-component quantized coefficient blocks
   (zigzag order) — inherently serial, plain Python bit reader;
2. dequantize + de-zigzag + separable float64 IDCT batched over ALL
   blocks per component — (Aᵀ·C)·A as two chained single-contraction
   einsum(optimize=False) calls (fixed association, numpy's own C
   summation loop, never BLAS), +128 level shift, floor(x+0.5)
   rounding, clamp to [0, 255] — one numpy pass;
3. nearest-neighbor chroma upsample (pixel replication — the JFIF
   box filter), crop to the frame size;
4. YCbCr→RGB with the JFIF constants (1.402 / 0.344136 / 0.714136 /
   1.772), floor(x+0.5), clamp.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["JPEG_MAGIC", "decode_jpeg"]

JPEG_MAGIC = b"\xff\xd8"

#: Hard ceiling on decoded pixel bytes (same budget as the PNG path) —
#: a crafted SOF claiming absurd geometry fails fast.
_MAX_PIXEL_BYTES = 1 << 28

#: Zigzag scan order: ZIGZAG[k] = row-major index of the k-th
#: coefficient in scan order (T.81 Figure 5).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: 8×8 IDCT basis: A[u, x] = c(u)/2 · cos((2x+1)·u·π/16); spatial
#: block = Aᵀ · coeff · A. Built once in float64.
_IDCT_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


class _HuffTable:
    """Canonical Huffman table in the spec's DECODE form (T.81 F.2.2.3):
    per code length, the smallest/largest code and the index of its
    first symbol."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits: list[int], vals: bytes) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += n
                k += n
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (byte
    stuffing already removed). Running off the end raises ValueError —
    truncated scans must fall back, never hang."""

    __slots__ = ("bits", "pos")

    def __init__(self, segment: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(segment, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.bits):
            raise ValueError("truncated entropy segment")
        v = 0
        for b in self.bits[self.pos : end]:
            v = (v << 1) | int(b)
        self.pos = end
        return v

    def decode(self, tbl: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            if self.pos >= len(self.bits):
                raise ValueError("truncated entropy segment")
            code = (code << 1) | int(self.bits[self.pos])
            self.pos += 1
            if code <= tbl.maxcode[ln]:
                return tbl.vals[tbl.valptr[ln] + code - tbl.mincode[ln]]
        raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude v to its signed
    coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Slice the entropy-coded data from ``pos`` into restart segments
    (split at RSTn), with FF00 stuffing removed, stopping at the next
    real marker. Returns (segments, position of that marker's FF)."""
    segments: list[bytes] = []
    out = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            out.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            out.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segments.append(bytes(out))
            out = bytearray()
            i += 2
        else:  # real marker (EOI or next segment)
            break
    segments.append(bytes(out))
    return segments, i


def decode_jpeg(data: bytes, _reconstruct=None) -> tuple[int, int, int, bytes]:
    """Decode a baseline JFIF JPEG → ``(width, height, channels,
    pixels)`` with ``pixels`` row-major (len = w·h·channels; channels
    is 1 for grayscale, 3 for YCbCr→RGB). Raises ValueError on
    non-JPEG bytes or unsupported profiles.

    ``_reconstruct`` is the injection point for the spec-literal
    scalar reconstruction in ``tools/media_kernel_bench.py`` (the
    bit-identity + speedup pin); production callers leave it None
    (the batched :func:`_reconstruct_plane`)."""
    if not data.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    restart_interval = 0
    frame = None  # (width, height, comps) where comps = [(cid, h, v, tq)]
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2: any number of
            pos += 1       # 0xFF pads may precede a marker)
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.float64
                )
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                htables[(tc, th)] = _HuffTable(bits, seg[i + 17 : i + 17 + nv])
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or nc not in (1, 3):
                raise ValueError("unsupported SOF0 profile")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 15
                if h not in (1, 2) or v not in (1, 2):
                    raise ValueError("unsupported sampling factor")
                comps.append((cid, h, v, tq))
            frame = (width, height, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            return _decode_scan(
                data, pos, seg, frame, qtables, htables, restart_interval,
                _reconstruct or _reconstruct_plane,
            )
        # APPn/COM/etc.: skipped
    raise ValueError("no scan in JPEG")


def _decode_scan(data, pos, sos, frame, qtables, htables, restart_interval, reconstruct):
    width, height, comps = frame
    ns = sos[0]
    if ns != len(comps):
        raise ValueError("non-interleaved scans unsupported")
    # per-component (dc table, ac table) from the scan header
    scan_tbl = {}
    for i in range(ns):
        cs, tda = sos[1 + 2 * i : 3 + 2 * i]
        scan_tbl[cs] = (tda >> 4, tda & 15)
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    if width * height * len(comps) > _MAX_PIXEL_BYTES:
        raise ValueError("JPEG geometry exceeds decode budget")
    coef = {
        cid: np.zeros((mcuy * v, mcux * h, 64), dtype=np.int32)
        for cid, h, v, _ in comps
    }
    segments, _ = _split_segments(data, pos)
    mcus_total = mcux * mcuy
    per_seg = restart_interval if restart_interval else mcus_total
    mcu = 0
    for seg_bytes in segments:
        if mcu >= mcus_total:
            break
        reader = _BitReader(seg_bytes)
        pred = {cid: 0 for cid, _, _, _ in comps}  # DC predictors reset per restart
        for _ in range(min(per_seg, mcus_total - mcu)):
            my, mx = divmod(mcu, mcux)
            for cid, h, v, _tq in comps:
                dc_t = htables.get((0, scan_tbl[cid][0]))
                ac_t = htables.get((1, scan_tbl[cid][1]))
                if dc_t is None or ac_t is None:
                    raise ValueError("missing Huffman table")
                for by in range(v):
                    for bx in range(h):
                        blk = coef[cid][my * v + by, mx * h + bx]
                        t = reader.decode(dc_t)
                        if t > 11:
                            raise ValueError("bad DC magnitude")
                        pred[cid] += _extend(reader.read(t), t)
                        blk[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break  # EOB
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            blk[k] = _extend(reader.read(s), s)
                            k += 1
            mcu += 1
    if mcu != mcus_total:
        raise ValueError("truncated scan")
    planes = {}
    for cid, h, v, tq in comps:
        if tq not in qtables:
            raise ValueError("missing quant table")
        planes[cid] = reconstruct(coef[cid], qtables[tq])
    return _assemble(width, height, comps, planes, hmax, vmax)


def _reconstruct_plane(blocks_zz: np.ndarray, qtbl_zz: np.ndarray) -> np.ndarray:
    """Stage 2, batched: (nby, nbx, 64) zigzag quantized coefficients →
    (nby·8, nbx·8) uint8 plane. Dequantize, de-zigzag, one einsum IDCT
    over every block, +128 level shift, floor(x+0.5), clamp."""
    nby, nbx, _ = blocks_zz.shape
    deq = blocks_zz.astype(np.float64) * qtbl_zz[None, None, :]
    full = np.zeros((nby, nbx, 64), dtype=np.float64)
    full[:, :, ZIGZAG] = deq  # scan position k lives at row-major ZIGZAG[k]
    full = full.reshape(nby, nbx, 8, 8)
    # spatial = Aᵀ · coeff · A, batched over blocks, as TWO chained
    # single-contraction einsum calls with optimize=False. Why this
    # exact form (ADVICE r10, refined by the r11 self-review):
    # einsum(optimize=True) picks its contraction path with a
    # numpy-version-dependent heuristic, and @/np.matmul dispatches to
    # BLAS gemm whose accumulation order varies across BLAS builds
    # (OpenBLAS/MKL micro-kernels, FMA use) — under either, a
    # coefficient within fp-noise of the floor(x+0.5) boundary can
    # flip a pixel LSB between environments. A two-operand einsum with
    # optimize=False has no path to choose and runs numpy's own
    # fixed-order C summation loop, never BLAS, so the association
    # (Aᵀ·C)·A AND each dot's accumulation order are part of this
    # decoder's definition.
    half = np.einsum("ux,yvuw->yvxw", _IDCT_A, full, optimize=False)
    spatial = np.einsum("yvxw,wz->yvxz", half, _IDCT_A, optimize=False)
    pix = np.floor(spatial + 128.0 + 0.5)
    np.clip(pix, 0, 255, out=pix)
    plane = pix.astype(np.uint8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return plane


def _assemble(width, height, comps, planes, hmax, vmax):
    """Stage 3+4: upsample to frame geometry, convert colorspace."""
    up = []
    for cid, h, v, _ in comps:
        p = planes[cid]
        if h != hmax:
            p = np.repeat(p, hmax // h, axis=1)
        if v != vmax:
            p = np.repeat(p, vmax // v, axis=0)
        up.append(p[:height, :width].astype(np.float64))
    if len(comps) == 1:
        return width, height, 1, up[0].astype(np.uint8).tobytes()
    y, cb, cr = up
    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5)
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    rgb = np.stack([r, g, b], axis=2)
    np.clip(rgb, 0, 255, out=rgb)
    return width, height, 3, rgb.astype(np.uint8).tobytes()
