"""In-test baseline-JPEG encoder + spec-literal decode expectation —
the property pin for ``multimodal/jpeg.py`` (same pattern as the
in-test PNG encoder that pins ``multimodal/png.py``).

``encode_jpeg`` produces a valid baseline JFIF stream (SOF0, Huffman,
restart intervals, FF00 stuffing, 4:4:4 / 4:2:2 / 4:2:0) from raw
pixels AND returns the exact pixels a correct decoder must emit:
JPEG is lossy, but the loss happens entirely at quantization — the
expected output is fully determined by the quantized coefficients,
computed here with an INDEPENDENT spec-literal scalar pipeline
(direct 2-D IDCT double loop per T.81 A.3.3, same +128/round/clamp
and JFIF color constants as the pipeline definition in
``multimodal/jpeg.py``'s docstring). The shipped decoder's batched
einsum must reproduce it byte-for-byte.

Huffman tables are built canonically from the scan's own symbol
frequencies (the DHT segment carries them, so any internally
consistent table is spec-valid; the all-ones codeword is reserved per
K.2 by a trailing dummy symbol).
"""

from __future__ import annotations

import math
import struct
from heapq import heapify, heappop, heappush

from gmall_realtime2021_spark.multimodal.jpeg import ZIGZAG

__all__ = ["encode_jpeg"]

#: Example luminance/chrominance quantization tables (T.81 Annex K.1),
#: row-major. Any tables work for the identity pin; these give
#: realistic coefficient statistics.
QLUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QCHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def _fdct_block(block: list[float]) -> list[float]:
    """Direct 2-D forward DCT (T.81 A.3.3), O(64²) per block — the
    spec formula, deliberately independent of any fast factorization."""
    out = [0.0] * 64
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for v in range(8):
            cv = math.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        block[y * 8 + x]
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                    )
            out[u * 8 + v] = 0.25 * cu * cv * s
    return out


def _idct_block(coef: list[float]) -> list[float]:
    """Direct 2-D inverse DCT (T.81 A.3.3), the scalar spec reference."""
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = math.sqrt(0.5) if u == 0 else 1.0
                for v in range(8):
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * coef[u * 8 + v]
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                    )
            out[y * 8 + x] = 0.25 * s
    return out


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


def _clamp8(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per the spec


def _build_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Canonical Huffman (bits, vals) from symbol frequencies, depth
    capped at 16 via repeated shallowing; a dummy max-value symbol
    reserves the all-ones codeword (K.2)."""
    items = [(f, sym) for sym, f in freqs.items() if f > 0]
    items.append((1, 256))  # dummy reserves the all-1s code
    if len(items) == 1:
        items.append((1, 0))
    heap = [(f, i, [sym]) for i, (f, sym) in enumerate(items)]
    heapify(heap)
    depth: dict[int, int] = {}
    nxt = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heappop(heap)
        f2, _, s2 = heappop(heap)
        for s in s1 + s2:
            depth[s] = depth.get(s, 0) + 1
        heappush(heap, (f1 + f2, nxt, s1 + s2))
        nxt += 1
    while max(depth.values()) > 16:  # crude but safe length limiting
        over = [s for s, d in depth.items() if d > 16]
        under = min(depth, key=lambda s: depth[s])
        for s in over:
            depth[s] = 16
        depth[under] += 1
    order = sorted(depth, key=lambda s: (depth[s], s))
    bits = [0] * 16
    vals: list[int] = []
    for s in order:
        if s == 256:
            continue  # dummy never emitted; its slot keeps all-1s free
        bits[depth[s] - 1] += 1
        vals.append(s)
    # dummy must own the LAST canonical code (the all-ones one): force
    # it deepest by appending its count after real symbols of depth 16
    if depth[256] - 1 < 15 and any(depth[s] > depth[256] for s in order if s != 256):
        # re-run with the dummy pinned to the maximum depth present
        dmax = max(depth.values())
        depth[256] = dmax
        order = sorted(depth, key=lambda s: (depth[s], s if s != 256 else 999))
        bits = [0] * 16
        vals = []
        for s in order:
            if s == 256:
                continue
            bits[depth[s] - 1] += 1
            vals.append(s)
    return bits, vals


def _assign_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if code >= (1 << ln):  # Kraft overflow — the crude depth
                # limiter in _build_huffman broke canonical validity;
                # fail loudly rather than emit an undecodable stream
                raise ValueError("huffman table overflows canonical code space")
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _category(v: int) -> int:
    a = abs(v)
    t = 0
    while a:
        a >>= 1
        t += 1
    return t


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> tuple[bytes, bytes]:
    """Encode raw pixels (gray ``channels=1`` or RGB ``channels=3``)
    as baseline JFIF and return ``(jpeg_bytes, expected_pixels)``
    where ``expected_pixels`` is what a correct decoder must produce
    (computed from the quantized coefficients with the scalar spec
    pipeline)."""
    if channels == 1:
        comps = [(1, 1, 1, 0)]
        planes = [[float(pixels[y * width + x]) for y in range(height) for x in range(width)]]
    else:
        hv = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
        comps = [(1, hv[0], hv[1], 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        ys, cbs, crs = [], [], []
        for i in range(width * height):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            ys.append(_round_half_up(0.299 * r + 0.587 * g + 0.114 * b))
            cbs.append(_round_half_up(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0))
            crs.append(_round_half_up(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0))
        planes = [
            [float(_clamp8(v)) for v in ys],
            [float(_clamp8(v)) for v in cbs],
            [float(_clamp8(v)) for v in crs],
        ]
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    qt = {0: QLUMA, 1: QCHROMA if channels == 3 else QLUMA}

    # per-component sample grids at component resolution, edge-padded
    # to whole MCUs (edge replication, the conventional pad)
    comp_samples = []
    for idx, (cid, h, v, tq) in enumerate(comps):
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        if h == hmax and v == vmax:
            src = planes[idx]
            sw, sh = width, height
            grid = [
                [src[min(y, sh - 1) * sw + min(x, sw - 1)] for x in range(cw)]
                for y in range(ch)
            ]
        else:
            # box-average downsample (JFIF recommendation), round half up
            fx, fy = hmax // h, vmax // v
            src = planes[idx]
            grid = []
            for y in range(ch):
                row = []
                for x in range(cw):
                    tot = cnt = 0
                    for yy in range(y * fy, min((y + 1) * fy, height)):
                        for xx in range(x * fx, min((x + 1) * fx, width)):
                            tot += src[yy * width + xx]
                            cnt += 1
                    row.append(float(_round_half_up(tot / cnt)) if cnt else 128.0)
                grid.append(row)
        # pad to MCU multiple
        gw, gh = mcux * h * 8, mcuy * v * 8
        grid = [row + [row[-1]] * (gw - len(row)) for row in grid]
        grid += [grid[-1][:]] * (gh - len(grid))
        comp_samples.append(grid)

    # forward DCT + quantize every block (MCU order), collecting the
    # quantized coefficients both for entropy coding and the expected
    # decode
    comp_qcoef: list[dict[tuple[int, int], list[int]]] = [dict() for _ in comps]
    for idx, (cid, h, v, tq) in enumerate(comps):
        grid = comp_samples[idx]
        for byy in range(mcuy * v):
            for bxx in range(mcux * h):
                block = [
                    grid[byy * 8 + y][bxx * 8 + x] - 128.0 for y in range(8) for x in range(8)
                ]
                coefs = _fdct_block(block)
                q = [
                    _round_half_up(coefs[i] / qt[tq][i])
                    if coefs[i] >= 0
                    else -_round_half_up(-coefs[i] / qt[tq][i])
                    for i in range(64)
                ]
                comp_qcoef[idx][(byy, bxx)] = q

    # ---- expected decode (scalar spec pipeline, independent IDCT)
    comp_decoded = []
    for idx, (cid, h, v, tq) in enumerate(comps):
        gw, gh = mcux * h * 8, mcuy * v * 8
        plane = [[0] * gw for _ in range(gh)]
        for (byy, bxx), q in comp_qcoef[idx].items():
            deq = [q[i] * float(qt[tq][i]) for i in range(64)]
            spatial = _idct_block(deq)
            for y in range(8):
                for x in range(8):
                    plane[byy * 8 + y][bxx * 8 + x] = _clamp8(
                        _round_half_up(spatial[y * 8 + x] + 128.0)
                    )
        # upsample by replication, crop to frame
        fy, fx = vmax // v, hmax // h
        up = [
            [plane[y // fy][x // fx] for x in range(width)] for y in range(height)
        ]
        comp_decoded.append(up)
    if channels == 1:
        expected = bytes(comp_decoded[0][y][x] for y in range(height) for x in range(width))
    else:
        out = bytearray()
        for y in range(height):
            for x in range(width):
                yy = float(comp_decoded[0][y][x])
                cb = float(comp_decoded[1][y][x])
                cr = float(comp_decoded[2][y][x])
                out.append(_clamp8(_round_half_up(yy + 1.402 * (cr - 128.0))))
                out.append(
                    _clamp8(
                        _round_half_up(yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
                    )
                )
                out.append(_clamp8(_round_half_up(yy + 1.772 * (cb - 128.0))))
        expected = bytes(out)

    # ---- entropy statistics (two passes: count, then emit)
    def mcu_symbols(collect_dc, collect_ac, emit=None):
        preds = [0] * len(comps)
        mcu = 0
        writer = emit
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    if writer is not None:
                        writer["bw"].flush()
                        writer["data"] += writer["bw"].out
                        writer["bw"].__init__()
                        writer["data"] += bytes(
                            [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
                        )
                    preds = [0] * len(comps)
                for idx, (cid, h, v, tq) in enumerate(comps):
                    tclass = 0 if idx == 0 or channels == 1 else 1
                    for by in range(v):
                        for bx in range(h):
                            q = comp_qcoef[idx][(my * v + by, mx * h + bx)]
                            zz = [q[ZIGZAG[k]] for k in range(64)]
                            diff = zz[0] - preds[idx]
                            preds[idx] = zz[0]
                            t = _category(diff)
                            collect_dc[tclass][t] = collect_dc[tclass].get(t, 0) + 1
                            if writer is not None:
                                code, ln = writer["dc"][tclass][t]
                                writer["bw"].write(code, ln)
                                if t:
                                    mag = diff if diff >= 0 else diff + (1 << t) - 1
                                    writer["bw"].write(mag, t)
                            run = 0
                            for k in range(1, 64):
                                if zz[k] == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    collect_ac[tclass][0xF0] = (
                                        collect_ac[tclass].get(0xF0, 0) + 1
                                    )
                                    if writer is not None:
                                        code, ln = writer["ac"][tclass][0xF0]
                                        writer["bw"].write(code, ln)
                                    run -= 16
                                s = _category(zz[k])
                                rs = (run << 4) | s
                                collect_ac[tclass][rs] = collect_ac[tclass].get(rs, 0) + 1
                                if writer is not None:
                                    code, ln = writer["ac"][tclass][rs]
                                    writer["bw"].write(code, ln)
                                    mag = zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1
                                    writer["bw"].write(mag, s)
                                run = 0
                            if run:
                                collect_ac[tclass][0x00] = collect_ac[tclass].get(0x00, 0) + 1
                                if writer is not None:
                                    code, ln = writer["ac"][tclass][0x00]
                                    writer["bw"].write(code, ln)
                mcu += 1

    n_classes = 1 if channels == 1 else 2
    dc_freq = [dict() for _ in range(2)]
    ac_freq = [dict() for _ in range(2)]
    mcu_symbols(dc_freq, ac_freq)
    dc_tbl = [_build_huffman(dc_freq[c]) if dc_freq[c] else ([1] + [0] * 15, [0]) for c in range(n_classes)]
    ac_tbl = [_build_huffman(ac_freq[c]) if ac_freq[c] else ([1] + [0] * 15, [0]) for c in range(n_classes)]
    dc_codes = [_assign_codes(*t) for t in dc_tbl]
    ac_codes = [_assign_codes(*t) for t in ac_tbl]
    writer = {"bw": _BitWriter(), "data": bytearray(), "dc": dc_codes, "ac": ac_codes}
    mcu_symbols([dict(), dict()], [dict(), dict()], emit=writer)
    writer["bw"].flush()
    writer["data"] += writer["bw"].out

    # ---- assemble the stream
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq in sorted({tq for _, _, _, tq in comps}):
        out += seg(0xDB, bytes([tq]) + bytes(qt[tq][ZIGZAG[k]] for k in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, h, v, tq in comps:
        sof += bytes([cid, (h << 4) | v, tq])
    out += seg(0xC0, sof)
    for c in range(n_classes):
        bits, vals = dc_tbl[c]
        out += seg(0xC4, bytes([c]) + bytes(bits) + bytes(vals))
        bits, vals = ac_tbl[c]
        out += seg(0xC4, bytes([0x10 | c]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for idx, (cid, _, _, _) in enumerate(comps):
        tclass = 0 if idx == 0 or channels == 1 else 1
        sos += bytes([cid, (tclass << 4) | tclass])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer["data"]
    out += b"\xff\xd9"
    return bytes(out), expected
