"""In-test MJPEG-AVI muxer — the independent fixture generator that
pins ``multimodal/avi.py`` (same pattern as ``tools/jpeg_ref.py`` for
the JPEG decoder and the in-test PNG encoder before it: the muxer
shares no code with the demuxer and writes the container
spec-literally from the RIFF/AVI documentation).

``mux_avi`` produces a valid single-stream MJPEG AVI: RIFF(AVI ) →
LIST hdrl [avih, LIST strl [strh, strf]] → LIST movi [00dc …] →
idx1. Every structural feature the demuxer must handle is exercised:
word alignment pad bytes (JPEG frames are frequently odd-sized), the
idx1 index (which the sequential demux must skip), and optional
``rec `` interleave lists.
"""

from __future__ import annotations

import struct

__all__ = ["mux_avi"]


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    assert len(fourcc) == 4
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def mux_avi(
    width: int,
    height: int,
    fps: int,
    jpeg_frames: list[bytes],
    use_rec_lists: bool = False,
) -> bytes:
    """Assemble an MJPEG AVI from complete per-frame JPEG streams."""
    usec_per_frame = 1_000_000 // fps
    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)

    avih = struct.pack(
        "<14I",
        usec_per_frame,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags (AVIF_HASINDEX)
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale, dwRate → fps frames/s
            0,  # dwStart
            n,  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (-1 default)
            0,  # dwSampleSize (0: variable-size frames)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage (nominal)
        0, 0, 0, 0,  # biXPelsPerMeter, biYPelsPerMeter, biClrUsed, biClrImportant
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    frame_chunks = [_chunk(b"00dc", f) for f in jpeg_frames]
    if use_rec_lists:
        movi_payload = b"".join(_list(b"rec ", fc) for fc in frame_chunks)
    else:
        movi_payload = b"".join(frame_chunks)
    movi = _list(b"movi", movi_payload)

    # idx1: one entry per frame chunk, offsets relative to the start of
    # the movi list's data (the common convention)
    idx_entries = []
    off = 4  # past the 'movi' list-type fourcc
    for f in jpeg_frames:
        if use_rec_lists:
            off += 12  # LIST header + 'rec '
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
