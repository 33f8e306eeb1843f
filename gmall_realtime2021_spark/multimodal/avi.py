"""Baseline RIFF-AVI container demux (MJPEG) — the real video path.

Closes the last labeled stub in the multimodal family (VERDICT r10
item #5): ``media.frame_sample`` / ``media.decode_media`` dispatch on
the RIFF magic exactly like the image path dispatches on PNG/JPEG
magic, and each demuxed MJPEG frame is a complete baseline JPEG that
``multimodal/jpeg.py`` decodes for real. Undecodable payloads keep
the deterministic fake path.

Scope (public spec: Microsoft RIFF/AVI, "AVI RIFF File Reference";
OpenDML extensions are out of scope the way progressive JPEG is for
the JPEG decoder):

- one RIFF chunk, form type ``AVI `` — chunks are
  ``fourcc + uint32le size + data``, word-aligned (odd sizes carry a
  pad byte, T.81-style);
- ``LIST hdrl`` with ``avih`` (MainAVIHeader: µs/frame, total
  frames, width, height) and one ``LIST strl`` per stream
  (``strh`` AVIStreamHeader + ``strf`` BITMAPINFOHEADER for video);
- the FIRST ``vids`` stream must be MJPEG (``strh.fccHandler`` or
  ``strf.biCompression`` of ``MJPG``/``mjpg``/``dmb1``); audio and
  further streams are skipped, not errors;
- ``LIST movi`` holds the frame chunks: ``NNdb``/``NNdc`` where NN
  is the stream number — each data payload is one complete JPEG;
  ``rec `` sub-lists (interleaved files) are walked recursively;
- a trailing ``idx1`` index is ignored (the demux is sequential).

Anything else — truncated chunks, missing headers, a non-MJPEG video
stream, zero frames — raises ValueError: "not decodable for real",
and the caller falls back to the fake path.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

__all__ = ["AVI_MAGIC", "AviVideo", "parse_avi", "is_avi"]

AVI_MAGIC = b"RIFF"
_MJPEG_CODECS = {b"MJPG", b"mjpg", b"dmb1", b"MJPA"}


@dataclass
class AviVideo:
    """Demuxed MJPEG video stream: geometry, timing, raw JPEG frames."""

    width: int
    height: int
    usec_per_frame: int
    frames: list[bytes]

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_ms(self) -> int:
        return self.n_frames * self.usec_per_frame // 1000


def is_avi(payload: bytes) -> bool:
    """Cheap magic probe (the dispatch test — full validation happens
    in :func:`parse_avi`)."""
    return len(payload) >= 12 and payload[:4] == AVI_MAGIC and payload[8:12] == b"AVI "


def _chunks(buf: bytes, off: int, end: int):
    """Iterate RIFF chunks in ``buf[off:end]`` → (fourcc, data_lo,
    data_hi). Word alignment per the RIFF spec: an odd-sized chunk is
    followed by one pad byte that belongs to neither chunk."""
    while off + 8 <= end:
        fourcc = buf[off : off + 4]
        (size,) = struct.unpack_from("<I", buf, off + 4)
        lo = off + 8
        hi = lo + size
        if hi > end:
            raise ValueError("truncated RIFF chunk")
        yield fourcc, lo, hi
        off = hi + (size & 1)
    if off != end and off + 8 > end and off < end:
        # trailing garbage shorter than a chunk header
        raise ValueError("trailing bytes after last RIFF chunk")


def _collect_movi_frames(buf: bytes, lo: int, hi: int, stream_no: int, out: list[bytes]) -> None:
    tag_db = b"%02ddb" % stream_no
    tag_dc = b"%02ddc" % stream_no
    # Iterative worklist, not recursion: 'rec ' LISTs may nest, and a
    # crafted payload with thousands of nested rec lists must surface
    # as a bounded parse (or ValueError) — a RecursionError would
    # escape the ValueError/struct.error containment contract of
    # media._parse_video_real and fail the whole Spark task.
    stack = [_chunks(buf, lo, hi)]
    while stack:
        descended = False
        for fourcc, clo, chi in stack[-1]:
            if fourcc == b"LIST" and buf[clo : clo + 4] == b"rec ":
                # Descend immediately so frame ORDER matches the spec's
                # in-order layout (frames inside a rec list precede
                # later same-level frames — frames[0] feeds the real
                # JPEG decode, so order is observable).
                stack.append(_chunks(buf, clo + 4, chi))
                descended = True
                break
            if fourcc in (tag_db, tag_dc):
                out.append(bytes(buf[clo:chi]))
        if not descended:
            stack.pop()


def parse_avi(payload: bytes) -> AviVideo:
    """Demux an MJPEG AVI → :class:`AviVideo`. ValueError on anything
    that is not a well-formed single-RIFF MJPEG AVI."""
    buf = bytes(payload)
    if not is_avi(buf):
        raise ValueError("not a RIFF AVI")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    end = 8 + riff_size
    if end > len(buf):
        raise ValueError("truncated RIFF payload")

    usec_per_frame = None
    width = height = None
    vids_stream_no = None
    stream_no = -1
    frames: list[bytes] = []

    for fourcc, lo, hi in _chunks(buf, 12, end):
        if fourcc != b"LIST":
            continue  # idx1 / JUNK / vendor chunks
        list_type = buf[lo : lo + 4]
        if list_type == b"hdrl":
            for f2, l2, h2 in _chunks(buf, lo + 4, hi):
                if f2 == b"avih":
                    if h2 - l2 < 40:
                        raise ValueError("short avih")
                    (usec_per_frame,) = struct.unpack_from("<I", buf, l2)
                elif f2 == b"LIST" and buf[l2 : l2 + 4] == b"strl":
                    stream_no += 1
                    fcc_type = fcc_handler = compression = None
                    sw = sh = None
                    for f3, l3, h3 in _chunks(buf, l2 + 4, h2):
                        if f3 == b"strh":
                            if h3 - l3 < 8:
                                raise ValueError("short strh")
                            fcc_type = buf[l3 : l3 + 4]
                            fcc_handler = buf[l3 + 4 : l3 + 8]
                        elif f3 == b"strf" and fcc_type == b"vids":
                            if h3 - l3 < 20:
                                raise ValueError("short strf")
                            sw, sh = struct.unpack_from("<ii", buf, l3 + 4)
                            compression = buf[l3 + 16 : l3 + 20]
                    if fcc_type == b"vids" and vids_stream_no is None:
                        if fcc_handler not in _MJPEG_CODECS and compression not in _MJPEG_CODECS:
                            raise ValueError("video stream is not MJPEG")
                        vids_stream_no = stream_no
                        width, height = sw, abs(sh or 0)
        elif list_type == b"movi":
            if vids_stream_no is None:
                raise ValueError("movi before any vids stream header")
            _collect_movi_frames(buf, lo + 4, hi, vids_stream_no, frames)

    if usec_per_frame is None or vids_stream_no is None:
        raise ValueError("missing avih/vids headers")
    if not frames:
        raise ValueError("no video frames")
    # width keeps its BITMAPINFOHEADER sign so a negative biWidth (an
    # invalid container — only biHeight may legally be negative for
    # top-down rows) is rejected here rather than served as geometry.
    if width is None or width <= 0 or not height or usec_per_frame <= 0:
        raise ValueError("degenerate geometry/timing")
    return AviVideo(width=width, height=height, usec_per_frame=usec_per_frame, frames=frames)
