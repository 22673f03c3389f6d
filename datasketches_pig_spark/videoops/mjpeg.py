"""Motion-JPEG in an AVI/RIFF container — the engine's first *compressed*
video codec, closing the last multimodal family without one (audio has
IMA-ADPCM, images have baseline JPEG + PNG).

Why this codec: MJPEG is the one mainstream compressed video format with no
inter-frame prediction — every frame is an independent baseline JPEG — so it
is decodable by the engine's existing pure-numpy JPEG codec
(`imageops/jpeg.py`, cross-validated against javax.imageio both directions)
with only a container walk on top.  The container is RIFF, the same chunk
grammar the WAV codecs already parse.

Scale design: frame independence means a clip decodes frame-parallel with
no state, and the per-clip loop already sits inside the fused Arrow
frame-sample pass (`frames.py::frame_sample_stage`) — JPEG bytes and pixels
never leave the executor; only ~50 B/frame feature rows shuffle.

Reference parity: n/a (the Pig reference has no media operators; this is
against the builder's LLM-pipeline brief).  Container layout follows the
public AVI RIFF spec (hdrl/strl/movi/idx1, '00dc' frame chunks, fourcc
'MJPG'); the writer emits a spec-conforming file and the reader tolerates
the common real-world variants ('00db' chunks, missing idx1).
"""

from __future__ import annotations

import struct

import numpy as np

from datasketches_pig_spark.imageops.jpeg import jpeg_decode, jpeg_encode


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def mjpeg_encode(
    frames: np.ndarray, fps: int = 25, quality: int = 85
) -> bytes:
    """(n_frames, H, W, 3) uint8 RGB → MJPEG-in-AVI bytes.

    Every frame is an independent baseline JPEG ('00dc' chunk, fourcc
    'MJPG'); an idx1 index is written so seek-capable players work."""
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("mjpeg_encode expects uint8 (n, H, W, 3)")
    if fps < 1:
        raise ValueError(f"fps must be >= 1: {fps}")
    n, h, w = frames.shape[:3]

    payloads = [jpeg_encode(f, quality=quality) for f in frames]
    max_sz = max((len(p) for p in payloads), default=0)

    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # microseconds per frame
            max_sz * fps,      # max bytes per second (upper bound)
            0,                 # padding granularity
            0x10,              # flags: AVIF_HASINDEX
            n, 0, 1, max_sz, w, h, 0, 0, 0, 0,
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, n, max_sz,
                      0xFFFFFFFF, 0, 0, 0, w, h),
    )
    # BITMAPINFOHEADER: biCompression = 'MJPG'
    strf = _chunk(
        b"strf",
        struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                    w * h * 3, 0, 0, 0, 0),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_body = b"movi"
    idx_entries = []
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((len(movi_body), len(p)))
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, sz)
            for off, sz in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def mjpeg_decode(blob: bytes) -> np.ndarray:
    """MJPEG-in-AVI bytes → (n_frames, H, W, 3) uint8 RGB.

    Walks the RIFF tree for the 'movi' LIST and decodes every '00dc'/'00db'
    chunk with the in-numpy JPEG codec; validates the strf dimensions
    against the decoded frames.  idx1 is ignored (sequential read)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    dims: tuple[int, int] | None = None
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal dims
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            if cid == b"LIST":
                list_type = buf[body_start : body_start + 4]
                if list_type in (b"hdrl", b"strl", b"movi"):
                    walk(buf, body_start + 4, body_start + size)
            elif cid == b"strf":
                _, w, h = struct.unpack("<Iii", buf[body_start : body_start + 12])
                dims = (abs(h), w)
            elif cid in (b"00dc", b"00db") and size:
                frames.append(jpeg_decode(buf[body_start : body_start + size]))
            pos = body_start + size + (size & 1)

    walk(blob, 12, len(blob))
    if not frames:
        raise ValueError("AVI contains no MJPEG frame chunks")
    shape = frames[0].shape
    if any(f.shape != shape for f in frames):
        raise ValueError("MJPEG frames disagree on dimensions")
    if dims is not None and dims != shape[:2]:
        raise ValueError(
            f"strf header says {dims}, frames decode to {shape[:2]}"
        )
    return np.stack(frames)
