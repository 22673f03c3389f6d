"""GIF decoder (87a/89a) in pure Python/numpy — no imaging libraries.

Closes another real crawl-corpus format (r6): LZW decompression
(variable-width LSB-first codes, clear/EOI, 12-bit dictionary cap),
global + local color tables, the 4-pass row interlace, and first-frame
compositing onto the logical canvas.  Scope (honest limits, enforced
loudly):

* FIRST frame only — the perceptual near-dup feature stage consumes one
  RGB frame per image payload; animated GIFs decode to their first frame
  (by far the dominant single-frame case in practice).  Transparent
  pixels keep the canvas background color.
* Corrupt streams raise: truncated sub-blocks, LZW code overrun, pixel
  under/overflow, and missing image data are all errors — never a
  silently-wrong frame (same contract as the JPEG/PNG codecs).

Cross-validated against the JDK's javax.imageio GIF reader with EXACT
equality (palette lookup is lossless) in ``tests/test_gif.py``, including
JDK-written interlaced streams.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(data: bytes, min_code: int, expected: int) -> np.ndarray:
    """GIF-variant LZW → ``expected`` palette indices (uint8)."""
    # ≤ 8: GIF palettes hold at most 256 entries, and the base-dictionary
    # build below (bytes([i]) for i < 2^min_code) requires it anyway — a
    # larger advertised code size is a corrupt stream, not a bigger palette
    if not 2 <= min_code <= 8:
        raise ValueError(f"gif: invalid LZW minimum code size {min_code}")
    clear = 1 << min_code
    eoi = clear + 1
    out = np.empty(expected, dtype=np.uint8)
    n = 0
    acc = 0
    bits = 0
    width = min_code + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    dict_: list[bytes] = list(base)
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                dict_ = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                if n != expected:
                    raise ValueError(
                        f"gif: LZW ended at {n} of {expected} pixels"
                    )
                return out
            if prev is None:
                if code >= len(dict_):
                    raise ValueError("gif: LZW code before any output")
                entry = dict_[code]
            else:
                if code < len(dict_):
                    entry = dict_[code]
                elif code == len(dict_):
                    entry = prev + prev[:1]
                else:
                    raise ValueError("gif: LZW code beyond dictionary")
                if len(dict_) < 4096:
                    dict_.append(prev + entry[:1])
                    if len(dict_) == (1 << width) and width < 12:
                        width += 1
            if n + len(entry) > expected:
                raise ValueError("gif: LZW produced more pixels than the frame")
            out[n : n + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
            n += len(entry)
            prev = entry
    if n != expected:
        raise ValueError(f"gif: LZW stream truncated at {n} of {expected} pixels")
    return out


def _sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    """Length-prefixed data sub-blocks → (concatenated bytes, next pos)."""
    chunks = []
    while True:
        if pos >= len(blob):
            raise ValueError("gif: truncated data sub-blocks")
        ln = blob[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        if pos + ln > len(blob):
            raise ValueError("gif: truncated data sub-block")
        chunks.append(blob[pos : pos + ln])
        pos += ln


# interlace passes: row starts and steps, in emission order
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(blob: bytes) -> np.ndarray:
    """GIF87a/89a → uint8 H×W×3 RGB of the FIRST frame composited on the
    logical-screen canvas."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    if len(blob) < 13:
        raise ValueError("gif: truncated header")
    w, h, flags, bg_idx, _aspect = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(blob):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(blob[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < gct.shape[0]:
        canvas[:] = gct[bg_idx]
    transparent = None

    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            raise ValueError("gif: no image frame before trailer")
        if b0 == 0x21:  # extension
            if pos >= len(blob):
                raise ValueError("gif: truncated extension")
            label = blob[pos]
            pos += 1
            data, pos = _sub_blocks(blob, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                if data[0] & 0x01:
                    transparent = data[3]
            continue
        if b0 != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b0:02X}")
        # image descriptor
        if pos + 9 > len(blob):
            raise ValueError("gif: truncated image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", blob[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(blob):
                raise ValueError("gif: truncated local color table")
            ct = np.frombuffer(blob[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: frame has no color table")
        if ix + iw > w or iy + ih > h:
            raise ValueError("gif: frame exceeds the logical screen")
        if pos >= len(blob):
            raise ValueError("gif: missing LZW minimum code size")
        min_code = blob[pos]
        pos += 1
        data, pos = _sub_blocks(blob, pos)
        idx = _lzw_decode(data, min_code, iw * ih)
        if int(idx.max(initial=0)) >= ct.shape[0]:
            raise ValueError("gif: palette index out of range")
        if iflags & 0x40:  # interlaced: reorder emitted rows into place
            rows = np.empty(ih, dtype=np.int64)
            r = 0
            for start, step in _INTERLACE:
                n_rows = len(range(start, ih, step))
                rows[r : r + n_rows] = np.arange(start, ih, step)
                r += n_rows
            frame_idx = np.empty((ih, iw), dtype=np.uint8)
            frame_idx[rows] = idx.reshape(ih, iw)
        else:
            frame_idx = idx.reshape(ih, iw)
        frame = ct[frame_idx]
        if transparent is not None:
            keep = frame_idx == transparent
            region = canvas[iy : iy + ih, ix : ix + iw]
            frame = np.where(keep[..., None], region, frame)
        canvas[iy : iy + ih, ix : ix + iw] = frame
        return canvas  # FIRST frame only (documented scope)

    raise ValueError("gif: truncated stream (no image data)")
