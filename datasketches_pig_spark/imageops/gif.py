"""GIF decoder (87a/89a) in pure Python/numpy — no imaging libraries.

Closes another real crawl-corpus format (r6): LZW decompression
(variable-width LSB-first codes, clear/EOI, 12-bit dictionary cap),
global + local color tables, the 4-pass row interlace, and frame
compositing onto the logical canvas.  Since r7 the full animation
decodes: ``gif_decode_frames`` composites every frame honoring the
GIF89a disposal methods (1 draw-over, 2 restore-to-background,
3 restore-to-previous), so animated GIFs ride the video near-dup path
(``videoops/frames.py`` codec tag ``gif_anim``) while the image path
(``gif_decode``) keeps its first-frame contract bit-for-bit.

Honest limits, enforced loudly: corrupt streams raise — truncated
sub-blocks, LZW code overrun, pixel under/overflow, missing image data
and (on the multi-frame path) a missing trailer are all errors, never a
silently-wrong or silently-partial animation (same contract as the
JPEG/PNG codecs).

Cross-validated against the JDK's javax.imageio GIF reader/writer with
EXACT equality (palette lookup is lossless) in ``tests/test_gif.py``,
including JDK-written interlaced and ``writeToSequence`` animated
streams; the disposal-method compositor is pinned by hand-assembled
partial-region streams with hand-computed expected canvases.
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


def _lzw_encode_literals(indices: np.ndarray, min_code: int) -> bytes:
    """Literal-only GIF LZW: every pixel is emitted as its own root code.

    Valid (if uncompressed) LZW — the decoder's dictionary/width state
    machine is mirrored exactly so variable code widths stay in sync.
    Encoder role is test-oracle/corpus synthesis, like ``mjpeg_encode``."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    width = min_code + 1
    emit(clear, width)
    dict_len = clear + 2
    prev = False
    for v in indices:
        emit(int(v), width)
        # decoder appends one dictionary entry per code after the first
        # (post-clear) code, bumping the code width when the dictionary
        # fills the current width — mirror that exactly
        if prev and dict_len < 4096:
            dict_len += 1
            if dict_len == (1 << width) and width < 12:
                width += 1
        prev = True
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _to_sub_blocks(data: bytes) -> bytes:
    chunks = []
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        chunks.append(bytes([len(part)]) + part)
    chunks.append(b"\x00")
    return b"".join(chunks)


def gif_encode(
    w: int,
    h: int,
    palette: np.ndarray,
    frames: list[dict],
    bg_idx: int = 0,
) -> bytes:
    """Assemble a GIF89a stream (animated when ``len(frames) > 1``).

    ``palette``: (n≤256, 3) uint8 global color table. Each frame dict:
    ``idx`` (2-D uint8 palette indices, required) plus optional ``x``/``y``
    region offset, ``disposal`` (0-3), ``transparent`` index and
    ``interlace``. Deterministic, pure-Python — the corpus/second-
    implementation side of the codec's roundtrip tests."""
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= len(palette) <= 256:
        raise ValueError("gif_encode: palette must be (1..256, 3) uint8")
    size_bits = max(1, (len(palette) - 1).bit_length())
    n_gct = 1 << size_bits
    gct = np.zeros((n_gct, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), bg_idx, 0)
    out += gct.tobytes()
    min_code = max(2, size_bits)
    for fr in frames:
        idx = np.asarray(fr["idx"], dtype=np.uint8)
        ih, iw = idx.shape
        x = int(fr.get("x", 0))
        y = int(fr.get("y", 0))
        disposal = int(fr.get("disposal", 0))
        transparent = fr.get("transparent")
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("gif_encode: index out of palette range")
        # graphic control extension (per-frame disposal + transparency)
        packed = (disposal & 0x07) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, packed, 0, 0, transparent or 0, 0])
        iflags = 0
        if fr.get("interlace"):
            iflags |= 0x40
            rows = np.concatenate(
                [np.arange(start, ih, step) for start, step in _INTERLACE]
            )
            emit_idx = idx[rows]
        else:
            emit_idx = idx
        out += b"\x2C" + struct.pack("<HHHHB", x, y, iw, ih, iflags)
        out += bytes([min_code])
        out += _to_sub_blocks(_lzw_encode_literals(emit_idx.ravel(), min_code))
    out += b"\x3B"
    return bytes(out)


def gif_decode_frames(blob: bytes, max_frames: int | None = None) -> np.ndarray:
    """GIF87a/89a → uint8 (n_frames, H, W, 3) RGB canvases, each frame
    composited per its GIF89a disposal method.

    Disposal semantics (the canvas is opaque RGB, so "transparent" resolves
    to whatever the canvas holds at that pixel):

    * 0/1 (unspecified / keep): the drawn canvas persists into the next
      frame's composition.
    * 2 (restore to background): after the frame is emitted, its region
      resets to the logical-screen background color.
    * 3 (restore to previous): after the frame is emitted, the whole canvas
      reverts to its pre-draw state.

    ``max_frames`` stops parsing as soon as that many frames have been
    composited (the image path's first-frame decode never walks a long
    animation); without it the stream must terminate in a trailer — a
    stream that ends mid-animation raises rather than returning a
    silently-partial clip.
    """
    if max_frames is not None and max_frames < 1:
        raise ValueError("gif: max_frames must be >= 1")
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

    if gct is not None and bg_idx < gct.shape[0]:
        background = gct[bg_idx].copy()
    else:
        background = np.zeros(3, dtype=np.uint8)
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    canvas[:] = background
    transparent = None
    disposal = 0
    frames: list[np.ndarray] = []

    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            if not frames:
                raise ValueError("gif: no image frame before trailer")
            return np.stack(frames)
        if b0 == 0x21:  # extension
            if pos >= len(blob):
                raise ValueError("gif: truncated extension")
            label = blob[pos]
            pos += 1
            data, pos = _sub_blocks(blob, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                disposal = (data[0] >> 2) & 0x07
                if disposal > 3:
                    raise ValueError(
                        f"gif: reserved disposal method {disposal}"
                    )
                transparent = data[3] if data[0] & 0x01 else None
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
        saved = canvas.copy() if disposal == 3 else None
        if transparent is not None:
            keep = frame_idx == transparent
            region = canvas[iy : iy + ih, ix : ix + iw]
            frame = np.where(keep[..., None], region, frame)
        canvas[iy : iy + ih, ix : ix + iw] = frame
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return np.stack(frames)
        if disposal == 2:
            canvas[iy : iy + ih, ix : ix + iw] = background
        elif disposal == 3:
            canvas = saved
        transparent = None
        disposal = 0

    if not frames:
        raise ValueError("gif: truncated stream (no image data)")
    raise ValueError(
        f"gif: truncated animation ({len(frames)} frames, no trailer)"
    )


def gif_decode(blob: bytes) -> np.ndarray:
    """GIF87a/89a → uint8 H×W×3 RGB of the FIRST frame composited on the
    logical-screen canvas (bit-identical to the r6 single-frame decoder;
    parsing stops at the first frame)."""
    return gif_decode_frames(blob, max_frames=1)[0]
