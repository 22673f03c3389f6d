"""Pure-Python PNG codec (stdlib ``zlib`` + numpy) — no imaging libraries.

Decode: non-interlaced AND Adam7-interlaced (r6), bit depth 8 or 16
(high-byte downconversion, r6), color
types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); always
returns uint8 HxWx3 (gray replicated, alpha dropped — the feature stage
consumes opaque RGB).  CRCs are verified on every consumed chunk.  Other
bit depths raise ``NotImplementedError`` naming the feature, the same
honest-failure contract as the JPEG codec's arithmetic/lossless modes.

Encode: color type 2, depth 8, per-row adaptive filtering over the full
filter set (None/Sub/Up/Average/Paeth, minimum-sum-of-absolutes
heuristic) so our own bitstreams exercise every defilter path.

PNG is lossless, so cross-validation against the JVM's javax.imageio is
EXACT equality in both directions (tests/test_png.py) — a stronger
contract than the JPEG codec's PSNR bound.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_dims(w: int, h: int, p: tuple[int, int, int, int]) -> tuple[int, int]:
    x0, y0, dx, dy = p
    pw = (w - x0 + dx - 1) // dx if w > x0 else 0
    ph = (h - y0 + dy - 1) // dy if h > y0 else 0
    return pw, ph


def _chunks(blob: bytes):
    pos = 8
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _defilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-row filtering → (h, stride) uint8 of reconstructed bytes."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else zero
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: cumulative within each byte-lane mod bpp
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def png_decode(blob: bytes) -> np.ndarray:
    if blob[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _chunks(blob):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if depth not in (8, 16):
        raise NotImplementedError(
            f"PNG bit depth {depth} not supported (only 8 and 16)"
        )
    if color not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color}")
    if depth == 16 and color == 3:
        raise ValueError("PNG palette images cannot be 16-bit")
    ch = _CHANNELS[color]
    sw = depth // 8  # sample width in bytes; filters operate on raw BYTES
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 0:
        stride = w * ch * sw
        if raw.size != h * (stride + 1):
            raise ValueError("PNG pixel data size mismatch")
        rec = _defilter(raw, h, stride, ch * sw)
        px = rec.reshape(h, w, ch, sw)[..., 0]  # big-endian high byte
    else:
        # Adam7 (r6): seven passes, each an independently-filtered
        # sub-image scattered onto the final raster; passes whose grid is
        # empty at this image size contribute no scanlines at all
        expected = sum(
            ph * (pw * ch * sw + 1)
            for pw, ph in (_adam7_dims(w, h, p) for p in _ADAM7)
            if pw and ph  # a pass empty in EITHER dimension writes nothing
        )
        if raw.size != expected:
            raise ValueError("PNG pixel data size mismatch (Adam7 layout)")
        px = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw, ph = _adam7_dims(w, h, (x0, y0, dx, dy))
            if pw == 0 or ph == 0:
                continue
            stride_p = pw * ch * sw
            seg = raw[off : off + ph * (stride_p + 1)]
            off += ph * (stride_p + 1)
            rec = _defilter(seg, ph, stride_p, ch * sw)
            px[y0::dy, x0::dx] = rec.reshape(ph, pw, ch, sw)[..., 0]
    if color == 2:
        return px.copy()
    if color == 6:
        return px[..., :3].copy()
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    # color == 3: palette
    if plte is None:
        raise ValueError("paletted PNG missing PLTE")
    idx = px[..., 0]
    if int(idx.max(initial=0)) >= plte.shape[0]:
        raise ValueError("PNG palette index out of range")
    return plte[idx]


def _filter_row(line: np.ndarray, prev: np.ndarray, bpp: int) -> tuple[int, np.ndarray]:
    """Pick the filter minimizing sum(|signed filtered bytes|) — the spec's
    recommended heuristic — and return (ftype, filtered)."""
    li = line.astype(np.int32)
    pi = prev.astype(np.int32)
    left = np.zeros_like(li)
    left[bpp:] = li[:-bpp]
    upleft = np.zeros_like(pi)
    upleft[bpp:] = pi[:-bpp]
    p = left + pi - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - pi), np.abs(p - upleft)
    pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, pi, upleft))
    cands = {
        0: li,
        1: li - left,
        2: li - pi,
        3: li - ((left + pi) >> 1),
        4: li - pred,
    }
    best_t, best_f, best_cost = 0, None, None
    for t, f in cands.items():
        fb = (f & 0xFF).astype(np.uint8)
        cost = int(np.abs(fb.astype(np.int8).astype(np.int32)).sum())
        if best_cost is None or cost < best_cost:
            best_t, best_f, best_cost = t, fb, cost
    return best_t, best_f


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    """uint8 HxWx3 → PNG (color type 2, depth 8, adaptive filtering)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("png_encode expects uint8 HxWx3")
    h, w = img.shape[:2]
    stride = w * 3
    flat = img.reshape(h, stride)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        t, f = _filter_row(flat[y], prev, 3)
        out.append(t)
        out.extend(f.tobytes())
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out), level))
        + chunk(b"IEND", b"")
    )
