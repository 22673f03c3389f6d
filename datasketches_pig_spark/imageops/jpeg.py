"""Baseline JPEG (ITU-T T.81) codec in pure numpy — no imaging libraries.

Closes the r4 verdict's top multimodal gap: a real multimodal training
corpus is overwhelmingly COMPRESSED formats, and until now every jpeg/png/
webp payload hit the documented ``NotImplementedError`` stub, so the
perceptual near-dup family only ran on raw-payload corpora.  Baseline JPEG
is the dominant compressed format in practice and tractable without
external libraries (canonical Huffman + 8×8 DCT); PNG (``imageops/png.py``)
closes the lossless side the same way.

Scope (honest limits, enforced loudly):
* decode — baseline sequential DCT (SOF0/SOF1) AND progressive DCT (SOF2,
  r6: spectral selection, successive approximation, EOB runs, per-scan
  Huffman redefinition — cross-validated against javax.imageio's decode of
  JDK-encoded progressive streams), 8-bit, grayscale or YCbCr with any
  sampling factors ≤ 2 (4:4:4 / 4:2:2 / 4:2:0), restart markers, 0xFF00
  byte stuffing.  Arithmetic coding, lossless, and hierarchical modes
  raise ``NotImplementedError`` with the marker named.
* encode — quality-scaled Annex-K quantization tables, Annex-K Huffman
  tables, 4:4:4 or 4:2:0, deterministic output (the test-corpus generator).

Heavy math is vectorized: the (I)DCT runs as one einsum over ALL blocks of
a component, dequantize/zigzag are fancy-indexed array ops.  Only the
entropy coder walks symbols in Python — bounded by the number of nonzero
coefficients, a few thousand per test image.
"""

from __future__ import annotations

import numpy as np

# --- zigzag order (row-major index of each zigzag position) ---------------
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# --- Annex K tables (public ITU-T T.81 spec) ------------------------------
STD_LUM_QT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
STD_CHR_QT = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# (bits[1..16], values) — Annex K
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# --- DCT basis: C[u, x] = c(u)/2 * cos((2x+1)uπ/16) -----------------------
_C = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) spatial samples."""
    return np.einsum("ux,nuv,vy->nxy", _C, coef, _C, optimize=True)


def fdct_blocks(samples: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples → (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _C, samples, _C, optimize=True)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

class _HuffDecode:
    """Canonical Huffman decoder state (F.16-style mincode/maxcode/valptr)."""

    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits: list[int], values: list[int]):
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1


def _huff_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from the canonical (bits, values) spec."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over an UNSTUFFED entropy byte array."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: np.ndarray):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = (int(self.data[self.pos]) >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, size: int) -> int:
    return v - ((1 << size) - 1) if size and v < (1 << (size - 1)) else v


def _decode_symbol(r: _BitReader, t: _HuffDecode) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        if code <= t.maxcode[length]:
            return t.values[t.valptr[length] + code - t.mincode[length]]
    raise ValueError("jpeg: invalid Huffman code in entropy stream")


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def jpeg_decode(blob: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 H×W×3 RGB (grayscale replicated)."""
    data = np.frombuffer(blob, dtype=np.uint8)
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("jpeg: missing SOI marker")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], _HuffDecode] = {}
    frame = None
    restart_interval = 0
    saw_eoi = False

    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at byte {pos}")
        marker = int(data[pos + 1])
        pos += 2
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        if pos + 1 >= len(data):
            raise ValueError("jpeg: truncated marker segment header")
        seglen = (int(data[pos]) << 8) | int(data[pos + 1])
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != max(seglen - 2, 0):
            raise ValueError("jpeg: truncated marker segment (payload cut short)")
        pos += seglen

        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = int(seg[o]) >> 4, int(seg[o]) & 0xF
                o += 1
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                qts[tq] = seg[o : o + 64].astype(np.int64)
                o += 64
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = int(seg[o]) >> 4, int(seg[o]) & 0xF
                o += 1
                bits = [int(x) for x in seg[o : o + 16]]
                o += 16
                n = sum(bits)
                vals = [int(x) for x in seg[o : o + n]]
                o += n
                huffs[(tc, th)] = _HuffDecode(bits, vals)
        elif marker == 0xDD:  # DRI
            restart_interval = (int(seg[0]) << 8) | int(seg[1])
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = int(seg[0])
            if prec != 8:
                raise NotImplementedError(f"jpeg: {prec}-bit precision")
            h = (int(seg[1]) << 8) | int(seg[2])
            w = (int(seg[3]) << 8) | int(seg[4])
            ncomp = int(seg[5])
            comps = []
            for i in range(ncomp):
                cid = int(seg[6 + 3 * i])
                hv = int(seg[7 + 3 * i])
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": int(seg[8 + 3 * i])}
                )
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
            if frame["progressive"]:
                prog_scans: list[tuple] = []
            else:
                seq_scans: list[tuple] = []
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF marker 0xFF{marker:02X} (arithmetic/lossless/"
                "hierarchical) — only baseline and progressive DCT are "
                "implemented"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = int(seg[0])
            if frame["progressive"]:
                scomps = []
                for i in range(ns):
                    cs = int(seg[1 + 2 * i])
                    td_ta = int(seg[2 + 2 * i])
                    comp = next(c for c in frame["comps"] if c["id"] == cs)
                    # resolve the table OBJECTS now: progressive files
                    # legally redefine DHT between scans
                    scomps.append(
                        (comp, huffs.get((0, td_ta >> 4)), huffs.get((1, td_ta & 0xF)))
                    )
                ss = int(seg[1 + 2 * ns])
                se = int(seg[2 + 2 * ns])
                ah_al = int(seg[3 + 2 * ns])
                readers, check, pos = _entropy_segments(data, pos)
                prog_scans.append(
                    (scomps, ss, se, ah_al >> 4, ah_al & 0xF, readers, check,
                     restart_interval)
                )
                continue
            if ns != len(frame["comps"]) or seq_scans:
                # multi-scan baseline (T.81 §B.2.3): components split across
                # several SOS (typically Y, Cb, Cr each non-interleaved) —
                # accumulate scans progressive-style and decode after EOI
                scomps = []
                for i in range(ns):
                    cs = int(seg[1 + 2 * i])
                    td_ta = int(seg[2 + 2 * i])
                    comp = next(c for c in frame["comps"] if c["id"] == cs)
                    # table OBJECTS now: files legally redefine DHT per scan
                    scomps.append(
                        (comp, huffs.get((0, td_ta >> 4)), huffs.get((1, td_ta & 0xF)))
                    )
                ss = int(seg[1 + 2 * ns])
                se = int(seg[2 + 2 * ns])
                ah_al = int(seg[3 + 2 * ns])
                readers, check, pos = _entropy_segments(data, pos)
                seq_scans.append(
                    (scomps, ss, se, ah_al >> 4, ah_al & 0xF, readers, check,
                     restart_interval)
                )
                continue
            scan = []
            for i in range(ns):
                cs = int(seg[1 + 2 * i])
                td_ta = int(seg[2 + 2 * i])
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, td_ta >> 4, td_ta & 0xF))
            return _decode_scan(
                data, pos, frame, scan, qts, huffs, restart_interval
            )
        # else: APPn/COM — skipped

    if frame is not None and frame.get("progressive") and prog_scans:
        if not saw_eoi:
            # a progressive prefix is decodable by design, but a missing EOI
            # means the payload is truncated — honest-failure contract
            raise ValueError(
                "jpeg: progressive stream ended without EOI (truncated payload)"
            )
        return _decode_progressive(frame, prog_scans, qts)
    if frame is not None and not frame.get("progressive") and seq_scans:
        if not saw_eoi:
            raise ValueError(
                "jpeg: baseline stream ended without EOI (truncated payload)"
            )
        seen = sorted(
            c["id"] for (scomps, *_rest) in seq_scans for (c, _, _) in scomps
        )
        want = sorted(c["id"] for c in frame["comps"])
        if seen != want:
            # a missing component would assemble from zero coefficients (a
            # flat gray plane); a duplicate would double-decode — both are
            # corrupt streams, not decodable variants
            raise ValueError(
                f"jpeg: multi-scan baseline covers components {seen} but the "
                f"frame declares {want}"
            )
        return _decode_sequential_multi(frame, seq_scans, qts)
    raise ValueError("jpeg: no SOS marker found")


def _entropy_segments(data, pos):
    """Collect the entropy-coded bytes starting at ``pos`` up to the next
    non-RST marker, unstuffing FF00 and splitting at RSTn.  Returns
    ``(readers, check_exhausted, next_pos)`` where ``next_pos`` is the byte
    offset of the terminating marker's 0xFF (or ``len(data)``).

    Each segment is padded so the reader never runs off the end mid-byte;
    the TRUE length is kept so consuming any fabricated pad bit is detected
    — otherwise a truncated entropy stream can decode the missing MCUs from
    zeros into silently-wrong pixels instead of failing."""
    end = len(data)
    i = pos
    segments: list[np.ndarray] = []
    cur_start = i
    out_chunks: list[np.ndarray] = []
    while i < end - 1:
        if data[i] == 0xFF:
            nxt = int(data[i + 1])
            if nxt == 0x00:
                out_chunks.append(data[cur_start : i + 1])  # keep FF, drop 00
                i += 2
                cur_start = i
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker: segment boundary
                out_chunks.append(data[cur_start:i])
                segments.append(
                    np.concatenate(out_chunks) if out_chunks else np.empty(0, np.uint8)
                )
                out_chunks = []
                i += 2
                cur_start = i
                continue
            # any other marker ends the scan
            out_chunks.append(data[cur_start:i])
            break
        i += 1
    else:
        out_chunks.append(data[cur_start:end])
        i = end
    segments.append(
        np.concatenate(out_chunks) if out_chunks else np.empty(0, np.uint8)
    )

    true_lens = [len(s) for s in segments]
    readers = [
        _BitReader(np.concatenate([s, np.zeros(8, dtype=np.uint8)])) for s in segments
    ]

    def check_exhausted(rd: _BitReader, idx: int) -> None:
        tl = true_lens[idx]
        if rd.pos > tl or (rd.pos == tl and rd.bit > 0):
            raise ValueError(
                "jpeg: entropy stream exhausted before all MCUs decoded "
                "(truncated payload)"
            )

    return readers, check_exhausted, i


def _decode_scan(data, pos, frame, scan, qts, huffs, restart_interval):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    # per scan component: coefficient array (blocks_y, blocks_x, 8, 8)
    for comp, td, ta in scan:
        bx = mcux * comp["h"]
        by = mcuy * comp["v"]
        comp["coef"] = np.zeros((by, bx, 64), dtype=np.int64)
        comp["pred"] = 0
        comp["td"], comp["ta"] = td, ta

    readers, _check_exhausted, _ = _entropy_segments(data, pos)

    seg_idx = 0
    r = readers[0]
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            _check_exhausted(r, seg_idx)
            seg_idx += 1
            r = readers[seg_idx]
            for comp, _, _ in scan:
                comp["pred"] = 0
        my, mx = divmod(m, mcux)
        for comp, td, ta in scan:
            dct = huffs[(0, td)]
            act = huffs[(1, ta)]
            for v in range(comp["v"]):
                for hh in range(comp["h"]):
                    blk = comp["coef"][my * comp["v"] + v, mx * comp["h"] + hh]
                    _seq_unit(blk, comp, r, dct, act)
    _check_exhausted(r, seg_idx)

    return _assemble(frame, [comp for comp, _, _ in scan], qts)


def _seq_unit(blk, comp, r, dct, act):
    """One sequential-DCT block: DC diff + full-band AC run-length loop
    (T.81 §F.2.2).  Shared by the single-scan fast path and the multi-scan
    baseline walk — sequential EOB means 'rest of THIS block is zero' (no
    progressive EOB runs), so this is deliberately not ``_ac_unit_first``."""
    t = _decode_symbol(r, dct)
    diff = _extend(r.receive(t), t) if t else 0
    comp["pred"] += diff
    blk[0] = comp["pred"]
    k = 1
    while k < 64:
        rs = _decode_symbol(r, act)
        rr, ss = rs >> 4, rs & 0xF
        if ss == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            if rr:
                # EOBn is a progressive-only symbol; decoding it as a bare
                # EOB here would silently desync every following block
                raise ValueError(
                    "jpeg: progressive EOB-run symbol in a sequential scan"
                )
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("jpeg: AC run past block end")
        blk[k] = _extend(r.receive(ss), ss)
        k += 1


def _decode_sequential_multi(frame, scans, qts):
    """Multi-scan BASELINE/extended-sequential decode (T.81 §B.2.3 allows a
    frame's components to arrive split across several SOS — e.g. Y, then Cb,
    then Cr, each non-interleaved).  Reuses the progressive machinery's
    per-scan table snapshots / entropy segmentation / ceil-dims rasters; the
    per-block coding is plain sequential (``_seq_unit``).  Single-component
    scans walk the component's own (non-MCU-padded) block raster; a
    several-of-N interleaved scan walks frame-MCU geometry over just its
    components, per A.2.3."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for comp in frame["comps"]:
        comp["coef"] = np.zeros((mcuy * comp["v"], mcux * comp["h"], 64), np.int64)
        cw = -(-(w * comp["h"]) // hmax)
        ch = -(-(h * comp["v"]) // vmax)
        comp["nbx"], comp["nby"] = -(-cw // 8), -(-ch // 8)

    for scomps, ss, se, ah, al, readers, check, ri in scans:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError(
                f"jpeg: sequential scan with progressive parameters "
                f"Ss={ss} Se={se} Ah={ah} Al={al}"
            )
        for comp, dct, act in scomps:
            if dct is None or act is None:
                raise ValueError(
                    "jpeg: sequential scan references an undefined Huffman "
                    "table"
                )
            comp["pred"] = 0
        interleaved = len(scomps) > 1
        if interleaved:
            n_units = mcux * mcuy
        else:
            comp0 = scomps[0][0]
            n_units = comp0["nbx"] * comp0["nby"]
        seg_idx = 0
        r = readers[0]
        for m in range(n_units):
            if ri and m and m % ri == 0:
                check(r, seg_idx)
                seg_idx += 1
                if seg_idx >= len(readers):
                    raise ValueError(
                        "jpeg: missing restart marker (truncated scan)"
                    )
                r = readers[seg_idx]
                for comp, _, _ in scomps:
                    comp["pred"] = 0
            if interleaved:
                my, mx = divmod(m, mcux)
                for comp, dct, act in scomps:
                    for v in range(comp["v"]):
                        for hh in range(comp["h"]):
                            blk = comp["coef"][
                                my * comp["v"] + v, mx * comp["h"] + hh
                            ]
                            _seq_unit(blk, comp, r, dct, act)
            else:
                comp, dct, act = scomps[0]
                by_, bx_ = divmod(m, comp["nbx"])
                _seq_unit(comp["coef"][by_, bx_], comp, r, dct, act)
        check(r, seg_idx)
    return _assemble(frame, frame["comps"], qts)


def _decode_progressive(frame, scans, qts):
    """Progressive DCT (SOF2, T.81 §G): every scan deposits one spectral/
    approximation slice of the zigzag coefficients; the IDCT runs once at
    the end over the accumulated arrays.  DC scans may be interleaved; AC
    scans cover exactly one component in its own (non-MCU-padded) block
    raster.  EOB runs and successive-approximation correction bits follow
    G.1.2; restart markers reset DC predictors and the EOB run."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for comp in frame["comps"]:
        comp["coef"] = np.zeros((mcuy * comp["v"], mcux * comp["h"], 64), np.int64)
        # non-interleaved block raster (ceil of the comp's sampled dims)
        cw = -(-(w * comp["h"]) // hmax)
        ch = -(-(h * comp["v"]) // vmax)
        comp["nbx"], comp["nby"] = -(-cw // 8), -(-ch // 8)

    for scomps, ss, se, ah, al, readers, check, ri in scans:
        _decode_prog_scan(
            frame, scomps, ss, se, ah, al, readers, check, ri, mcux, mcuy
        )
    return _assemble(frame, frame["comps"], qts)


def _decode_prog_scan(frame, scomps, ss, se, ah, al, readers, check, ri, mcux, mcuy):
    if ss == 0 and se != 0:
        raise ValueError("jpeg: progressive scan mixes DC and AC (Ss=0, Se>0)")
    if ss > se or se > 63:
        raise ValueError(f"jpeg: invalid spectral selection {ss}..{se}")
    interleaved = len(scomps) > 1
    if ss > 0 and interleaved:
        raise ValueError("jpeg: interleaved progressive AC scan is not legal")
    for comp, dct, act in scomps:
        if ss == 0 and ah == 0 and dct is None:
            raise ValueError("jpeg: DC scan references an undefined DC table")
        if ss > 0 and act is None:
            raise ValueError("jpeg: AC scan references an undefined AC table")
        comp["pred"] = 0

    if interleaved:
        n_units = mcux * mcuy
    else:
        comp0 = scomps[0][0]
        nbx, nby = comp0["nbx"], comp0["nby"]
        n_units = nbx * nby

    seg_idx = 0
    r = readers[0]
    eobrun = 0
    for m in range(n_units):
        if ri and m and m % ri == 0:
            check(r, seg_idx)
            seg_idx += 1
            if seg_idx >= len(readers):
                raise ValueError("jpeg: missing restart marker (truncated scan)")
            r = readers[seg_idx]
            eobrun = 0
            for comp, _, _ in scomps:
                comp["pred"] = 0
        if ss == 0:  # DC scan
            if interleaved:
                my, mx = divmod(m, mcux)
                for comp, dct, _ in scomps:
                    for v in range(comp["v"]):
                        for hh in range(comp["h"]):
                            blk = comp["coef"][my * comp["v"] + v, mx * comp["h"] + hh]
                            _dc_unit(blk, comp, r, dct, ah, al)
            else:
                comp, dct, _ = scomps[0]
                by_, bx_ = divmod(m, nbx)
                _dc_unit(comp["coef"][by_, bx_], comp, r, dct, ah, al)
        else:  # AC scan, single component
            comp, _, act = scomps[0]
            by_, bx_ = divmod(m, nbx)
            blk = comp["coef"][by_, bx_]
            if ah == 0:
                eobrun = _ac_unit_first(blk, r, act, ss, se, al, eobrun)
            else:
                eobrun = _ac_unit_refine(blk, r, act, ss, se, al, eobrun)
    check(r, seg_idx)


def _dc_unit(blk, comp, r, dct, ah, al):
    if ah == 0:
        t = _decode_symbol(r, dct)
        diff = _extend(r.receive(t), t) if t else 0
        comp["pred"] += diff
        blk[0] = comp["pred"] << al
    elif r.read_bit():
        blk[0] |= 1 << al  # two's-complement OR == append one magnitude bit


def _ac_unit_first(blk, r, act, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(r, act)
        rr, s = rs >> 4, rs & 0xF
        if s == 0:
            if rr == 15:
                k += 16  # ZRL
                # a ZRL that runs past the spectral band is a corrupt
                # stream; without this check the loop exits silently and
                # the block decodes wrong instead of failing loudly
                if k > se + 1:
                    raise ValueError("jpeg: AC run past block end")
                continue
            eobrun = (1 << rr) - 1
            if rr:
                eobrun += r.receive(rr)
            return eobrun
        k += rr
        if k > se:
            raise ValueError("jpeg: AC coefficient index past Se")
        blk[k] = _extend(r.receive(s), s) << al
        k += 1
    return 0


def _ac_unit_refine(blk, r, act, ss, se, al, eobrun):
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        cur = int(blk[k])
        if cur and r.read_bit() and not (cur & p1):
            blk[k] = cur + (p1 if cur > 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(r, act)
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr < 15:
                    eobrun = 1 << rr
                    if rr:
                        eobrun += r.receive(rr)
                    break  # EOB: this block's tail is refined below
                val = 0  # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: AC refinement magnitude != 1")
                val = p1 if r.read_bit() else m1
            # advance over rr zero-history coefficients, emitting correction
            # bits for every nonzero coefficient passed on the way
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # refine the remaining nonzero history of this block
            correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _assemble(frame, comps, qts):
    """Per-component zigzag coefficient arrays → uint8 H×W×3 RGB: dequantize
    + dezigzag + IDCT (vectorized over all blocks), upsample, color
    convert.  Shared by the baseline and progressive paths."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    w, h = frame["w"], frame["h"]
    planes = []
    for comp in comps:
        qt = qts[comp["tq"]]
        by, bx = comp["coef"].shape[:2]
        zz = comp["coef"].reshape(-1, 64) * qt[None, :]
        blocks = np.zeros((zz.shape[0], 64))
        blocks[:, ZIGZAG] = zz
        spatial = idct_blocks(blocks.reshape(-1, 8, 8)) + 128.0
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full resolution by sample repetition
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    return np.clip(np.stack([r_, g_, b_], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("bytes", "acc", "nbits")

    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.bytes.append(b)
            if b == 0xFF:
                self.bytes.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int64)


def _category(v: np.ndarray) -> np.ndarray:
    """Bit-size category of each value (0 for 0)."""
    return np.where(v == 0, 0, np.int64(np.ceil(np.log2(np.abs(v) + 1)))).astype(
        np.int64
    )


def _encode_component_blocks(
    zz: np.ndarray, wr: _BitWriter, dc_tab, ac_tab, pred: int, cats=None
) -> int:
    """zz: (n_blocks, 64) quantized zigzag coefficients; returns new DC pred.

    ``cats``: precomputed ``_category(zz)`` — the interleaved encoder calls
    this once per BLOCK, so computing categories per call cost a fresh numpy
    pass per 1×64 slice (a third of encode time profiled); the DC-diff size
    is ``|diff|.bit_length()``, identical to the category formula for ints."""
    if cats is None:
        cats = _category(zz)
    for bi in range(zz.shape[0]):
        row = zz[bi]
        diff = int(row[0]) - pred
        pred = int(row[0])
        size = (diff if diff >= 0 else -diff).bit_length()
        code, length = dc_tab[size]
        wr.write(code, length)
        if size:
            wr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        nz = np.flatnonzero(row[1:]) + 1
        k = 1
        for pos in nz:
            run = int(pos) - k
            while run >= 16:
                code, length = ac_tab[0xF0]
                wr.write(code, length)
                run -= 16
            size = int(cats[bi, pos])
            code, length = ac_tab[(run << 4) | size]
            wr.write(code, length)
            v = int(row[pos])
            wr.write(v if v >= 0 else v + (1 << size) - 1, size)
            k = int(pos) + 1
        if k < 64:
            code, length = ac_tab[0x00]  # EOB
            wr.write(code, length)
    return pred


def _plane_to_blocks(plane: np.ndarray) -> np.ndarray:
    """H×W float plane (already level-shifted) → (n, 8, 8) blocks, edge-padded."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ), ph // 8, pw // 8


def jpeg_encode(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = True,
    multiscan: bool = False,
) -> bytes:
    """uint8 H×W×3 RGB → baseline JFIF bytes (4:2:0 when ``subsample``).

    ``multiscan`` emits the same quantized coefficients as THREE
    non-interleaved SOS (Y, then Cb, then Cr — T.81 §B.2.3) instead of one
    interleaved scan: the test oracle for the multi-scan decode path, since
    decode(multiscan) must be bit-identical to decode(single-scan) of the
    same image."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("jpeg_encode expects uint8 HxWx3")
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
    cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
    if subsample:
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        sampling = ((2, 2), (1, 1), (1, 1))
    else:
        sampling = ((1, 1), (1, 1), (1, 1))

    lum_qt = _quality_scale(STD_LUM_QT, quality)
    chr_qt = _quality_scale(STD_CHR_QT, quality)

    # MCU-aligned padding so every component's block grid matches the
    # interleaved MCU walk exactly
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantization divides coefficient (u,v) by the table entry at (u,v);
    # the Annex-K literals above are ROW-MAJOR (as printed in Table K.1/K.2),
    # so they divide directly; the DQT segments below gather them into
    # zigzag scan order as the marker format requires
    comp_zz = []
    qt_rm = {0: lum_qt, 1: chr_qt}
    for plane, (sh, sv), tq in ((y, sampling[0], 0), (cb, sampling[1], 1), (cr, sampling[2], 1)):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        p = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        blocks, by, bx = _plane_to_blocks(p - 128.0)
        coef = fdct_blocks(blocks).reshape(-1, 64)
        q = np.round(coef / qt_rm[tq][None, :]).astype(np.int64)
        comp_zz.append((q[:, ZIGZAG], by, bx, sh, sv))

    # ---- emit segments ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tq: int, zzqt: np.ndarray) -> bytes:
        return b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tq]) + bytes(zzqt.tolist())

    out += dqt(0, lum_qt[ZIGZAG])
    out += dqt(1, chr_qt[ZIGZAG])

    # SOF0
    sof = bytearray()
    sof += (8).to_bytes(1, "big")
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + bytes(sof)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body

    out += dht(0, 0, DC_LUM) + dht(1, 0, AC_LUM) + dht(0, 1, DC_CHR) + dht(1, 1, AC_CHR)

    dc_tabs = (
        _huff_encode_table(*DC_LUM),
        _huff_encode_table(*DC_CHR),
        _huff_encode_table(*DC_CHR),
    )
    ac_tabs = (
        _huff_encode_table(*AC_LUM),
        _huff_encode_table(*AC_CHR),
        _huff_encode_table(*AC_CHR),
    )

    if multiscan:
        # one non-interleaved SOS per component: each walks the component's
        # OWN ceil-dims block raster (nbx×nby), not the MCU-padded grid —
        # the padded-grid extras cover only cropped pixels and are legally
        # absent from the stream
        for ci, (zz, by, bx, sh, sv) in enumerate(comp_zz):
            cw = -(-(w * sh) // hmax)
            ch = -(-(h * sv) // vmax)
            nbx, nby = -(-cw // 8), -(-ch // 8)
            sos = bytes([1, ci + 1, 0x00 if ci == 0 else 0x11]) + b"\x00\x3f\x00"
            out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
            wr = _BitWriter()
            raster = zz.reshape(by, bx, 64)[:nby, :nbx].reshape(-1, 64)
            _encode_component_blocks(raster, wr, dc_tabs[ci], ac_tabs[ci], 0)
            wr.flush()
            out += wr.bytes
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # SOS
    sos = bytearray([3])
    for i in range(3):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + bytes(sos)

    # interleaved MCU entropy data (categories precomputed once per
    # component — see _encode_component_blocks)
    wr = _BitWriter()
    preds = [0, 0, 0]
    comp_cats = [_category(zz) for (zz, *_rest) in comp_zz]
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (zz, by, bx, sh, sv) in enumerate(comp_zz):
            for v in range(sv):
                for hh in range(sh):
                    bi = (my * sv + v) * bx + (mx * sh + hh)
                    preds[ci] = _encode_component_blocks(
                        zz[bi : bi + 1],
                        wr,
                        dc_tabs[ci],
                        ac_tabs[ci],
                        preds[ci],
                        cats=comp_cats[ci][bi : bi + 1],
                    )
    wr.flush()
    out += wr.bytes
    out += b"\xff\xd9"  # EOI
    return bytes(out)
