"""IMA ADPCM (WAV format tag 0x11) — the engine's first *compressed* audio
codec, pure numpy, vectorized across blocks.

Why this codec: a real 100 TB audio corpus is mostly compressed formats, and
IMA/DVI ADPCM is the one mainstream compressed format whose decode is pure
deterministic integer math — no entropy coder, no transform — so it is both
implementable in this container and **bit-exact testable** against an
independent scalar reference (`tests/test_adpcm.py`), the same cross-check
discipline the JPEG/PNG codecs use.

Scale design: the format is block-independent by construction — every block
header carries its own (predictor, step index) — so both encode and decode
vectorize across the block axis: the per-sample recurrence is a Python loop
of ``samples_per_block`` iterations whose body is numpy over *all blocks at
once*.  Cost per clip is O(samples) with vector width ``n_blocks``; inside
the engine the per-clip loop already sits in an Arrow-batched ``mapInPandas``
stage (`audioops/features.py`), so nothing row-at-a-time crosses the
executor boundary.

Format notes (public IMA/DVI spec, as written by sox/ffmpeg for mono):
  - fmt chunk: tag 0x11, bits_per_sample 4, cbSize 2, wSamplesPerBlock
  - fact chunk: true sample count (the final block is zero-nibble-padded)
  - each block: ``int16 predictor | uint8 step_index | uint8 0`` then
    ``(block_align - 4)`` nibble bytes; the header predictor IS sample 0,
    so ``samples_per_block = (block_align - 4) * 2 + 1``; nibble order is
    low-then-high within each byte.

Reference parity: the Pig reference has no media operators (media coverage
is a builder-brief item, not reference parity); the container/dispatch
contract matches `audioops/codecs.py` (`decode_clip`).
"""

from __future__ import annotations

import struct

import numpy as np

# Public IMA ADPCM tables (step sizes + 3-bit index adjustments).
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

DEFAULT_BLOCK_ALIGN = 256  # -> 505 samples per block, the common mono choice


def _reconstruct(code: np.ndarray, step: np.ndarray) -> np.ndarray:
    """Quantized difference magnitude for a 3-bit code at a given step —
    the exact integer form shared by encoder and decoder:
    ``step>>3 + (code&4 ? step : 0) + (code&2 ? step>>1 : 0)
    + (code&1 ? step>>2 : 0)``."""
    diff = step >> 3
    diff = diff + np.where(code & 4, step, 0)
    diff = diff + np.where(code & 2, step >> 1, 0)
    diff = diff + np.where(code & 1, step >> 2, 0)
    return diff


def _encode_blocks(x: np.ndarray) -> np.ndarray:
    """(n_blocks, samples_per_block) int32 PCM16 → (n_blocks, block_align)
    uint8 block bytes.  The sample recurrence runs as a Python loop whose
    body is vectorized over the block axis."""
    n_blocks, spb = x.shape
    n_nibbles = spb - 1
    pred = x[:, 0].astype(np.int32)
    # Per-block initial step index: smallest step >= |first delta| — any
    # header index is decodable, this one just starts the ladder near the
    # signal's local slope instead of always at 7.
    first_diff = np.abs(x[:, 1] - pred) if spb > 1 else np.zeros(n_blocks, np.int32)
    index = np.searchsorted(STEP_TABLE, first_diff).astype(np.int32)
    index = np.clip(index, 0, 88)

    blocks = np.zeros((n_blocks, 4 + (n_nibbles + 1) // 2), dtype=np.uint8)
    blocks[:, 0] = pred & 0xFF
    blocks[:, 1] = (pred >> 8) & 0xFF
    blocks[:, 2] = index.astype(np.uint8)

    nibbles = np.zeros((n_blocks, n_nibbles), dtype=np.uint8)
    for t in range(1, spb):
        step = STEP_TABLE[index]
        delta = x[:, t] - pred
        sign = delta < 0
        mag = np.abs(delta)

        code = np.zeros(n_blocks, dtype=np.int32)
        ge = mag >= step
        code |= ge.astype(np.int32) << 2
        mag = mag - np.where(ge, step, 0)
        half = step >> 1
        ge = mag >= half
        code |= ge.astype(np.int32) << 1
        mag = mag - np.where(ge, half, 0)
        quarter = step >> 2
        code |= (mag >= quarter).astype(np.int32)

        diff = _reconstruct(code, step)
        pred = np.clip(pred + np.where(sign, -diff, diff), -32768, 32767)
        index = np.clip(index + INDEX_TABLE[code], 0, 88)
        nibbles[:, t - 1] = (code | (sign.astype(np.int32) << 3)).astype(np.uint8)

    # pack: nibble i -> byte i//2, low half first
    if n_nibbles:
        padded = np.zeros((n_blocks, (n_nibbles + 1) // 2 * 2), dtype=np.uint8)
        padded[:, :n_nibbles] = nibbles
        blocks[:, 4:] = padded[:, 0::2] | (padded[:, 1::2] << 4)
    return blocks


def _decode_blocks(blocks: np.ndarray, spb: int) -> np.ndarray:
    """(n_blocks, block_align) uint8 → (n_blocks, spb) int32 PCM16.
    Exact integer math; bit-for-bit the IMA reference recurrence."""
    n_blocks = blocks.shape[0]
    pred = (
        blocks[:, 0].astype(np.int32) | (blocks[:, 1].astype(np.int32) << 8)
    )
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)  # sign-extend
    index = np.clip(blocks[:, 2].astype(np.int32), 0, 88)

    body = blocks[:, 4:]
    nibbles = np.empty((n_blocks, body.shape[1] * 2), dtype=np.uint8)
    nibbles[:, 0::2] = body & 0x0F
    nibbles[:, 1::2] = body >> 4

    out = np.empty((n_blocks, spb), dtype=np.int32)
    out[:, 0] = pred
    for t in range(1, spb):
        nib = nibbles[:, t - 1].astype(np.int32)
        step = STEP_TABLE[index]
        diff = _reconstruct(nib & 7, step)
        pred = np.clip(pred + np.where(nib & 8, -diff, diff), -32768, 32767)
        index = np.clip(index + INDEX_TABLE[nib & 7], 0, 88)
        out[:, t] = pred
    return out


def adpcm_encode(
    pcm: np.ndarray, sr_hz: int, block_align: int = DEFAULT_BLOCK_ALIGN
) -> bytes:
    """float32 mono [-1, 1] → RIFF/WAVE IMA-ADPCM (format 0x11) bytes.

    ~4:1 vs PCM16.  The final partial block is padded by repeating the last
    sample (keeps the predictor ladder settled); the fact chunk records the
    true sample count so decode trims exactly."""
    if block_align < 8 or block_align % 4:
        raise ValueError(f"block_align must be a multiple of 4, >= 8: {block_align}")
    x16 = np.round(np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0) * 32767.0)
    x16 = x16.astype(np.int32)
    n = len(x16)
    spb = (block_align - 4) * 2 + 1
    n_blocks = max((n + spb - 1) // spb, 1)
    pad_val = x16[-1] if n else 0
    padded = np.full(n_blocks * spb, pad_val, dtype=np.int32)
    padded[:n] = x16
    data = _encode_blocks(padded.reshape(n_blocks, spb)).tobytes()

    byte_rate = (sr_hz * block_align + spb - 1) // spb  # avg bytes/sec
    fmt = b"fmt " + struct.pack(
        "<IHHIIHHHH", 20, 0x11, 1, sr_hz, byte_rate, block_align, 4, 2, spb
    )
    fact = b"fact" + struct.pack("<II", 4, n)
    dat = b"data" + struct.pack("<I", len(data))
    body = b"WAVE" + fmt + fact + dat + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def adpcm_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE IMA-ADPCM bytes → (float32 mono [-1, 1], sr_hz).

    Walks chunks like `wav_decode_pcm16`; validates tag/channels/bits and
    trims the zero-padded tail using the fact chunk's sample count."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sr_hz = block_align = spb = None
    n_samples = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # mid-chunk EOF: decoding the short body would silently return
            # fewer samples than the container declares
            raise ValueError(
                f"adpcm: truncated '{cid.decode('latin1')}' chunk — declares "
                f"{size} bytes, {len(body)} present"
            )
        if cid == b"fmt ":
            tag, ch, rate, _, balign, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 0x11:
                raise ValueError(f"not IMA ADPCM: format tag 0x{tag:x}")
            if ch != 1 or bits != 4:
                raise ValueError(f"unsupported IMA ADPCM layout ch={ch} bits={bits}")
            sr_hz, block_align = rate, balign
            if size >= 20:
                (spb,) = struct.unpack("<H", body[18:20])
        elif cid == b"fact":
            (n_samples,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sr_hz is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if spb is None:
        spb = (block_align - 4) * 2 + 1
    if len(data) % block_align:
        # blocks are fixed-size; a partial trailing block means the payload
        # was cut — decoding only the whole blocks would be silently short
        raise ValueError(
            f"adpcm: data chunk ({len(data)} B) is not a whole number of "
            f"{block_align}-byte blocks"
        )
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        if n_samples:
            raise ValueError(
                f"adpcm: fact chunk declares {n_samples} samples, data is empty"
            )
        return np.zeros(0, dtype=np.float32), sr_hz
    blocks = np.frombuffer(data, dtype=np.uint8).reshape(n_blocks, block_align)
    pcm16 = _decode_blocks(blocks, spb).reshape(-1)
    if n_samples is not None:
        if n_samples > len(pcm16):
            raise ValueError(
                f"adpcm: fact chunk declares {n_samples} samples, blocks "
                f"decode to only {len(pcm16)}"
            )
        pcm16 = pcm16[:n_samples]
    # the IMA predictor legitimately reaches -32768; clip at the float
    # boundary so the documented [-1, 1] contract holds for full-scale
    # negative samples (-32768/32767 would be -1.0000305 otherwise)
    return np.clip(pcm16.astype(np.float32) / 32767.0, -1.0, 1.0), sr_hz
