"""Audio codec layer — pure-numpy encode/decode, vectorized per clip batch.

The engine treats audio as opaque ``binary`` columns with typed metadata
(sr_hz, dur_ms, codec) and decodes inside Arrow-batched ``mapInPandas``
operators.  Two codecs are fully implemented in-numpy (no external audio
libraries needed):

* ``pcm_s16le``  — PCM16 mono inside a standard RIFF/WAVE container.
* ``ulaw``       — headerless G.711-style µ-law companded uint8 samples
                   (continuous companding formula, µ=255).
* ``adpcm_ima``  — IMA/DVI ADPCM (WAV format tag 0x11), the first
                   *compressed* codec: 4 bits/sample, block-independent,
                   decode bit-exact vs a scalar reference (adpcm.py).
* ``g711_alaw`` / ``g711_ulaw`` — ITU-T G.711 segmented companding (the
                   telephony wire format; sign + 3-bit segment + 4-bit
                   mantissa), validated by the canonical all-256-codes
                   encode∘decode identity (r5).

Codecs this container can't decode (mp3/opus/aac…) raise
``NotImplementedError`` unless the caller registers a decoder through the
external-decoder registry (``datasketches_pig_spark/decoders.py``): a
``codec tag → callable`` table consulted before the stub raise, snapshotted
into every Spark kernel closure at plan-build time so registered decoders
ship to executors — no engine-source edit needed to run an mp3 corpus.
"""

from __future__ import annotations

import struct

import numpy as np

_MU = 255.0


# ---------------------------------------------------------------------------
# WAV (RIFF) PCM16 mono
# ---------------------------------------------------------------------------

def wav_encode_pcm16(pcm: np.ndarray, sr_hz: int) -> bytes:
    """float32 mono [-1, 1] → RIFF/WAVE PCM16 bytes."""
    x = np.clip(pcm, -1.0, 1.0)
    samples = np.round(x * 32767.0).astype("<i2")
    data = samples.tobytes()
    byte_rate = sr_hz * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, byte_rate, 2, 16)
    dat = b"data" + struct.pack("<I", len(data))
    return hdr + fmt + dat + data


def wav_decode_pcm16(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → (float32 mono [-1, 1], sr_hz). Walks chunks."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sr_hz = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # mid-chunk EOF: a short data body would silently decode to a
            # shorter clip than the container declares
            raise ValueError(
                f"wav: truncated '{cid.decode('latin1')}' chunk — declares "
                f"{size} bytes, {len(body)} present"
            )
        if cid == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError(f"unsupported WAV format tag={fmt_tag} ch={channels} bits={bits}")
            sr_hz = rate
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sr_hz is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    return pcm, sr_hz


# ---------------------------------------------------------------------------
# µ-law (headerless uint8 samples)
# ---------------------------------------------------------------------------

def ulaw_encode(pcm: np.ndarray) -> bytes:
    """float32 mono [-1, 1] → µ-law companded uint8 samples."""
    x = np.clip(pcm, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    q = np.round((y + 1.0) * 127.5).astype(np.uint8)
    return q.tobytes()


def ulaw_decode(blob: bytes) -> np.ndarray:
    """µ-law uint8 samples → float32 mono [-1, 1]."""
    q = np.frombuffer(blob, dtype=np.uint8).astype(np.float32)
    y = q / 127.5 - 1.0
    x = np.sign(y) * ((1.0 + _MU) ** np.abs(y) - 1.0) / _MU
    return x.astype(np.float32)


# ---------------------------------------------------------------------------
# G.711 (segmented A-law / µ-law — the telephony wire format)
# ---------------------------------------------------------------------------
# The ITU-T G.711 segmented encodings, distinct from the continuous-formula
# `ulaw` above: sign bit + 3-bit segment + 4-bit mantissa, A-law XOR 0x55
# toggling, µ-law bias 0x84 and ones-complement.  Pure-numpy branchless
# (segment index via bit-length), validated by the canonical self-consistency
# property: encode(decode(c)) == c for every one of the 256 codes, both laws
# (tests/test_audioops.py).  Public algorithm (ITU-T Rec. G.711).

_G711_BIAS = 0x84
_G711_CLIP = 32635


def _seg_count(mag: np.ndarray, base: int) -> np.ndarray:
    """3-bit segment: the ITU table search — number of segment-end values
    below ``mag``, ends at ``(base << i) - 1`` for i = 0..6 (A-law base
    0x20, µ-law base 0x100).  Magnitudes are pre-clamped so seg ≤ 7."""
    seg = np.zeros(len(mag), dtype=np.int32)
    for i in range(7):
        seg += (mag > (base << i) - 1).astype(np.int32)
    return seg


def g711_alaw_encode(pcm: np.ndarray) -> bytes:
    """float32 mono [-1, 1] → G.711 A-law uint8 samples."""
    x16 = np.round(np.clip(np.asarray(pcm, np.float64), -1.0, 1.0) * 32767.0)
    v = x16.astype(np.int32) >> 3  # 13-bit magnitude domain
    mask = np.where(v >= 0, 0xD5, 0x55).astype(np.int32)
    mag = np.minimum(np.where(v >= 0, v, -v - 1), 0x0FFF).astype(np.int32)
    seg = _seg_count(mag, 0x20)
    mant = np.where(seg < 2, (mag >> 1) & 0x0F, (mag >> seg) & 0x0F)
    return (((seg << 4) | mant) ^ mask).astype(np.uint8).tobytes()


def g711_alaw_decode(blob: bytes) -> np.ndarray:
    """G.711 A-law uint8 samples → float32 mono [-1, 1] (16-bit domain)."""
    a = np.frombuffer(blob, dtype=np.uint8).astype(np.int32) ^ 0x55
    seg = (a & 0x70) >> 4
    t = ((a & 0x0F) << 4) + np.where(seg == 0, 8, 0x108)
    t = np.where(seg >= 2, t << np.maximum(seg - 1, 0), t)
    lin = np.where(a & 0x80, t, -t).astype(np.float32)
    return np.clip(lin / 32767.0, -1.0, 1.0).astype(np.float32)


def g711_ulaw_encode(pcm: np.ndarray) -> bytes:
    """float32 mono [-1, 1] → G.711 µ-law uint8 samples."""
    x16 = np.round(np.clip(np.asarray(pcm, np.float64), -1.0, 1.0) * 32767.0)
    v = x16.astype(np.int32)
    sign = np.where(v < 0, 0x80, 0x00).astype(np.int32)
    mag = np.minimum(np.abs(v), _G711_CLIP) + _G711_BIAS
    seg = _seg_count(mag, 0x100)
    mant = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8).tobytes()


def g711_ulaw_decode(blob: bytes) -> np.ndarray:
    """G.711 µ-law uint8 samples → float32 mono [-1, 1]."""
    u = (~np.frombuffer(blob, dtype=np.uint8)).astype(np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + _G711_BIAS) << ((u & 0x70) >> 4)
    lin = np.where(u & 0x80, -(t - _G711_BIAS), t - _G711_BIAS).astype(
        np.float32
    )
    return np.clip(lin / 32767.0, -1.0, 1.0).astype(np.float32)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def decode_clip(
    blob: bytes,
    codec: str,
    sr_hz: int,
    decoders: dict | None = None,
    dur_ms: int | None = None,
) -> np.ndarray:
    """Decode one clip payload to float32 PCM at its native rate.

    The per-clip loop lives inside a ``mapInPandas`` Arrow batch; the heavy
    lifting (sample conversion) is vectorized numpy per clip.

    ``decoders`` is an external-decoder table (codec tag → callable,
    contract in ``datasketches_pig_spark/decoders.py``) consulted for tags
    the built-in codecs don't cover — Spark kernels pass the registry
    snapshot captured at plan-build time so registered decoders reach
    executors; ``None`` falls back to the live process-local registry.
    ``dur_ms`` (when the source row carries it) arms the registry
    contract's sample-rate honesty check: a registered decoder that
    resamples or ignores ``sr_hz`` fails loudly instead of silently
    shifting every audio shingle.  Built-in codecs are oracle-gated and
    skip it (their WAV-container paths already cross-check ``sr_hz``).
    """
    if codec == "pcm_s16le":
        pcm, wav_sr = wav_decode_pcm16(blob)
        if wav_sr != sr_hz:
            raise ValueError(f"sr mismatch: wav={wav_sr} metadata={sr_hz}")
        return pcm
    if codec == "ulaw":
        return ulaw_decode(blob)
    if codec == "g711_alaw":
        return g711_alaw_decode(blob)
    if codec == "g711_ulaw":
        return g711_ulaw_decode(blob)
    if codec == "adpcm_ima":
        from datasketches_pig_spark.audioops.adpcm import adpcm_decode

        pcm, wav_sr = adpcm_decode(blob)
        if wav_sr != sr_hz:
            raise ValueError(f"sr mismatch: wav={wav_sr} metadata={sr_hz}")
        return pcm
    from datasketches_pig_spark import decoders as _reg

    table = decoders if decoders is not None else _reg.audio_decoder_snapshot()
    fn = table.get(codec)
    if fn is not None:
        return _reg.validate_pcm(fn(blob, sr_hz), codec, sr_hz=sr_hz, dur_ms=dur_ms)
    return _stub_raise(codec)


def dur_ms_batch(pdf) -> list:
    """Per-row ``dur_ms`` for an Arrow kernel batch — ``None``s when the
    frame lacks the column (the registry's rate check is then waived)."""
    if "dur_ms" in pdf.columns:
        return [None if v is None or v != v else int(v) for v in pdf["dur_ms"]]
    return [None] * len(pdf)


def _stub_raise(codec: str):
    if codec in ("mp3", "opus", "aac", "flac", "vorbis"):
        # Real decoders need external audio libraries not present in this
        # container; the surrounding Spark plumbing (schema, dispatch,
        # batching) is identical for these codecs.
        raise NotImplementedError(
            f"audio codec '{codec}' needs an external decoder: register one "
            "with datasketches_pig_spark.decoders.register_audio_decoder("
            f"'{codec}', fn) before building the pipeline"
        )
    raise ValueError(f"unknown codec '{codec}'")
