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

Codecs this container can't decode (mp3/opus/aac…) are registered as stubs
raising ``NotImplementedError`` — the Spark-side plumbing (schema, dispatch,
batching) treats them identically, so wiring a real decoder is a local change.
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
# dispatch
# ---------------------------------------------------------------------------

def decode_clip(blob: bytes, codec: str, sr_hz: int) -> np.ndarray:
    """Decode one clip payload to float32 PCM at its native rate.

    The per-clip loop lives inside a ``mapInPandas`` Arrow batch; the heavy
    lifting (sample conversion) is vectorized numpy per clip.
    """
    if codec == "pcm_s16le":
        pcm, wav_sr = wav_decode_pcm16(blob)
        if wav_sr != sr_hz:
            raise ValueError(f"sr mismatch: wav={wav_sr} metadata={sr_hz}")
        return pcm
    if codec == "ulaw":
        return ulaw_decode(blob)
    if codec == "adpcm_ima":
        from datasketches_pig_spark.audioops.adpcm import adpcm_decode

        pcm, wav_sr = adpcm_decode(blob)
        if wav_sr != sr_hz:
            raise ValueError(f"sr mismatch: wav={wav_sr} metadata={sr_hz}")
        return pcm
    if codec in ("mp3", "opus", "aac", "flac", "vorbis"):
        # Real decoders need external audio libraries not present in this
        # container; the surrounding Spark plumbing (schema, dispatch,
        # batching) is identical for these codecs.
        raise NotImplementedError(
            f"codec '{codec}' requires an external decoder; plug one in here"
        )
    raise ValueError(f"unknown codec '{codec}'")
