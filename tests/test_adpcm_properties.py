"""Hypothesis property tests for the IMA ADPCM codec — randomized depth in
the reference's TestNG style, complementing `test_adpcm.py`'s fixed-vector
scalar cross-validation.

Pure-kernel (no Spark): every property must hold for arbitrary PCM content
and arbitrary (valid) container parameters, not just the synth corpora."""

import numpy as np
from hypothesis import given, settings, strategies as st

from datasketches_pig_spark.audioops.adpcm import (
    STEP_TABLE,
    adpcm_decode,
    adpcm_encode,
)

# float32 samples in [-1, 1], arbitrary content incl. clipping edges
_pcm = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, width=32, allow_nan=False),
    min_size=0,
    max_size=3000,
)
_block_align = st.sampled_from([8, 32, 64, 256, 1024])
_sr = st.sampled_from([8000, 16000, 22050, 44100])


@given(_pcm, _sr, _block_align)
@settings(max_examples=40, deadline=None)
def test_roundtrip_length_and_rate_exact(vals, sr, block_align):
    """Decode returns EXACTLY the encoded sample count (fact-chunk trim) and
    the container's sample rate, for every block-boundary alignment."""
    pcm = np.asarray(vals, dtype=np.float32)
    dec, sr2 = adpcm_decode(adpcm_encode(pcm, sr, block_align=block_align))
    assert sr2 == sr
    assert len(dec) == len(pcm)
    assert dec.dtype == np.float32
    assert len(dec) == 0 or (np.abs(dec) <= 1.0).all()


def test_full_scale_negative_stays_in_range():
    """Hypothesis-found regression (r5): a full-scale negative sample drives
    the IMA predictor to -32768, whose /32767 float conversion was -1.0000305
    before the decode-side clip.  The decoded output must honor the
    documented [-1, 1] contract exactly."""
    pcm = np.asarray([0.0, -1.0], dtype=np.float32)
    dec, _ = adpcm_decode(adpcm_encode(pcm, 8000, block_align=8))
    assert (np.abs(dec) <= 1.0).all()
    # full-scale negative is still recovered at (or within one LSB of) -1.0
    assert dec[1] <= -0.999


@given(_pcm, _block_align)
@settings(max_examples=30, deadline=None)
def test_deterministic_and_prefix_stable(vals, block_align):
    """Encoding is a pure function, and block independence means encoding a
    whole-block prefix yields byte-identical data bytes for those blocks."""
    pcm = np.asarray(vals, dtype=np.float32)
    b1 = adpcm_encode(pcm, 16000, block_align=block_align)
    b2 = adpcm_encode(pcm, 16000, block_align=block_align)
    assert b1 == b2
    spb = (block_align - 4) * 2 + 1
    if len(pcm) >= 2 * spb:
        whole = (len(pcm) // spb) * spb
        data_full = b1[b1.index(b"data") + 8 :]
        pre = adpcm_encode(pcm[:whole], 16000, block_align=block_align)
        data_pre = pre[pre.index(b"data") + 8 :]
        assert data_full[: len(data_pre)] == data_pre


@given(_pcm)
@settings(max_examples=30, deadline=None)
def test_first_sample_exact_and_bounded_step_error(vals):
    """The block header carries sample 0 verbatim — the decoded first sample
    of every block is exact (to PCM16 quantization).  Every later sample's
    one-step reconstruction error is bounded by the largest quantizer cell
    at the step in force; globally that is < 2*STEP_TABLE[-1] LSBs, which
    caps the absolute error at any sample below ~2.0 full scale — the
    decoder can never blow up, whatever the content."""
    pcm = np.asarray(vals, dtype=np.float32)
    if not len(pcm):
        return
    dec, _ = adpcm_decode(adpcm_encode(pcm, 16000))
    q0 = np.round(np.clip(pcm[0], -1, 1) * 32767.0) / 32767.0
    assert abs(dec[0] - q0) < 1e-6
    assert (np.abs(dec - np.clip(pcm, -1, 1)) * 32767.0 < 2 * STEP_TABLE[-1]).all()


@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 6),
    st.sampled_from([8, 32, 64]),
)
@settings(max_examples=25, deadline=None)
def test_decode_total_on_adversarial_blocks(seed, n_blocks, block_align):
    """Any byte content parses as SOME sample stream once the container is
    valid: random nibble data (incl. step indices at the clamp edges) must
    decode without overflow or error — int32 clamping is total."""
    rng = np.random.default_rng(seed)
    spb = (block_align - 4) * 2 + 1
    blocks = rng.integers(0, 256, size=(n_blocks, block_align)).astype(np.uint8)
    blocks[:, 2] = rng.integers(0, 89, size=n_blocks)
    from datasketches_pig_spark.audioops.adpcm import _decode_blocks

    out = _decode_blocks(blocks, spb)
    assert out.shape == (n_blocks, spb)
    assert out.min() >= -32768 and out.max() <= 32767


@given(_pcm, st.floats(min_value=0.1, max_value=0.9))
@settings(max_examples=20, deadline=None)
def test_block_independence_under_corruption(vals, frac):
    """Corrupting one block's bytes changes ONLY that block's samples — the
    property that makes the codec safe to decode per-partition in parallel
    and limits damage from a corrupt object-store range read."""
    pcm = np.asarray(vals, dtype=np.float32)
    block_align = 32
    spb = (block_align - 4) * 2 + 1
    if len(pcm) < 3 * spb:
        return
    blob = bytearray(adpcm_encode(pcm, 16000, block_align=block_align))
    data_off = bytes(blob).index(b"data") + 8
    n_blocks = (len(blob) - data_off) // block_align
    victim = int(frac * n_blocks)
    blob[data_off + victim * block_align + 5] ^= 0xFF
    ref, _ = adpcm_decode(adpcm_encode(pcm, 16000, block_align=block_align))
    got, _ = adpcm_decode(bytes(blob))
    same = ref == got
    lo, hi = victim * spb, (victim + 1) * spb
    assert same[:lo].all() and same[hi:].all()
    assert not same[lo:hi].all()
