"""Per-row decode invariants (BASELINE.json input_hint): decoded-PCM allclose
vs ground truth at SNR ≥ 30 dB, transcript passthrough equality."""

import numpy as np
import pytest

from datasketches_pig_spark.audioops.codecs import (
    decode_clip,
    ulaw_decode,
    ulaw_encode,
    wav_decode_pcm16,
    wav_encode_pcm16,
)
from datasketches_pig_spark.data.clips import generate_clips_pandas


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    n = min(len(ref), len(test))
    ref, test = ref[:n], test[:n]
    noise = ref - test
    p_sig = float((ref**2).mean())
    p_noise = float((noise**2).mean()) + 1e-20
    return 10 * np.log10(p_sig / p_noise)


def test_wav_roundtrip_snr():
    rng = np.random.default_rng(1)
    pcm = (0.7 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
    pcm += rng.normal(0, 0.01, size=pcm.shape).astype(np.float32)
    blob = wav_encode_pcm16(pcm, 16000)
    out, sr = wav_decode_pcm16(blob)
    assert sr == 16000
    assert snr_db(pcm, out) > 60  # 16-bit quantization ≈ 90 dB


def test_ulaw_roundtrip_snr():
    pcm = (0.6 * np.sin(2 * np.pi * 220 * np.arange(8000) / 8000)).astype(np.float32)
    out = ulaw_decode(ulaw_encode(pcm))
    assert snr_db(pcm, out) > 30  # 8-bit µ-law ≈ 35-38 dB


def test_decode_clip_dispatch_unknown_codec():
    with pytest.raises(ValueError):
        decode_clip(b"xx", "not_a_codec", 8000)
    with pytest.raises(NotImplementedError):
        decode_clip(b"xx", "mp3", 8000)


def test_decode_stage_invariants(spark):
    """SNR ≥ 30 dB vs generator ground truth + transcript equality, through
    the real Spark mapInPandas operator."""
    from datasketches_pig_spark.data.clips import decode_ground_truth
    from datasketches_pig_spark.operators.stages import decode_stage

    clips_pdf, _, _ = generate_clips_pandas(40, seed=7)
    clips = spark.createDataFrame(clips_pdf)
    decoded = decode_stage(clips).toPandas().set_index("clip_id")

    assert set(decoded.index) == set(clips_pdf["clip_id"])
    for _, row in clips_pdf.iterrows():
        got = np.frombuffer(decoded.loc[row.clip_id, "pcm"], dtype="<f4")
        ref = decode_ground_truth(row["bytes"], row["codec"])
        assert len(got) == len(ref)
        assert snr_db(ref, got) >= 30.0 or np.allclose(ref, got, atol=1e-6)
        assert decoded.loc[row.clip_id, "transcript"] == row["transcript"]
