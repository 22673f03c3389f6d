"""Real (non-fake) external decoders through the registry — VERDICT r6
item 7.

The fakes in test_decoder_registry.py prove the seam's mechanics; these
tests drive the one *real* third-party decode stack available in a bare
sandbox — CPython's stdlib ``aifc``/``sunau`` containers with C ``audioop``
decompression — and pin the return-quirk classes fakes can't produce:

* uncompressed AIFF returns the file's big-endian bytes, compressed AIFF-C
  returns audioop's native-endian int16 (the endianness split);
* stereo containers must downmix to the engine's mono contract;
* the container's own frame rate cross-checks the row's ``sr_hz``;
* our pure-numpy G.711 tables are asserted bit-exact against audioop's
  C implementation for all 256 codes, both laws — a genuine independent
  cross-decoder validation of the oracle-gated built-ins.

Skips wholesale on CPython ≥ 3.13 (stdlib modules removed) — that path is
covered by ``register_stdlib_audio_decoders`` raising its documented error.
"""

from __future__ import annotations

import io
import sys
import warnings

import numpy as np
import pytest
from pyspark import cloudpickle

from datasketches_pig_spark import decoders as reg
from datasketches_pig_spark.audioops.codecs import (
    decode_clip,
    g711_alaw_decode,
    g711_ulaw_decode,
)
from datasketches_pig_spark.audioops.stdlib_decoders import (
    aiff_decode,
    au_decode,
    register_stdlib_audio_decoders,
    stdlib_audio_available,
)

pytestmark = pytest.mark.skipif(
    not stdlib_audio_available(),
    reason="stdlib aifc/sunau/audioop removed on this interpreter (py>=3.13)",
)

# decoder callables live in the engine package (importable on executors);
# only the test-local *encoder* helpers below need by-value pickling
cloudpickle.register_pickle_by_value(sys.modules[__name__])


class _KeepOpen(io.BytesIO):
    """aifc/sunau .close() closes the underlying file; keep the buffer."""

    def close(self):  # noqa: D102
        pass


def aiff_encode(
    pcm: np.ndarray,
    sr_hz: int,
    comptype: bytes = b"NONE",
    nchannels: int = 1,
) -> bytes:
    """Test-side AIFF/AIFF-C writer (stdlib aifc).  Interleaved input for
    nchannels > 1; uncompressed frames must be big-endian per the spec."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import aifc

    x16 = np.round(np.clip(pcm, -1.0, 1.0) * 32767.0).astype(">i2")
    buf = _KeepOpen()
    w = aifc.open(buf, "wb")
    w.setnchannels(nchannels)
    w.setsampwidth(2)
    w.setframerate(sr_hz)
    if comptype != b"NONE":
        w.setcomptype(comptype, b"")
        # aifc hands frames to audioop for compression, which expects
        # native-endian input — the writer-side half of the endianness split
        x16 = x16.astype("=i2")
    w.writeframes(x16.tobytes())
    w.close()
    return buf.getvalue()


def au_encode_ulaw(pcm: np.ndarray, sr_hz: int) -> bytes:
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import sunau

    x16 = np.round(np.clip(pcm, -1.0, 1.0) * 32767.0).astype("=i2")
    buf = _KeepOpen()
    w = sunau.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(sr_hz)
    w.setcomptype("ULAW", "")
    w.writeframes(x16.tobytes())
    w.close()
    return buf.getvalue()


def _sine(sr: int, ms: int, hz: float = 440.0, amp: float = 0.6) -> np.ndarray:
    t = np.arange(int(sr * ms / 1000)) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def _snr_db(x: np.ndarray, y: np.ndarray) -> float:
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    return 10 * np.log10((x**2).mean() / ((x - y) ** 2).mean())


# ---------------------------------------------------------------------------
# scalar decode quirks
# ---------------------------------------------------------------------------

def test_aiff_pcm16_is_big_endian_and_exact():
    pcm = _sine(16000, 500)
    out = aiff_decode(aiff_encode(pcm, 16000), 16000)
    assert out.dtype == np.float32
    # int16 quantization is the only loss
    assert np.abs(out - pcm).max() <= 1.0 / 32767 + 1e-7
    # a little-endian misread would be garbage; prove the data is truly BE
    # by checking SNR collapses under the wrong byte order
    blob = aiff_encode(pcm, 16000)
    raw = blob[-2 * len(pcm):]
    wrong = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767
    assert _snr_db(pcm, out) > 80 and _snr_db(pcm, wrong) < 5


def test_aifc_ulaw_decompresses_through_audioop():
    """Compressed AIFF-C readframes returns NATIVE-endian int16 (audioop
    output) — decode must not re-interpret it as big-endian."""
    pcm = _sine(8000, 500)
    out = aiff_decode(aiff_encode(pcm, 8000, comptype=b"ulaw"), 8000)
    assert len(out) == len(pcm)
    assert _snr_db(pcm, out) >= 30.0  # µ-law quantization only
    wrong = out.astype(">f4").view(np.uint32)  # sanity: out itself is sane
    assert np.abs(out).max() <= 1.0 and wrong is not None


def test_stereo_aiff_downmixes_to_mono():
    sr = 16000
    left = _sine(sr, 250, hz=300.0, amp=0.5)
    right = _sine(sr, 250, hz=300.0, amp=0.1)
    inter = np.empty(2 * len(left), dtype=np.float32)
    inter[0::2] = left
    inter[1::2] = right
    out = aiff_decode(aiff_encode(inter, sr, nchannels=2), sr)
    assert len(out) == len(left)
    assert _snr_db((left + right) / 2, out) > 60


def test_container_rate_mismatch_raises():
    pcm = _sine(8000, 200)
    blob = aiff_encode(pcm, 8000)
    with pytest.raises(ValueError, match="container says 8000"):
        aiff_decode(blob, 16000)
    au = au_encode_ulaw(pcm, 8000)
    with pytest.raises(ValueError, match="container says 8000"):
        au_decode(au, 44100)


def test_au_ulaw_roundtrip():
    pcm = _sine(8000, 400)
    out = au_decode(au_encode_ulaw(pcm, 8000), 8000)
    assert len(out) == len(pcm)
    assert _snr_db(pcm, out) >= 30.0


def test_g711_tables_bitexact_vs_audioop_c():
    """All 256 codes, both laws: our pure-numpy segmented G.711 decode
    equals CPython's C audioop bit-for-bit in the int16 linear domain —
    independent real-decoder validation of the oracle-gated built-ins."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    codes = bytes(range(256))
    au_u = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="=i2").astype(int)
    au_a = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="=i2").astype(int)
    ours_u = np.round(
        g711_ulaw_decode(codes).astype(np.float64) * 32767
    ).astype(int)
    ours_a = np.round(
        g711_alaw_decode(codes).astype(np.float64) * 32767
    ).astype(int)
    assert (au_u == ours_u).all()
    assert (au_a == ours_a).all()


# ---------------------------------------------------------------------------
# registry + Spark kernel
# ---------------------------------------------------------------------------

@pytest.fixture
def stdlib_registered():
    tags = register_stdlib_audio_decoders()
    try:
        yield tags
    finally:
        for t in tags:
            reg.unregister_audio_decoder(t)


def test_register_helper_and_dispatch(stdlib_registered):
    assert set(stdlib_registered) == {"aiff", "au"}
    pcm = _sine(16000, 300)
    out = decode_clip(aiff_encode(pcm, 16000), "aiff", 16000, dur_ms=300)
    assert _snr_db(pcm, out) > 80
    out2 = decode_clip(au_encode_ulaw(pcm, 16000), "au", 16000, dur_ms=300)
    assert _snr_db(pcm, out2) >= 30


def test_aiff_features_match_native_codec_through_arrow_kernel(
    spark, stdlib_registered
):
    """The real-decoder contract end-to-end on executors: the same sine
    content as native pcm_s16le WAV, uncompressed AIFF, and µ-law AIFF-C
    must produce near-identical acoustic features through the fused Arrow
    kernel (registry snapshot cloudpickled into the plan)."""
    from datasketches_pig_spark.audioops.codecs import wav_encode_pcm16
    from datasketches_pig_spark.audioops.features import extract_features

    sr, ms = 16000, 500
    pcm = _sine(sr, ms, hz=523.25)
    rows = [
        ("wav", bytearray(wav_encode_pcm16(pcm, sr)), sr, ms, "pcm_s16le", "t"),
        ("aiff", bytearray(aiff_encode(pcm, sr)), sr, ms, "aiff", "t"),
        ("aifc", bytearray(aiff_encode(pcm, sr, comptype=b"ulaw")), sr, ms,
         "aiff", "t"),
    ]
    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string"
    )
    feats = {
        r["clip_id"]: r
        for r in extract_features(spark.createDataFrame(rows, schema)).collect()
    }
    assert len(feats) == 3
    ref = feats["wav"]
    for k in ("aiff", "aifc"):
        assert feats[k]["n_samples"] == ref["n_samples"]
        assert abs(feats[k]["rms"] - ref["rms"]) < 0.01
        assert abs(feats[k]["dominant_freq_hz"] - ref["dominant_freq_hz"]) < 2.5
        assert abs(feats[k]["spectral_centroid_hz"] - ref["spectral_centroid_hz"]) < 25
