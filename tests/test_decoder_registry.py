"""External-decoder registry contract (decoders.py).

The production gap this seam closes: a crawl corpus is mostly mp3/aac audio
and h264 video, whose decoders can't be pure numpy in this sandbox.  These
tests register deterministic FAKE decoders for 'mp3' and 'h264' (payload =
magic + a format the engine decodes natively) and prove:

1. the registry API enforces its contract (builtin tags refused, returns
   validated, unregister restores the loud stub naming the hook), and
2. the FULL near-dup path — fused Arrow decode→signature pass → banding →
   salted bucket expansion → tiered verify → union-find clusters — runs
   end-to-end on registered-codec payloads with planted-dup recall 1.0 and
   cluster assignments identical to the same corpus in a native codec.

Fake decoders are module-level functions: the registry snapshot is captured
into each kernel closure at plan build and cloudpickled to executors, so the
callable itself must survive pickling (the cluster-correctness requirement
documented in decoders.py).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest
from pyspark import cloudpickle

# In production the registered decoder lives in a module shipped via
# --py-files, so by-reference pickling resolves on executors.  This test
# module is NOT on the executor path, so opt it into by-value pickling —
# which also demonstrates the documented fallback for decoders defined
# outside shipped modules.
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from datasketches_pig_spark import decoders as reg
from datasketches_pig_spark.audioops.codecs import (
    decode_clip,
    ulaw_decode,
    ulaw_encode,
)

MP3_MAGIC = b"FAKEMP3\x00"
H264_MAGIC = b"FAKE264\x00"


def fake_mp3_decode(blob: bytes, sr_hz: int) -> np.ndarray:
    """Deterministic stand-in for a real mp3 library: strips the magic and
    decodes the embedded µ-law samples.  Module-level → picklable."""
    if not blob.startswith(MP3_MAGIC):
        raise ValueError("not a fake-mp3 payload")
    return ulaw_decode(blob[len(MP3_MAGIC):])


def fake_mp3_encode(pcm: np.ndarray) -> bytes:
    return MP3_MAGIC + ulaw_encode(pcm)


def fake_h264_decode(blob: bytes, width: int, height: int) -> np.ndarray:
    """Fake video decoder: magic + raw uint8 RGB frames."""
    if not blob.startswith(H264_MAGIC):
        raise ValueError("not a fake-h264 payload")
    arr = np.frombuffer(blob, dtype=np.uint8, offset=len(H264_MAGIC))
    return arr.reshape(-1, height, width, 3)


def _bad_shape_decoder(blob: bytes, sr_hz: int) -> np.ndarray:
    return np.zeros((4, 2), dtype=np.float32)


def _nan_decoder(blob: bytes, sr_hz: int) -> np.ndarray:
    # all-NaN passes a bare amplitude check (NaN compares False) — the
    # contract must reject it explicitly or features silently poison
    return np.full(100, np.nan, dtype=np.float32)


def _resampling_decoder(blob: bytes, sr_hz: int) -> np.ndarray:
    """A decoder that resamples to 16 kHz regardless of the row's native
    rate — the silent-shingle-shift failure mode VERDICT r6 item 2 names."""
    pcm = fake_mp3_decode(blob, sr_hz)
    n_out = int(round(len(pcm) * 16000 / sr_hz))
    return np.interp(
        np.linspace(0.0, 1.0, n_out), np.linspace(0.0, 1.0, len(pcm)), pcm
    ).astype(np.float32)


@pytest.fixture
def mp3_registered():
    reg.register_audio_decoder("mp3", fake_mp3_decode)
    try:
        yield
    finally:
        reg.unregister_audio_decoder("mp3")


# ---------------------------------------------------------------------------
# registry API contract
# ---------------------------------------------------------------------------

def test_builtin_tags_are_refused():
    for tag in ("pcm_s16le", "adpcm_ima", "g711_alaw"):
        with pytest.raises(ValueError, match="built-in"):
            reg.register_audio_decoder(tag, fake_mp3_decode)
    # gif/gif_anim decode natively (r6/r7) — a registration for them would
    # be silently dead code (native dispatch wins), so it must refuse
    for tag in ("jpeg", "gif"):
        with pytest.raises(ValueError, match="built-in"):
            reg.register_image_decoder(tag, fake_h264_decode)
    for tag in ("mjpeg_avi", "gif_anim"):
        with pytest.raises(ValueError, match="built-in"):
            reg.register_video_decoder(tag, fake_h264_decode)
    with pytest.raises(TypeError):
        reg.register_audio_decoder("mp3", "not-callable")


def test_register_decode_unregister_roundtrip(mp3_registered):
    rng = np.random.default_rng(7)
    pcm = (rng.standard_normal(800) * 0.2).astype(np.float32)
    blob = fake_mp3_encode(pcm)
    out = decode_clip(blob, "mp3", 8000)
    # µ-law is lossy; SNR >= 30 dB is the per-row invariant bar
    snr = 10 * np.log10((pcm**2).sum() / ((pcm - out) ** 2).sum())
    assert snr >= 30.0
    reg.unregister_audio_decoder("mp3")
    with pytest.raises(NotImplementedError, match="register_audio_decoder"):
        decode_clip(blob, "mp3", 8000)
    # re-register for the fixture's unregister (idempotent pop)
    reg.register_audio_decoder("mp3", fake_mp3_decode)


def test_registered_return_is_validated():
    reg.register_audio_decoder("mp3", _bad_shape_decoder)
    try:
        with pytest.raises(ValueError, match="1-D mono PCM"):
            decode_clip(b"anything", "mp3", 8000)
    finally:
        reg.unregister_audio_decoder("mp3")


def test_nan_return_is_refused():
    reg.register_audio_decoder("mp3", _nan_decoder)
    try:
        with pytest.raises(ValueError, match="non-finite"):
            decode_clip(b"anything", "mp3", 8000)
    finally:
        reg.unregister_audio_decoder("mp3")


def test_wrong_rate_decoder_fails_loudly_when_dur_ms_present():
    """Sample-rate honesty (VERDICT r6 item 2): with dur_ms metadata armed,
    a decoder that resamples (here to 16 kHz from a 44.1 kHz row) returns a
    length off by the rate ratio and must raise; the same decoder at an
    honest rate — and an honest decoder with block-padding-scale rounding —
    must pass."""
    rng = np.random.default_rng(3)
    sr = 44100
    pcm = (rng.standard_normal(sr // 2) * 0.2).astype(np.float32)  # 500 ms
    blob = fake_mp3_encode(pcm)
    reg.register_audio_decoder("mp3", _resampling_decoder)
    try:
        with pytest.raises(ValueError, match="resampling or ignoring sr_hz"):
            decode_clip(blob, "mp3", sr, dur_ms=500)
        # without dur_ms the check is waived (documented contract)
        out = decode_clip(blob, "mp3", sr)
        assert len(out) == int(round(len(pcm) * 16000 / sr))
    finally:
        reg.unregister_audio_decoder("mp3")
    reg.register_audio_decoder("mp3", fake_mp3_decode)
    try:
        out = decode_clip(blob, "mp3", sr, dur_ms=500)
        assert len(out) == len(pcm)
        # ±20%/60 ms slack: codec frame padding must not trip the check
        reg.register_audio_decoder(
            "padded", lambda b, s: np.zeros(int(0.5 * s) + 1024, np.float32)
        )
        assert len(decode_clip(b"x", "padded", sr, dur_ms=500)) > 0
    finally:
        reg.unregister_audio_decoder("mp3")
        reg.unregister_audio_decoder("padded")


def test_wrong_rate_decoder_caught_through_arrow_kernel(spark, mp3_registered):
    """The dur_ms column rides the clips schema into the fused feature
    kernel; a wrong-rate registered decoder must fail the Spark job, not
    silently shift shingles."""
    from datasketches_pig_spark.audioops.features import extract_features

    rng = np.random.default_rng(5)
    sr = 32000
    pcm = (rng.standard_normal(sr) * 0.1).astype(np.float32)  # 1000 ms
    rows = [("c0", bytearray(fake_mp3_encode(pcm)), sr, 1000, "mp3", "t")]
    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string"
    )
    clips = spark.createDataFrame(rows, schema)
    # honest decoder: flows through, one feature row
    assert extract_features(clips).count() == 1
    reg.register_audio_decoder("mp3", _resampling_decoder)
    try:
        with pytest.raises(Exception, match="resampling or ignoring sr_hz"):
            extract_features(clips).count()
    finally:
        reg.unregister_audio_decoder("mp3")
        reg.register_audio_decoder("mp3", fake_mp3_decode)


def test_explicit_table_beats_process_registry():
    """Kernels pass the plan-build snapshot; an explicit table must be used
    verbatim (and an empty one must NOT fall back to the live registry) —
    this is what makes capture semantics deterministic on a cluster."""
    blob = fake_mp3_encode(np.zeros(10, dtype=np.float32))
    out = decode_clip(blob, "mp3", 8000, decoders={"mp3": fake_mp3_decode})
    assert out.shape == (10,)
    reg.register_audio_decoder("mp3", fake_mp3_decode)
    try:
        with pytest.raises(NotImplementedError):
            decode_clip(blob, "mp3", 8000, decoders={})
    finally:
        reg.unregister_audio_decoder("mp3")


# ---------------------------------------------------------------------------
# full near-dup path on registered-codec payloads
# ---------------------------------------------------------------------------

def _transcode_to_fake_mp3(spark, clips):
    """Re-encode every clip payload as fake-mp3 via a distributed Arrow pass
    (decodes with the builtin codecs, so runs before any registration)."""
    from collections.abc import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                fake_mp3_encode(decode_clip(b, c, int(s)))
                for b, c, s in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"])
            ]
            out = pdf.copy()
            out["bytes"] = blobs
            out["codec"] = "mp3"
            yield out

    return clips.mapInPandas(run, schema=clips.schema)


def test_full_pipeline_on_registered_mp3(spark, tmp_path, mp3_registered):
    """The VERDICT contract test: fake mp3 decoder → fused signature pass →
    banding → verify → clusters, planted-dup recall 1.0, assignments
    identical to the native-codec run of the same corpus."""
    from datasketches_pig_spark.config import DedupConfig
    from datasketches_pig_spark.data.clips import (
        generate_clips_spark,
        generate_truth_spark,
    )
    from datasketches_pig_spark.pipeline import run_pipeline

    clips = generate_clips_spark(
        spark, n_groups=40, seed=4242, out_dir=str(tmp_path / "in")
    )
    baseline = run_pipeline(
        spark, clips, DedupConfig(), run_dir=str(tmp_path / "ck_base")
    ).clusters
    mp3_clips = _transcode_to_fake_mp3(spark, clips)
    got = run_pipeline(
        spark, mp3_clips, DedupConfig(), run_dir=str(tmp_path / "ck_mp3")
    ).clusters

    truth_pairs, _ = generate_truth_spark(spark, n_groups=40, seed=4242)
    joined = (
        truth_pairs.alias("t")
        .join(got.alias("p"), F.col("t.a") == F.col("p.clip_id"))
        .join(got.alias("q"), F.col("t.b") == F.col("q.clip_id"))
    )
    total = joined.count()
    hit = joined.filter(F.col("p.cluster_id") == F.col("q.cluster_id")).count()
    assert total > 0 and hit == total  # recall 1.0 on planted dups

    # same-cluster relation identical to the native-codec baseline: compare
    # the co-clustered pair sets (cluster ids themselves may differ — µ-law
    # transcode can perturb exact-byte keys, so only the relation is pinned)
    def pair_set(cl):
        c1 = cl.select(F.col("clip_id").alias("x"), F.col("cluster_id").alias("c"))
        c2 = cl.select(F.col("clip_id").alias("y"), F.col("cluster_id").alias("c"))
        return (
            c1.join(c2, "c")
            .filter(F.col("x") < F.col("y"))
            .select("x", "y")
        )

    base_pairs = pair_set(baseline)
    got_pairs = pair_set(got)
    assert base_pairs.exceptAll(got_pairs).count() == 0
    assert got_pairs.exceptAll(base_pairs).count() == 0


def test_frame_stage_on_registered_h264(spark):
    """Video seam: registered fake h264 feeds frame_sample_stage; identical
    frames under two codecs produce identical dHash rows."""
    from datasketches_pig_spark.videoops.frames import frame_sample_stage

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(6, 16, 24, 3), dtype=np.uint8)
    raw = frames.tobytes()
    rows = [
        (0, bytearray(raw), "rawrgb", 24, 16),
        (1, bytearray(H264_MAGIC + raw), "h264", 24, 16),
    ]
    videos = spark.createDataFrame(
        rows, "video_id long, bytes binary, codec string, width int, height int"
    )
    reg.register_video_decoder("h264", fake_h264_decode)
    try:
        out = frame_sample_stage(videos, stride=2).toPandas()
    finally:
        reg.unregister_video_decoder("h264")
    a = out[out.video_id == 0].sort_values("frame_idx").reset_index(drop=True)
    b = out[out.video_id == 1].sort_values("frame_idx").reset_index(drop=True)
    assert len(a) == 3 and len(b) == 3
    pd.testing.assert_frame_equal(a.drop(columns=["video_id"]), b.drop(columns=["video_id"]))
