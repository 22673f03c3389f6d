"""Multimodal audio operator tests: frame sampling, feature extraction,
resampling — schema, batch shape, and numeric sanity."""

import numpy as np
import pytest

from datasketches_pig_spark.data.clips import generate_clips_pandas


@pytest.fixture(scope="module")
def clips(spark):
    pdf, _, _ = generate_clips_pandas(15, seed=21)
    return spark.createDataFrame(pdf).cache(), pdf


def test_frame_sample(spark, clips):
    from datasketches_pig_spark.audioops.features import frame_sample

    df, pdf = clips
    out = frame_sample(df, n_frames=4, frame_ms=50).toPandas()
    assert set(out.columns) == {"clip_id", "frame_idx", "t_ms", "frame", "sr_hz"}
    per_clip = out.groupby("clip_id").size()
    assert (per_clip <= 4).all() and (per_clip >= 1).all()
    row = out.iloc[0]
    frame = np.frombuffer(row["frame"], dtype="<f4")
    assert len(frame) == int(row["sr_hz"] * 0.05)
    assert np.abs(frame).max() <= 1.01


def test_extract_features(spark, clips):
    from datasketches_pig_spark.audioops.features import extract_features

    df, pdf = clips
    out = extract_features(df).toPandas().set_index("clip_id")
    assert len(out) == len(pdf)
    assert (out["rms"] > 0).all()
    # synth notes live in 110 Hz .. ~2.9 kHz
    assert (out["dominant_freq_hz"] >= 50).all()
    assert (out["dominant_freq_hz"] <= 4000).all()
    assert (out["spectral_rolloff_hz"] >= out["dominant_freq_hz"] * 0.5).all()


def test_resample(spark, clips):
    from datasketches_pig_spark.audioops.features import resample_stage

    df, pdf = clips
    out = resample_stage(df, target_sr=16000).toPandas().set_index("clip_id")
    assert (out["sr_hz"] == 16000).all()
    for _, row in pdf.iterrows():
        n_out = out.loc[row.clip_id, "n_samples"]
        expected = row.dur_ms / 1000 * 16000
        assert abs(n_out - expected) / expected < 0.05
