"""Multimodal column operators: audio treated as an opaque ``binary`` column
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Real in this container: WAV/µ-law decode (codecs.py), frame sampling, energy/
ZCR/spectral feature extraction (numpy FFT), resampling.  Stubbed behind
``NotImplementedError``: external-codec decode (mp3/opus/…) — the Spark-side
plumbing (schema, batching, dispatch, partitioning) is identical and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from datasketches_pig_spark.audioops.codecs import decode_clip, dur_ms_batch
from datasketches_pig_spark.decoders import audio_decoder_snapshot

FRAME_SAMPLE_SCHEMA = (
    "clip_id string, frame_idx int, t_ms int, frame binary, sr_hz int"
)


def frame_sample(
    clips: DataFrame,
    n_frames: int = 8,
    frame_ms: int = 100,
) -> DataFrame:
    """Sample n evenly-spaced PCM frames per clip (the audio analog of video
    frame-sampling): one output row per (clip, frame), frame payload =
    float32 little-endian bytes."""
    ext = audio_decoder_snapshot()  # plan-build-time capture → executors

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("clip_id", "frame_idx", "t_ms", "frame", "sr_hz")}
            for cid, blob, codec, sr, dm in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"],
                dur_ms_batch(pdf),
            ):
                pcm = decode_clip(blob, codec, int(sr), decoders=ext, dur_ms=dm)
                flen = max(int(sr * frame_ms / 1000), 1)
                if len(pcm) <= flen:
                    starts = [0]
                else:
                    starts = np.linspace(0, len(pcm) - flen, n_frames).astype(int)
                for j, s in enumerate(starts):
                    out["clip_id"].append(cid)
                    out["frame_idx"].append(j)
                    out["t_ms"].append(int(s * 1000 / sr))
                    out["frame"].append(pcm[s : s + flen].astype("<f4").tobytes())
                    out["sr_hz"].append(int(sr))
            yield pd.DataFrame(out)

    return clips.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


FEATURES_SCHEMA = (
    "clip_id string, rms double, zcr_hz double, spectral_centroid_hz double, "
    "spectral_rolloff_hz double, dominant_freq_hz double, n_samples int"
)


def extract_features(clips: DataFrame) -> DataFrame:
    """Whole-clip acoustic features: RMS, ZCR, spectral centroid/rolloff,
    dominant FFT frequency — vectorized numpy per clip."""
    ext = audio_decoder_snapshot()  # plan-build-time capture → executors

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "clip_id", "rms", "zcr_hz", "spectral_centroid_hz",
                "spectral_rolloff_hz", "dominant_freq_hz", "n_samples",
            )}
            for cid, blob, codec, sr, dm in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"],
                dur_ms_batch(pdf),
            ):
                pcm = decode_clip(
                    blob, codec, int(sr), decoders=ext, dur_ms=dm
                ).astype(np.float64)
                n = len(pcm)
                rms = float(np.sqrt((pcm**2).mean())) if n else 0.0
                signs = pcm >= 0
                zcr = float((signs[1:] != signs[:-1]).sum() / 2 * sr / max(n, 1))
                spec = np.abs(np.fft.rfft(pcm)) ** 2
                freqs = np.fft.rfftfreq(n, 1.0 / sr)
                tot = spec.sum() or 1.0
                centroid = float((freqs * spec).sum() / tot)
                cum = np.cumsum(spec)
                roll = float(freqs[np.searchsorted(cum, 0.85 * cum[-1])]) if n else 0.0
                dom = float(freqs[int(spec.argmax())]) if n else 0.0
                rows["clip_id"].append(cid)
                rows["rms"].append(rms)
                rows["zcr_hz"].append(zcr)
                rows["spectral_centroid_hz"].append(centroid)
                rows["spectral_rolloff_hz"].append(roll)
                rows["dominant_freq_hz"].append(dom)
                rows["n_samples"].append(n)
            yield pd.DataFrame(rows)

    return clips.mapInPandas(run, schema=FEATURES_SCHEMA)


def resample_stage(clips: DataFrame, target_sr: int = 16000) -> DataFrame:
    """Linear-interpolation resample to a common rate — the normalize-before-
    model step.  Output schema matches decode_stage."""
    ext = audio_decoder_snapshot()  # plan-build-time capture → executors

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pcms, ns = [], []
            for blob, codec, sr, dm in zip(
                pdf["bytes"], pdf["codec"], pdf["sr_hz"], dur_ms_batch(pdf)
            ):
                pcm = decode_clip(blob, codec, int(sr), decoders=ext, dur_ms=dm)
                if int(sr) != target_sr and len(pcm) > 1:
                    n_out = int(round(len(pcm) * target_sr / int(sr)))
                    x_old = np.linspace(0.0, 1.0, len(pcm))
                    x_new = np.linspace(0.0, 1.0, max(n_out, 1))
                    pcm = np.interp(x_new, x_old, pcm).astype(np.float32)
                pcms.append(pcm.astype("<f4").tobytes())
                ns.append(len(pcm))
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "pcm": pcms,
                    "sr_hz": [target_sr] * len(pdf),
                    "n_samples": ns,
                    "transcript": pdf["transcript"],
                }
            )

    from datasketches_pig_spark.operators.stages import DECODE_SCHEMA

    return clips.mapInPandas(run, schema=DECODE_SCHEMA)
