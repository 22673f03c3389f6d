"""MJPEG-in-AVI video codec (`videoops/mjpeg.py`): container round-trips,
error paths, dHash stability through compression, and compressed-vs-raw
planted-dup recall through the full video near-dup operator."""

import numpy as np
import pytest

from datasketches_pig_spark.data.images import render_cells, image_cells
from datasketches_pig_spark.videoops.frames import decode_frames
from datasketches_pig_spark.videoops.mjpeg import mjpeg_decode, mjpeg_encode


def _margin_frames(ids):
    """Stack of dHash-margin frames (flat 8x8 cells, ≥64-level contrasts —
    the property the JPEG gate corpus proved keeps dHash bit-exact through
    baseline JPEG compression)."""
    return np.stack([render_cells(image_cells(i)) for i in ids])


def _noise_frames(rng, n, h, w):
    return rng.integers(0, 256, size=(n, h, w, 3)).astype(np.uint8)


def test_roundtrip_shape_count_and_psnr():
    rng = np.random.default_rng(5)
    # smooth content (JPEG-friendly): low-freq gradient + mild noise
    h, w, n = 48, 64, 7
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 80 * np.sin(xx / 17.0) * np.cos(yy / 13.0))[..., None]
    frames = np.clip(
        base + rng.normal(0, 4, size=(n, h, w, 3)), 0, 255
    ).astype(np.uint8)
    blob = mjpeg_encode(frames, fps=10, quality=90)
    dec = mjpeg_decode(blob)
    assert dec.shape == frames.shape and dec.dtype == np.uint8
    err = dec.astype(np.float64) - frames.astype(np.float64)
    psnr = 10 * np.log10(255.0**2 / max((err**2).mean(), 1e-12))
    assert psnr >= 30.0, f"PSNR {psnr:.1f} dB < 30"
    # genuinely compressed vs raw frames
    assert len(blob) < 0.5 * frames.nbytes


def test_decode_frames_dispatch_and_dim_validation():
    frames = _margin_frames(range(3))
    n, h, w = frames.shape[:3]
    blob = mjpeg_encode(frames)
    out = decode_frames(blob, "mjpeg_avi", w, h)
    assert out.shape == frames.shape
    with pytest.raises(ValueError, match="dim mismatch"):
        decode_frames(blob, "mjpeg_avi", w + 8, h)


def test_container_error_paths():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        mjpeg_decode(b"nope" * 8)
    # a WAV is RIFF but not AVI
    from datasketches_pig_spark.audioops.codecs import wav_encode_pcm16

    wav = wav_encode_pcm16(np.zeros(100, np.float32), 8000)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        mjpeg_decode(wav)
    # structurally valid AVI with no frame chunks
    import struct

    body = b"AVI " + b"JUNK" + struct.pack("<I", 4) + b"\x00" * 4
    empty = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="no MJPEG frame"):
        mjpeg_decode(empty)
    # encoder arg validation
    with pytest.raises(ValueError, match="uint8"):
        mjpeg_encode(np.zeros((2, 8, 8, 3), np.float32))
    with pytest.raises(ValueError, match="fps"):
        mjpeg_encode(_margin_frames([0]), fps=0)


def test_dhash_bit_exact_through_mjpeg_on_margin_frames():
    """Margin-cell frames keep their 64-bit dHash EXACT through the lossy
    codec — the invariant that makes raw↔compressed near-dup pairs land in
    the same exact-match frame bucket."""
    from datasketches_pig_spark.imageops.codecs import dhash64

    frames = _margin_frames(range(8))
    dec = mjpeg_decode(mjpeg_encode(frames))
    for i in range(len(frames)):
        assert dhash64(dec[i]) == dhash64(frames[i]), f"frame {i}"


def test_video_near_pairs_raw_vs_mjpeg_planted(spark):
    """End-to-end compressed-vs-raw recall: each planted dup pair is one
    rawrgb video and its MJPEG re-encode (same margin-cell frames).  The
    shared-frame bucket join must recover every planted pair and nothing
    across distinct frame sets."""
    from datasketches_pig_spark.videoops.frames import video_near_pairs

    rows = []
    n_videos, frames_per = 12, 6
    for v in range(n_videos):
        frames = _margin_frames(range(v * frames_per, (v + 1) * frames_per))
        h, w = frames.shape[1:3]
        rows.append((2 * v, frames.tobytes(), "rawrgb", w, h))
        rows.append((2 * v + 1, bytes(mjpeg_encode(frames)), "mjpeg_avi", w, h))
    vids = spark.createDataFrame(
        rows, "video_id long, bytes binary, codec string, width int, height int"
    )
    got = {
        (r["a"], r["b"])
        for r in video_near_pairs(vids, stride=1, min_shared_frames=2).collect()
    }
    want = {(2 * v, 2 * v + 1) for v in range(n_videos)}
    assert want <= got, f"missed planted raw↔mjpeg pairs: {want - got}"
    assert got == want, f"spurious cross-video pairs: {got - want}"


def test_video_gate_corpus_invariants():
    """data/videos.py contract: planted (d-2, d) pairs replay the frame plan
    (full for d%10==4, all-but-last for d%10==9), ALWAYS mix codecs, and
    non-planted videos share no frame ids."""
    from datasketches_pig_spark.data.videos import frame_plan, synth_video_bytes

    for d in range(4, 60, 5):
        a, b = frame_plan(d - 2), frame_plan(d)
        assert len(a) == len(b)
        if d % 10 == 4:
            assert a == b
        else:
            assert a[:-1] == b[:-1] and a[-1] != b[-1]
        assert synth_video_bytes(d - 2)[1] != synth_video_bytes(d)[1]
    # disjoint namespaces otherwise
    plans = {d: set(frame_plan(d)) for d in range(0, 30)}
    for x in plans:
        for y in plans:
            if x < y and not (y % 5 == 4 and y - 2 == x):
                assert not (plans[x] & plans[y]), (x, y)
