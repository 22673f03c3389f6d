"""GIF decode (r6) — cross-validated against the JDK's javax.imageio GIF
reader.  Palette lookup is lossless, so agreement is EXACT equality; the
JDK writer's progressive mode emits the 4-pass row interlace, covering
that path with real third-party bitstreams."""

import numpy as np
import pytest

from datasketches_pig_spark.imageops.codecs import decode_image
from datasketches_pig_spark.imageops.gif import _lzw_decode, gif_decode


def _jdk_encode_gif(spark, img, interlaced):
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    h, w = img.shape[:2]
    bimg = jvm.java.awt.image.BufferedImage(w, h, 1)
    arr = gw.new_array(jvm.int, w * h)
    flat = (
        (img[:, :, 0].astype(np.int64) << 16)
        | (img[:, :, 1].astype(np.int64) << 8)
        | img[:, :, 2].astype(np.int64)
    ).ravel()
    for i, v in enumerate(flat):
        arr[i] = int(v)
    bimg.setRGB(0, 0, w, h, arr, 0, w)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    param = writer.getDefaultWriteParam()
    if interlaced:
        param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(None, jvm.javax.imageio.IIOImage(bimg, None, None), param)
    writer.dispose()
    ios.close()
    return bytes(baos.toByteArray())


def _jdk_decode_rgb(spark, blob):
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    bimg = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(blob))
    )
    assert bimg is not None
    w, h = bimg.getWidth(), bimg.getHeight()
    arr = gw.new_array(jvm.int, w * h)
    bimg.getRGB(0, 0, w, h, arr, 0, w)
    px = np.array(list(arr), dtype=np.int64).reshape(h, w)
    return np.stack(
        [(px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF], axis=-1
    ).astype(np.uint8)


def _palette_image(rng, h, w, n_colors=12):
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


def test_gif_exact_vs_jdk(spark):
    """Non-interlaced and interlaced JDK-written GIFs decode exactly equal
    to both the JDK reader's output and the (palette-exact) source image,
    across odd dims and the interlace pass boundaries."""
    rng = np.random.default_rng(9)
    for (h, w), inter in [
        ((24, 31), False),
        ((24, 31), True),
        ((7, 5), False),
        ((64, 40), True),
        ((1, 1), False),
        ((9, 3), True),
    ]:
        img = _palette_image(rng, h, w)
        blob = _jdk_encode_gif(spark, img, inter)
        ours = gif_decode(blob)
        assert np.array_equal(ours, _jdk_decode_rgb(spark, blob)), (h, w, inter)
        assert np.array_equal(ours, img), (h, w, inter)
        # the dispatch routes gif natively now (no registry needed)
        assert np.array_equal(decode_image(blob, "gif", w, h), img)


def test_gif_truncation_raises(spark):
    """Any byte truncation raises cleanly — header, color table, LZW data
    and terminator cuts included."""
    rng = np.random.default_rng(4)
    img = _palette_image(rng, 21, 17)
    blob = _jdk_encode_gif(spark, img, False)
    gif_decode(blob)  # sanity
    step = max(1, len(blob) // 70)
    for cut in range(1, len(blob) - 1, step):
        with pytest.raises(ValueError):
            gif_decode(blob[:cut])


def test_gif_lzw_edge_cases():
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="minimum code size"):
        _lzw_decode(b"\x00", 1, 4)
    # 9..11 used to fall through to the base-dictionary build and die with a
    # generic "bytes must be in range(0, 256)" — GIF palettes cap at 256
    # entries, so an oversized code size is corrupt and must raise the
    # codec's own named error
    for bad in (9, 10, 11, 12):
        with pytest.raises(ValueError, match="minimum code size"):
            _lzw_decode(b"\x00", bad, 4)
    # a code beyond the dictionary is corrupt, not extensible
    with pytest.raises(ValueError, match="LZW"):
        # min=2: clear=4, eoi=5; width 3. Emit clear(100b=4) then code 7
        # (111b) with an empty dictionary beyond the roots.
        _lzw_decode(bytes([0b00111100]), 2, 4)


def test_cross_format_near_dup_coclusters(spark):
    """Heterogeneous-crawl scenario: the SAME margin-robust source image
    stored as baseline JPEG (our encoder), PNG (lossless) and GIF
    (JDK-written, palette-exact) must land in one near-dup cluster through
    the REAL operator (fused decode → dHash → Manku banding → verify),
    while different source images stay apart.  This is the property the
    r6 format work exists for — format-invariant perceptual identity."""
    import pandas as pd

    from datasketches_pig_spark.data.images import synth_image
    from datasketches_pig_spark.imageops.features import image_near_pairs
    from datasketches_pig_spark.imageops.jpeg import jpeg_encode
    from datasketches_pig_spark.imageops.png import png_encode

    rows = []
    n_src = 6
    for src in range(n_src):
        img = synth_image(src * 5)  # % 5 != 4: all sources distinct
        h, w = img.shape[:2]
        variants = [
            ("jpeg", jpeg_encode(img, 90)),
            ("png", png_encode(img)),
            ("gif", _jdk_encode_gif(spark, img, interlaced=bool(src % 2))),
        ]
        for j, (fmt, blob) in enumerate(variants):
            rows.append((src * 10 + j, blob, fmt, w, h))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "fmt", "width", "height"])
    ).repartition(4)
    pairs = image_near_pairs(df, max_hamming=4).collect()
    got = {(min(r["a"], r["b"]), max(r["a"], r["b"])) for r in pairs}
    for src in range(n_src):
        ids = [src * 10 + j for j in range(3)]
        for i in range(3):
            for j in range(i + 1, 3):
                assert (ids[i], ids[j]) in got, f"missing {ids[i]}-{ids[j]}"
    # no cross-source pair
    for a, b in got:
        assert a // 10 == b // 10, f"false positive pair {a}-{b}"


# ---------------------------------------------------------------------------
# r7: animated GIF — full compositing with disposal methods
# ---------------------------------------------------------------------------

from datasketches_pig_spark.imageops.gif import gif_decode_frames, gif_encode


def _jdk_encode_gif_sequence(spark, imgs):
    """JDK writeToSequence — third-party animated bitstreams."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(None)
    for img in imgs:
        h, w = img.shape[:2]
        bimg = jvm.java.awt.image.BufferedImage(w, h, 1)
        arr = gw.new_array(jvm.int, w * h)
        flat = (
            (img[:, :, 0].astype(np.int64) << 16)
            | (img[:, :, 1].astype(np.int64) << 8)
            | img[:, :, 2].astype(np.int64)
        ).ravel()
        for i, v in enumerate(flat):
            arr[i] = int(v)
        bimg.setRGB(0, 0, w, h, arr, 0, w)
        writer.writeToSequence(
            jvm.javax.imageio.IIOImage(bimg, None, None),
            writer.getDefaultWriteParam(),
        )
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    return bytes(baos.toByteArray())


def _reference_composite(w, h, palette, frames, bg_idx=0):
    """Independent scalar compositor over the ENCODER'S INPUTS (ground
    truth, no GIF parsing) — the decoder must reproduce these canvases."""
    palette = np.asarray(palette, dtype=np.uint8)
    bg = palette[bg_idx] if bg_idx < len(palette) else np.zeros(3, np.uint8)
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    canvas[:] = bg
    out = []
    for fr in frames:
        idx = np.asarray(fr["idx"], dtype=np.uint8)
        ih, iw = idx.shape
        x, y = int(fr.get("x", 0)), int(fr.get("y", 0))
        disposal = int(fr.get("disposal", 0))
        transparent = fr.get("transparent")
        saved = canvas.copy()
        for r in range(ih):
            for c in range(iw):
                if transparent is not None and idx[r, c] == transparent:
                    continue
                canvas[y + r, x + c] = palette[idx[r, c]]
        out.append(canvas.copy())
        if disposal == 2:
            canvas[y : y + ih, x : x + iw] = bg
        elif disposal == 3:
            canvas = saved
    return np.stack(out)


def test_gif_animation_disposal_methods():
    """Partial-region frames across all disposal methods + transparency,
    decoded canvases exactly equal to an independent scalar compositor
    driven by the encoder's ground-truth inputs."""
    rng = np.random.default_rng(77)
    w, h = 19, 13
    palette = rng.integers(0, 256, (11, 3), dtype=np.uint8)
    frames = [
        {"idx": rng.integers(0, 11, (h, w), dtype=np.uint8)},  # full base
        # draw-over partial region, keep (disposal 1)
        {"idx": rng.integers(0, 11, (5, 7), dtype=np.uint8),
         "x": 3, "y": 2, "disposal": 1},
        # restore-to-background region (disposal 2)
        {"idx": rng.integers(0, 11, (4, 6), dtype=np.uint8),
         "x": 9, "y": 6, "disposal": 2},
        # restore-to-previous (disposal 3): this frame must not leak into 5
        {"idx": rng.integers(0, 11, (6, 5), dtype=np.uint8),
         "x": 1, "y": 5, "disposal": 3},
        # transparency: index 4 pixels keep the prior canvas
        {"idx": rng.integers(0, 11, (h, w), dtype=np.uint8),
         "transparent": 4, "interlace": True},
    ]
    blob = gif_encode(w, h, palette, frames, bg_idx=2)
    got = gif_decode_frames(blob)
    want = _reference_composite(w, h, palette, frames, bg_idx=2)
    assert got.shape == (5, h, w, 3)
    for i in range(5):
        assert np.array_equal(got[i], want[i]), f"frame {i}"
    # first-frame contract: gif_decode == frame 0, bit for bit
    assert np.array_equal(gif_decode(blob), want[0])


def test_gif_animated_vs_jdk_sequence(spark):
    """JDK writeToSequence animated streams (real third-party bitstreams)
    decode to the exact source frames; full-canvas opaque frames make
    raw == composited, so equality is strict."""
    rng = np.random.default_rng(21)
    imgs = [_palette_image(rng, 18, 23, n_colors=9) for _ in range(4)]
    blob = _jdk_encode_gif_sequence(spark, imgs)
    got = gif_decode_frames(blob)
    assert got.shape[0] == 4
    for i, img in enumerate(imgs):
        assert np.array_equal(got[i], img), f"frame {i}"


def test_gif_encoder_bitstream_vs_jdk(spark):
    """Our encoder's output is a valid GIF to a second implementation: the
    JDK reader decodes gif_encode streams to the exact palette lookup,
    including a >256-LZW-code frame that forces a width bump."""
    rng = np.random.default_rng(5)
    # 31x37 = 1147 pixels -> literal codes walk width 5..11 territory
    palette = rng.integers(0, 256, (17, 3), dtype=np.uint8)
    idx = rng.integers(0, 17, (31, 37), dtype=np.uint8)
    blob = gif_encode(37, 31, palette, [{"idx": idx}])
    assert np.array_equal(_jdk_decode_rgb(spark, blob), palette[idx])
    assert np.array_equal(gif_decode(blob), palette[idx])


def test_gif_animation_truncation_and_dispatch():
    """Multi-frame honesty: missing trailer raises (never a silently
    partial animation) while the image path's first-frame early return
    still stands; reserved disposal raises; gif_anim rides the video
    frame dispatch with dim validation."""
    rng = np.random.default_rng(13)
    w, h = 11, 9
    palette = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    frames = [{"idx": rng.integers(0, 6, (h, w), dtype=np.uint8)}
              for _ in range(3)]
    blob = gif_encode(w, h, palette, frames)
    assert gif_decode_frames(blob).shape == (3, h, w, 3)

    # cut the trailer: animation decode raises, first-frame decode works
    cut = blob[:-1]
    with pytest.raises(ValueError, match="no trailer"):
        gif_decode_frames(cut)
    assert np.array_equal(gif_decode(cut), gif_decode(blob))

    # reserved disposal method is corrupt
    bad = gif_encode(w, h, palette, [{**frames[0], "disposal": 5}])
    with pytest.raises(ValueError, match="disposal"):
        gif_decode_frames(bad)

    from datasketches_pig_spark.videoops.frames import decode_frames

    out = decode_frames(blob, "gif_anim", w, h)
    assert out.shape == (3, h, w, 3)
    with pytest.raises(ValueError, match="dim mismatch"):
        decode_frames(blob, "gif_anim", w + 1, h)


def test_gif_anim_gate_corpus_roundtrip():
    """data/videos.py gif corpus contract: the animated leg (delta
    bounding-box frames, disposal keep, interlaced base on d%4==3)
    composites back to synth_frames EXACTLY through the engine dispatch,
    and planted (d-2, d) pairs always mix raw<->gif."""
    from datasketches_pig_spark.data.videos import (
        synth_frames,
        synth_gif_video_bytes,
    )
    from datasketches_pig_spark.videoops.frames import decode_frames

    n_gif = 0
    for d in range(24):
        blob, codec, w, h = synth_gif_video_bytes(d)
        got = decode_frames(blob, codec, w, h)
        assert np.array_equal(got, synth_frames(d)), (d, codec)
        n_gif += codec == "gif_anim"
    assert 0 < n_gif < 24
    for d in range(4, 24, 5):
        assert synth_gif_video_bytes(d - 2)[1] != synth_gif_video_bytes(d)[1]


# hypothesis property: arbitrary animations roundtrip through
# gif_encode -> gif_decode_frames exactly equal to the independent
# reference compositor (random palettes, partial regions, disposal
# methods, transparency, interlace) — mirroring the reference repo's
# randomized TestNG depth on the codec surface.
from hypothesis import given, settings, strategies as st


@st.composite
def _animations(draw):
    w = draw(st.integers(1, 24))
    h = draw(st.integers(1, 20))
    n_pal = draw(st.integers(2, 32))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_pal, 3), dtype=np.uint8)
    frames = []
    for _ in range(draw(st.integers(1, 5))):
        iw = draw(st.integers(1, w))
        ih = draw(st.integers(1, h))
        fr = {
            "idx": rng.integers(0, n_pal, (ih, iw), dtype=np.uint8),
            "x": draw(st.integers(0, w - iw)),
            "y": draw(st.integers(0, h - ih)),
            "disposal": draw(st.integers(0, 3)),
            "interlace": draw(st.booleans()),
        }
        if draw(st.booleans()):
            fr["transparent"] = draw(st.integers(0, n_pal - 1))
        frames.append(fr)
    bg = draw(st.integers(0, n_pal - 1))
    return w, h, palette, frames, bg


@given(_animations())
@settings(max_examples=60, deadline=None)
def test_gif_animation_roundtrip_property(anim):
    w, h, palette, frames, bg = anim
    blob = gif_encode(w, h, palette, frames, bg_idx=bg)
    got = gif_decode_frames(blob)
    want = _reference_composite(w, h, palette, frames, bg_idx=bg)
    assert got.shape == want.shape
    assert np.array_equal(got, want)
    assert np.array_equal(gif_decode(blob), want[0])
