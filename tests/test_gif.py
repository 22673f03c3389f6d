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
