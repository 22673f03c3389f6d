"""Progressive JPEG decode (r6) — cross-validated against javax.imageio.

The JDK's JPEG writer emits a real multi-scan progressive stream
(spectral selection + successive approximation + per-scan DHT
redefinition — the IJG simple-progression script), and its reader is an
unrelated second implementation, so agreement here checks the whole
G.1.2 machinery: DC first/refine, AC first/refine, EOB runs, and the
non-interleaved per-component block rasters.

The strongest assertion is decoder-internal: a progressive and a baseline
encoding of the SAME image by the SAME writer carry identical quantized
coefficients, so our decode of both streams must be BIT-IDENTICAL — any
slip in coefficient accumulation order, Al shifts, or EOB-run bookkeeping
breaks exact equality even when pixel-space diffs would look small.
"""

import numpy as np
import pytest

from datasketches_pig_spark.imageops.jpeg import jpeg_decode


def _jdk_encode_rgb(spark, img, progressive, quality=0.85):
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    h, w = img.shape[:2]
    bimg = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    arr = gw.new_array(jvm.int, w * h)
    flat = (
        (img[:, :, 0].astype(np.int64) << 16)
        | (img[:, :, 1].astype(np.int64) << 8)
        | img[:, :, 2].astype(np.int64)
    ).ravel()
    for i, v in enumerate(flat):
        arr[i] = int(v)
    bimg.setRGB(0, 0, w, h, arr, 0, w)
    return _jdk_write(spark, bimg, progressive, quality)


def _jdk_encode_gray(spark, img2d, progressive, quality=0.85):
    jvm = spark._jvm
    h, w = img2d.shape
    bimg = jvm.java.awt.image.BufferedImage(w, h, 10)  # TYPE_BYTE_GRAY
    ras = bimg.getRaster()
    for y in range(h):
        for x in range(w):
            ras.setSample(x, y, 0, int(img2d[y, x]))
    return _jdk_write(spark, bimg, progressive, quality)


def _jdk_write(spark, bimg, progressive, quality):
    jvm = spark._jvm
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    writer.setOutput(ios)
    param = writer.getDefaultWriteParam()
    param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(float(quality))
    if progressive:
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


def _luma(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        32
        + 1.4 * xx
        + 0.8 * yy
        + 40 * np.sin(xx / 6.0)
        + 30 * np.cos(yy / 4.0)
        + rng.normal(0, 6, (h, w))
    ).clip(0, 255).astype(np.uint8)


def _is_progressive(blob):
    return b"\xff\xc2" in blob


def test_progressive_matches_jdk_flat_chroma(spark):
    """Gray-content RGB (flat chroma kills the fancy-vs-replication chroma
    upsampling difference): our decode of the JDK's progressive stream must
    match the JDK's own decode within IDCT rounding (±1)."""
    luma = _luma(56, 80, 42)
    img = np.stack([luma, luma, luma], axis=-1)
    blob = _jdk_encode_rgb(spark, img, progressive=True)
    assert _is_progressive(blob)  # the writer actually emitted SOF2
    ours = jpeg_decode(blob)
    theirs = _jdk_decode_rgb(spark, blob)
    assert ours.shape == theirs.shape
    assert np.abs(ours.astype(np.int64) - theirs.astype(np.int64)).max() <= 1


def test_progressive_equals_baseline_bit_identical(spark):
    """Progressive and baseline encodings of the same image by the same
    writer quantize to the same coefficients — our decode of both streams
    must be exactly equal (full color, odd dims: exercises 4:2:0 MCU
    padding vs the non-interleaved ceil-dims AC rasters)."""
    rng = np.random.default_rng(7)
    h, w = 57, 81
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (128 + 80 * np.sin(xx / 5.0) + rng.normal(0, 5, (h, w))).clip(0, 255),
            (100 + 1.6 * yy + 50 * np.cos(xx / 7.0)).clip(0, 255),
            (60 + 0.5 * xx + 60 * np.sin(yy / 3.0)).clip(0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    pb = _jdk_encode_rgb(spark, img, progressive=True)
    bb = _jdk_encode_rgb(spark, img, progressive=False)
    assert _is_progressive(pb) and not _is_progressive(bb)
    assert np.array_equal(jpeg_decode(pb), jpeg_decode(bb))


def test_grayscale_progressive_matches_jdk_raster(spark):
    """Single-component progressive (non-interleaved DC scans too).
    Compare against the JDK reader's RAW raster — its getRGB applies a
    linear-gray→sRGB colorspace conversion that has nothing to do with
    JPEG decoding."""
    jvm = spark._jvm
    luma = _luma(40, 48, 11)
    blob = _jdk_encode_gray(spark, luma, progressive=True)
    assert _is_progressive(blob)
    ours = jpeg_decode(blob)
    bimg = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(blob))
    )
    ras = bimg.getRaster()
    raw = np.zeros(luma.shape, dtype=np.int64)
    for y in range(luma.shape[0]):
        for x in range(luma.shape[1]):
            raw[y, x] = ras.getSample(x, y, 0)
    assert np.abs(ours[:, :, 0].astype(np.int64) - raw).max() <= 1


def test_progressive_truncation_raises(spark):
    """Honest-failure contract extends to progressive payloads: any byte
    truncation raises (mid-marker, mid-entropy, or at a scan boundary —
    the valid-prefix case is caught by the missing-EOI rule), never a
    silently partial image."""
    luma = _luma(32, 40, 3)
    img = np.stack([luma, luma, luma], axis=-1)
    blob = _jdk_encode_rgb(spark, img, progressive=True)
    full = jpeg_decode(blob)
    step = max(1, len(blob) // 60)
    for cut in range(4, len(blob) - 1, step):
        try:
            out = jpeg_decode(blob[:cut])
        except (ValueError, NotImplementedError):
            continue
        raise AssertionError(
            f"truncation at byte {cut}/{len(blob)} decoded silently "
            f"(shape {out.shape} vs full {full.shape})"
        )


def test_ac_first_zrl_past_band_raises(monkeypatch):
    """A ZRL run that steps past Se is a corrupt stream; the first-scan AC
    path must raise like the baseline path does, not exit the coefficient
    loop silently with a wrong block (ADVICE r6)."""
    from datasketches_pig_spark.imageops import jpeg as J

    # stub the Huffman layer: emit ZRL (0xF0) forever
    monkeypatch.setattr(J, "_decode_symbol", lambda r, t: 0xF0)
    blk = np.zeros(64, dtype=np.int32)
    with pytest.raises(ValueError, match="AC run past block end"):
        J._ac_unit_first(blk, r=None, act=None, ss=1, se=5, al=0, eobrun=0)
