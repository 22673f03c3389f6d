"""PNG codec (r5): exact round-trip, EXACT cross-validation against the
JVM's javax.imageio in both directions (PNG is lossless, so byte equality —
a stronger contract than the JPEG codec's PSNR bound), per-filter defilter
coverage via hand-constructed bitstreams, and honest-failure markers."""

import struct
import zlib

import numpy as np
import pytest

from datasketches_pig_spark.imageops.png import png_decode, png_encode


def _synth(rng, w=57, h=43):
    # mix of smooth ramp (favors Sub/Up/Paeth filters) and noise blocks
    # (favors None) so the adaptive encoder exercises several filters
    x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    img = np.stack([x, x[::-1], np.full((h, w), 77.0)], axis=-1)
    img[h // 2 :, : w // 2] = rng.integers(0, 256, (h - h // 2, w // 2, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_roundtrip_exact():
    rng = np.random.default_rng(3)
    for w, h in [(57, 43), (8, 8), (1, 1), (64, 72), (3, 17)]:
        img = _synth(rng, w, h)
        assert np.array_equal(png_decode(png_encode(img)), img), (w, h)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _build_png(w, h, color, raw, depth=8, interlace=0, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_every_filter_type_defilters_exactly():
    """Hand-filter known pixels with each of the five filter types and
    assert the decoder reconstructs them exactly (the encoder's adaptive
    choice can't be forced, so construct the bitstreams directly)."""
    rng = np.random.default_rng(9)
    w, h, bpp = 11, 6, 3
    img = rng.integers(0, 256, (h, w, bpp)).astype(np.uint8)
    flat = img.reshape(h, w * bpp).astype(np.int32)
    for ftype in range(5):
        raw = bytearray()
        for y in range(h):
            line = flat[y]
            prev = flat[y - 1] if y else np.zeros(w * bpp, dtype=np.int32)
            left = np.zeros(w * bpp, dtype=np.int32)
            left[bpp:] = line[:-bpp]
            upleft = np.zeros(w * bpp, dtype=np.int32)
            upleft[bpp:] = prev[:-bpp]
            if ftype == 0:
                f = line
            elif ftype == 1:
                f = line - left
            elif ftype == 2:
                f = line - prev
            elif ftype == 3:
                f = line - ((left + prev) >> 1)
            else:
                p = left + prev - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
                )
                f = line - pred
            raw.append(ftype)
            raw.extend(((f & 0xFF).astype(np.uint8)).tobytes())
        dec = png_decode(_build_png(w, h, 2, bytes(raw)))
        assert np.array_equal(dec, img), f"filter {ftype}"


def test_color_types_gray_palette_alpha():
    w, h = 5, 4
    gray = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))
    dec = png_decode(_build_png(w, h, 0, raw))
    assert np.array_equal(dec, np.repeat(gray[..., None], 3, axis=2))

    # gray+alpha: alpha dropped
    ga = np.zeros((h, w, 2), dtype=np.uint8)
    ga[..., 0] = gray
    ga[..., 1] = 128
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(h))
    dec = png_decode(_build_png(w, h, 4, raw))
    assert np.array_equal(dec, np.repeat(gray[..., None], 3, axis=2))

    # RGBA: alpha dropped
    rng = np.random.default_rng(4)
    rgba = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    dec = png_decode(_build_png(w, h, 6, raw))
    assert np.array_equal(dec, rgba[..., :3])

    # palette
    plte = np.array([[250, 1, 2], [3, 250, 5], [6, 7, 250]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 1, 0]] * h, dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    dec = png_decode(_build_png(w, h, 3, raw, plte=plte.tobytes()))
    assert np.array_equal(dec, plte[idx])


def test_honest_failures():
    img = _synth(np.random.default_rng(0), 16, 16)
    blob = png_encode(img)
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"\x00" + blob[1:])
    # flip a data byte inside IDAT -> CRC mismatch
    bad = bytearray(blob)
    idat = blob.index(b"IDAT")
    bad[idat + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))
    raw = b"".join(b"\x00" + img.reshape(16, 48)[y].tobytes() for y in range(16))
    # interlace=1 with NON-interlaced data layout: Adam7 decode (r6) must
    # reject the wrong-sized pixel stream, not scatter garbage
    with pytest.raises(ValueError, match="Adam7"):
        png_decode(_build_png(16, 16, 2, raw, interlace=1))
    with pytest.raises(ValueError, match="interlace"):
        png_decode(_build_png(16, 16, 2, raw, interlace=2))
    with pytest.raises(NotImplementedError, match="depth"):
        png_decode(_build_png(16, 16, 2, raw, depth=4))
    # depth 16 is implemented (r6) - but the 8-bit data layout can't pass
    with pytest.raises(ValueError, match="mismatch"):
        png_decode(_build_png(16, 16, 2, raw, depth=16))
    with pytest.raises(ValueError, match="unknown PNG filter"):
        png_decode(_build_png(16, 16, 2, b"\x07" + raw[1:]))


def _jvm_tools(spark):
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    return jvm, gw


def _java_decode(spark, blob):
    jvm, gw = _jvm_tools(spark)
    bimg = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(blob))
    )
    assert bimg is not None, "javax.imageio could not parse the PNG"
    w, h = bimg.getWidth(), bimg.getHeight()
    arr = gw.new_array(jvm.int, w * h)
    bimg.getRGB(0, 0, w, h, arr, 0, w)
    px = np.array(list(arr), dtype=np.int64).reshape(h, w)
    return np.stack(
        [(px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF], axis=-1
    ).astype(np.uint8)


def _java_encode_png(spark, img):
    jvm, gw = _jvm_tools(spark)
    h, w = img.shape[:2]
    bimg = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    arr = gw.new_array(jvm.int, w * h)
    packed = (
        (img[..., 0].astype(np.int64) << 16)
        | (img[..., 1].astype(np.int64) << 8)
        | img[..., 2].astype(np.int64)
    ).reshape(-1)
    for i, v in enumerate(packed):
        arr[i] = int(v)
    bimg.setRGB(0, 0, w, h, arr, 0, w)
    bos = jvm.java.io.ByteArrayOutputStream()
    ok = jvm.javax.imageio.ImageIO.write(bimg, "png", bos)
    assert ok, "javax.imageio has no PNG writer?"
    return bytes(bos.toByteArray())


def test_cross_validation_vs_javax_imageio(spark):
    """Lossless ⇒ exact: our encoder's bitstream must decode to the exact
    pixels in the JDK's codec, and the JDK's bitstream in ours."""
    rng = np.random.default_rng(11)
    img = _synth(rng, 37, 29)
    assert np.array_equal(_java_decode(spark, png_encode(img)), img)
    assert np.array_equal(png_decode(_java_encode_png(spark, img)), img)


def test_png_rides_the_near_dup_operator(spark):
    """A PNG-payload corpus flows through the fused Arrow feature pass and
    the banded near-dup join exactly like raw formats — planted dup found."""
    from datasketches_pig_spark.imageops.features import image_near_pairs

    rng = np.random.default_rng(5)
    base = _synth(rng, 48, 32)
    shifted = np.clip(base.astype(np.int16) + 6, 0, 255).astype(np.uint8)
    rows = [
        (0, bytearray(png_encode(base)), "png", 48, 32),
        (1, bytearray(png_encode(shifted)), "png", 48, 32),
    ] + [
        (i, bytearray(png_encode(_synth(rng, 48, 32))), "png", 48, 32)
        for i in range(2, 10)
    ]
    df = spark.createDataFrame(
        rows, "image_id long, bytes binary, fmt string, width int, height int"
    )
    found = {(r.a, r.b) for r in image_near_pairs(df, max_hamming=3).collect()}
    assert (0, 1) in found


def test_png_roundtrip_property_random_images():
    """Hypothesis-style randomized depth (seeded numpy, no Spark): PNG is
    lossless, so encode→decode must be EXACT for arbitrary uint8 content —
    including flat, gradient, and noise images that steer the adaptive
    encoder through different per-row filter choices."""
    import numpy as np

    from datasketches_pig_spark.imageops.png import png_decode, png_encode

    rng = np.random.default_rng(99)
    cases = []
    for h, w in [(1, 1), (1, 17), (23, 3), (16, 16), (24, 31)]:
        cases.append(rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8))
    # flat + gradient images (Paeth/Sub/Up-friendly content)
    cases.append(np.full((9, 9, 3), 200, dtype=np.uint8))
    yy, xx = np.mgrid[0:20, 0:15]
    cases.append(
        np.stack([xx * 17 % 256, yy * 11 % 256, (xx + yy) * 7 % 256], axis=-1).astype(
            np.uint8
        )
    )
    for img in cases:
        dec = png_decode(png_encode(img))
        assert dec.dtype == np.uint8 and dec.shape == img.shape
        assert (dec == img).all(), f"lossless roundtrip broken at {img.shape}"


def _java_encode_png_interlaced(spark, img):
    jvm, gw = _jvm_tools(spark)
    h, w = img.shape[:2]
    bimg = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    arr = gw.new_array(jvm.int, w * h)
    packed = (
        (img[..., 0].astype(np.int64) << 16)
        | (img[..., 1].astype(np.int64) << 8)
        | img[..., 2].astype(np.int64)
    ).reshape(-1)
    for i, v in enumerate(packed):
        arr[i] = int(v)
    bimg.setRGB(0, 0, w, h, arr, 0, w)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    writer.setOutput(ios)
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(None, jvm.javax.imageio.IIOImage(bimg, None, None), param)
    writer.dispose()
    ios.close()
    return bytes(baos.toByteArray())


def test_adam7_interlaced_exact_vs_jdk(spark):
    """Adam7 decode (r6): the JDK PNG writer's progressive mode emits
    interlace method 1; PNG is lossless, so our decode must equal the
    source image EXACTLY.  Sizes cover empty passes (1x1, 3x3: several of
    the seven passes have no pixels), odd dims, and dims straddling the
    8x8 pass tile."""
    rng = np.random.default_rng(99)
    for h, w in ((16, 16), (13, 7), (1, 1), (3, 3), (9, 33), (2, 2), (8, 1)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob = _java_encode_png_interlaced(spark, img)
        # the writer really interlaced it (IHDR byte 12, after 8-byte sig +
        # 8-byte chunk header)
        assert blob[8 + 8 + 12] == 1
        assert np.array_equal(png_decode(blob), img), (h, w)


def test_png_16bit_gray_high_byte(spark):
    """16-bit PNG (r6): filters run on raw bytes at bpp = 2*channels; the
    8-bit output takes each big-endian sample's high byte — exactly what
    the JDK's 8-bit conversion of its own TYPE_USHORT_GRAY stream yields.
    Covers plain and Adam7 layouts."""
    jvm, gw = _jvm_tools(spark)
    rng = np.random.default_rng(1)
    for (h, w), inter in (((20, 27), False), ((20, 27), True), ((5, 3), True)):
        img16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
        bimg = jvm.java.awt.image.BufferedImage(w, h, 11)  # TYPE_USHORT_GRAY
        ras = bimg.getRaster()
        for y in range(h):
            for x in range(w):
                ras.setSample(x, y, 0, int(img16[y, x]))
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        writer.setOutput(ios)
        param = writer.getDefaultWriteParam()
        if inter:
            param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        writer.write(None, jvm.javax.imageio.IIOImage(bimg, None, None), param)
        writer.dispose()
        ios.close()
        blob = bytes(baos.toByteArray())
        assert blob[8 + 8 + 8] == 16  # IHDR bit depth
        out = png_decode(blob)
        assert np.array_equal(out[:, :, 0], (img16 >> 8).astype(np.uint8))
        assert np.array_equal(out[:, :, 0], out[:, :, 1])
