"""Image codec layer — pure-numpy encode/decode, vectorized per batch.

Images are opaque ``binary`` columns with typed metadata (format, width,
height, channels).  Three formats are fully implemented in-numpy (no
imaging libraries in this container):

* ``rgb8``  — headerless interleaved uint8 RGB, shape from metadata.
* ``ppm``   — binary PPM (P6), the classic self-describing RGB container.
* ``jpeg``  — baseline sequential DCT (``imageops/jpeg.py``): canonical
  Huffman + vectorized 8×8 (I)DCT, 4:4:4/4:2:2/4:2:0, restart markers;
  cross-validated both directions against the JVM's ``javax.imageio``
  codec (tests/test_jpeg.py).  Progressive/arithmetic JPEG raises
  ``NotImplementedError`` naming the marker.
* ``png``   — stdlib-zlib inflate + full filter set (``imageops/png.py``);
  lossless, so cross-validation vs javax.imageio is EXACT equality both
  directions (tests/test_png.py).  Adam7/16-bit raise
  ``NotImplementedError``.

Formats needing external codecs (webp/…) are registered stubs raising
``NotImplementedError`` — the Spark-side plumbing (schema, dispatch, Arrow
batching) treats them identically, so wiring Pillow/libvips on a real
cluster is a local change to this file only.
"""

from __future__ import annotations

import numpy as np

STUB_FORMATS = ("webp", "tiff")


def rgb8_encode(img: np.ndarray) -> bytes:
    """uint8 HxWx3 → headerless interleaved bytes."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("rgb8 expects uint8 HxWx3")
    return img.tobytes()


def rgb8_decode(blob: bytes, width: int, height: int) -> np.ndarray:
    arr = np.frombuffer(blob, dtype=np.uint8)
    if len(arr) != width * height * 3:
        raise ValueError(
            f"rgb8 payload is {len(arr)} bytes, expected {width * height * 3}"
        )
    return arr.reshape(height, width, 3)


def ppm_encode(img: np.ndarray) -> bytes:
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("ppm expects uint8 HxWx3")
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def ppm_decode(blob: bytes) -> np.ndarray:
    if not blob.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header: magic, whitespace-separated width height maxval, single ws, data
    parts: list[int] = []
    pos = 2
    while len(parts) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment line
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    data = np.frombuffer(blob, dtype=np.uint8, offset=pos, count=w * h * 3)
    return data.reshape(h, w, 3)


def decode_image(
    blob: bytes,
    fmt: str,
    width: int,
    height: int,
    decoders: dict | None = None,
) -> np.ndarray:
    """Dispatch by format tag → uint8 HxWx3.

    ``decoders`` is an external-decoder table (format tag → callable, see
    ``datasketches_pig_spark/decoders.py``) consulted before the stub raise;
    Spark kernels pass the plan-build-time registry snapshot, ``None`` reads
    the live process-local registry."""
    if fmt == "rgb8":
        return rgb8_decode(blob, width, height)
    if fmt == "ppm":
        return ppm_decode(blob)
    if fmt == "jpeg":
        from datasketches_pig_spark.imageops.jpeg import jpeg_decode

        return jpeg_decode(blob)
    if fmt == "png":
        from datasketches_pig_spark.imageops.png import png_decode

        return png_decode(blob)
    if fmt == "gif":
        from datasketches_pig_spark.imageops.gif import gif_decode

        return gif_decode(blob)
    from datasketches_pig_spark import decoders as _reg

    table = decoders if decoders is not None else _reg.image_decoder_snapshot()
    fn = table.get(fmt)
    if fn is not None:
        return _reg.validate_image(fn(blob, width, height), fmt)
    if fmt in STUB_FORMATS:
        raise NotImplementedError(
            f"image codec '{fmt}' needs an external decoder: register one "
            "with datasketches_pig_spark.decoders.register_image_decoder("
            f"'{fmt}', fn) before building the pipeline"
        )
    raise ValueError(f"unknown image format {fmt!r}")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — index arithmetic only, no imaging libs."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def to_gray(img: np.ndarray) -> np.ndarray:
    """uint8 HxWx3 → float32 luma (ITU-R 601 weights)."""
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(np.float32)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: 9x8 grayscale, bit = left<right — the standard
    perceptual near-dup fingerprint (robust to resize/brightness shifts)."""
    g = to_gray(resize_nearest(img, 9, 8))
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1)
    return int((bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
