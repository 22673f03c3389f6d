"""Generate the VALUES oracle for the `dedup_jpeg` gate query.

Independence argument: the corpus (synthetic cell grids JPEG-encoded by our
encoder) is the shared *input*, exactly like the shared parquet tables of
every other oracle.  Everything the query computes FROM those bytes is
replicated independently here:

- decode: the JDK's javax.imageio codec (a second, unrelated JPEG
  implementation), not ``imageops.jpeg.jpeg_decode``;
- dHash: fresh scalar code below (explicit pixel sampling at cell corners,
  ITU-R 601 luma, LSB-first bit packing) — no imports from ``imageops``;
- pairing: brute-force all-pairs popcount, not the Manku banded join.

So a pass means our decoder agrees with the JDK's on every corpus image
AND the banded candidate generation found every Hamming<=4 pair the
brute-force scan finds.

The generator also cross-checks our decoder's dHash per image and fails
loudly on any disagreement rather than emitting a decoder-dependent
oracle.

Usage:  python tools/gen_jpeg_oracle.py   (prints the SQL; paste into
queries.py::SQL_DEDUP_JPEG)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_IMAGES = 150
MAX_HAMMING = 4


def _java_decode(spark, blob: bytes) -> np.ndarray:
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    bimg = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(blob))
    )
    assert bimg is not None, "javax.imageio could not parse the bitstream"
    w, h = bimg.getWidth(), bimg.getHeight()
    arr = gw.new_array(jvm.int, w * h)
    bimg.getRGB(0, 0, w, h, arr, 0, w)
    px = np.array(list(arr), dtype=np.int64).reshape(h, w)
    return np.stack(
        [(px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF], axis=-1
    ).astype(np.uint8)


def _scalar_dhash(img: np.ndarray) -> int:
    """Independent dHash: 9x8 nearest-neighbor grid (top-left pixel of each
    cell for 72x64 input), luma compare left<right, LSB-first packing."""
    h, w = img.shape[:2]
    out = 0
    bit = 0
    for gy in range(8):
        y = gy * h // 8
        lum = []
        for gx in range(9):
            x = gx * w // 9
            r, g, b = (float(img[y, x, k]) for k in range(3))
            lum.append(0.299 * r + 0.587 * g + 0.114 * b)
        for gx in range(8):
            if lum[gx] < lum[gx + 1]:
                out |= 1 << bit
            bit += 1
    return out


def main() -> None:
    from datasketches_pig_spark.data.images import synth_image, synth_jpeg_bytes
    from datasketches_pig_spark.imageops.codecs import dhash64
    from datasketches_pig_spark.imageops.jpeg import jpeg_decode
    from datasketches_pig_spark.session import get_spark

    spark = get_spark("gen-jpeg-oracle", cores=4, shuffle_partitions=4)
    hashes: dict[int, int] = {}
    for doc_id in range(N_IMAGES):
        blob = synth_jpeg_bytes(doc_id)
        jdk = _scalar_dhash(_java_decode(spark, blob))
        ours = _scalar_dhash(jpeg_decode(blob))
        kernel = dhash64(jpeg_decode(blob))
        clean = _scalar_dhash(synth_image(doc_id))
        if not (jdk == ours == kernel == clean):
            raise SystemExit(
                f"dHash disagreement at doc_id={doc_id}: jdk={jdk:#x} "
                f"ours={ours:#x} kernel={kernel:#x} clean={clean:#x} — "
                "oracle would be decoder-dependent, refusing to emit"
            )
        hashes[doc_id] = jdk
    spark.stop()

    rows = []
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= MAX_HAMMING:
                rows.append((a, b, ham))
    rows.sort()
    planted = [(d - 2, d) for d in range(N_IMAGES) if d >= 4 and d % 5 == 4]
    missing = [p for p in planted if p not in {(a, b) for a, b, _ in rows}]
    if missing:
        raise SystemExit(f"planted dup pairs missing from brute force: {missing}")
    print(f"-- {len(rows)} pairs ({len(planted)} planted), max_hamming={MAX_HAMMING}")
    print("SQL_DEDUP_JPEG = \"\"\"")
    print(
        "SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, "
        "CAST(hamming AS INT) AS hamming FROM (VALUES"
    )
    body = ",\n".join(f"  ({a}, {b}, {h})" for a, b, h in rows)
    print(body)
    print(") t(a, b, hamming)")
    print("\"\"\"")


if __name__ == "__main__":
    main()
