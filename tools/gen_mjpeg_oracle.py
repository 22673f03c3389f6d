"""Generate the VALUES oracle for the `dedup_mjpeg` gate query.

Independence argument (same structure as gen_jpeg_oracle.py /
gen_adpcm_oracle.py): the corpus definition (`data/videos.py` frame plans →
rawrgb / MJPEG-AVI payloads) is the shared *input*.  Everything the query
computes FROM those bytes is replicated independently here:

- container: a fresh scalar RIFF/AVI chunk walk below — no imports from
  ``videoops``;
- frame decode: javax.imageio (a second, unrelated JPEG implementation)
  for MJPEG payloads; a fresh scalar byte-reshape for rawrgb;
- dHash: fresh scalar code (shared with gen_jpeg_oracle — itself
  independent of ``imageops``);
- pairing: brute-force per-video distinct-hash set intersections, not the
  salted bucket join.

The generator REFUSES to emit if any frame's dHash differs between the
JDK decode and the engine decode (``videoops.frames.decode_frames``) —
a pass therefore certifies container interop, per-frame decoder interop,
AND bucket-join completeness.

Usage:  python tools/gen_mjpeg_oracle.py   (prints the SQL; goes into
queries.py::SQL_DEDUP_MJPEG)
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.gen_jpeg_oracle import _java_decode, _scalar_dhash  # noqa: E402

N_VIDEOS = 120
MIN_SHARED = 2


def scalar_avi_jpeg_chunks(blob: bytes) -> list[bytes]:
    """Fresh RIFF/AVI walk: return the raw JPEG bytes of every 00dc/00db
    chunk, in order.  Recurses into LIST chunks like a real parser."""
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI ", "not RIFF/AVI"
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = blob[pos : pos + 4]
            (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
            if cid == b"LIST":
                walk(pos + 12, pos + 8 + size)
            elif cid in (b"00dc", b"00db") and size:
                frames.append(blob[pos + 8 : pos + 8 + size])
            pos += 8 + size + (size & 1)

    walk(12, len(blob))
    return frames


def main() -> None:
    from datasketches_pig_spark.data.videos import synth_video_bytes
    from datasketches_pig_spark.session import get_spark
    from datasketches_pig_spark.videoops.frames import decode_frames

    spark = get_spark("gen-mjpeg-oracle", cores=2, shuffle_partitions=2)

    hash_sets: dict[int, set[int]] = {}
    n_mixed = 0
    for vid in range(N_VIDEOS):
        blob, codec, w, h = synth_video_bytes(vid)
        if codec == "mjpeg_avi":
            n_mixed += 1
            jpegs = scalar_avi_jpeg_chunks(blob)
            frames = [_java_decode(spark, j) for j in jpegs]
        else:
            arr = np.frombuffer(blob, dtype=np.uint8)
            assert len(arr) % (w * h * 3) == 0
            frames = list(arr.reshape(-1, h, w, 3))
        hashes = {_scalar_dhash(f) for f in frames}
        # cross-check: the engine's decode path yields the same hash set
        ours = decode_frames(blob, codec, w, h)
        assert len(ours) == len(frames), f"frame count differs on video {vid}"
        ours_hashes = {_scalar_dhash(f) for f in ours}
        assert ours_hashes == hashes, (
            f"decoder dHash disagreement on video {vid} ({codec})"
        )
        hash_sets[vid] = hashes
    assert 0 < n_mixed < N_VIDEOS, "corpus is not codec-mixed"

    rows = []
    for a in range(N_VIDEOS):
        for b in range(a + 1, N_VIDEOS):
            shared = len(hash_sets[a] & hash_sets[b])
            if shared >= MIN_SHARED:
                rows.append((a, b, shared))

    planted = [(d - 2, d) for d in range(N_VIDEOS) if d % 5 == 4]
    got = {(a, b) for a, b, _ in rows}
    missing = [p for p in planted if p not in got]
    assert not missing, f"planted pairs missing: {missing}"
    from datasketches_pig_spark.data.videos import synth_video_bytes as _svb

    mixed_pairs = 0
    for a, b in planted:
        ca = synth_video_bytes(a)[1]
        cb = synth_video_bytes(b)[1]
        if ca != cb:
            mixed_pairs += 1
    assert mixed_pairs == len(planted), "planted pairs do not all mix codecs"

    print(f"-- {len(rows)} pairs ({len(planted)} planted, all codec-mixed);"
          f" min_shared {MIN_SHARED}")
    print("SQL_DEDUP_MJPEG = \"\"\"")
    print(
        "SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, "
        "CAST(shared_frames AS BIGINT) AS shared_frames FROM (VALUES"
    )
    print(",\n".join(f"  ({a}, {b}, {s})" for a, b, s in sorted(rows)))
    print(") t(a, b, shared_frames)")
    print("\"\"\"")
    spark.stop()


if __name__ == "__main__":
    main()
