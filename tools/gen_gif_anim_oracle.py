"""Generate the VALUES oracle for the `dedup_gif_anim` gate query.

Independence argument (same structure as gen_mjpeg_oracle.py): the corpus
definition (`data/videos.py` frame plans → rawrgb / animated-GIF payloads)
is the shared *input*.  Everything the query computes FROM those bytes is
replicated independently here:

- GIF parse + LZW + disposal compositing: a fresh scalar implementation
  below — pure-Python list-of-lists canvas, big-int bit reader, dict-based
  LZW table — no imports from ``imageops``;
- a JDK cross-check on every animated payload's FIRST frame (full-canvas
  by corpus construction, so ImageIO's raw frame 0 == composited frame 0);
- dHash: fresh scalar code (shared with gen_jpeg_oracle — itself
  independent of ``imageops``);
- pairing: brute-force per-video distinct-hash set intersections, not the
  salted bucket join.

The generator REFUSES to emit if any frame differs between this scalar
decode and the engine decode (``videoops.frames.decode_frames``) — a pass
certifies the delta-frame disposal compositor, LZW width progression,
interlace, AND bucket-join completeness.

Usage:  python tools/gen_gif_anim_oracle.py   (prints the SQL; goes into
queries.py::SQL_DEDUP_GIF_ANIM)
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.gen_jpeg_oracle import _scalar_dhash  # noqa: E402

N_VIDEOS = 120
MIN_SHARED = 2


def _read_subblocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        ln = blob[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        parts.append(blob[pos : pos + ln])
        pos += ln


def _scalar_lzw(data: bytes, mc: int, expected: int) -> list[int]:
    """Fresh LZW: big-int bit extraction + dict table (the engine decoder
    streams bytes through an accumulator and a list table)."""
    big = int.from_bytes(data, "little")
    nbits = 8 * len(data)
    posb = 0
    clear, eoi = 1 << mc, (1 << mc) + 1
    width = mc + 1
    table: dict[int, tuple[int, ...]] = {i: (i,) for i in range(clear)}
    next_code = clear + 2
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while posb + width <= nbits:
        code = (big >> posb) & ((1 << width) - 1)
        posb += width
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            next_code = clear + 2
            width = mc + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)
            else:
                raise ValueError("scalar lzw: code beyond table")
            if next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out.extend(entry)
        prev = entry
    assert len(out) == expected, (len(out), expected)
    return out


def scalar_gif_frames(blob: bytes) -> list[np.ndarray]:
    """Fresh scalar GIF parse + disposal compositing."""
    assert blob[:6] in (b"GIF87a", b"GIF89a")
    w, h, flags, bg, _ = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = [tuple(blob[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    bg_rgb = gct[bg] if gct and bg < len(gct) else (0, 0, 0)
    canvas = [[bg_rgb] * w for _ in range(h)]
    frames: list[np.ndarray] = []
    disposal, transp = 0, None
    while True:
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            label = blob[pos]
            pos += 1
            data, pos = _read_subblocks(blob, pos)
            if label == 0xF9:
                disposal = (data[0] >> 2) & 7
                transp = data[3] if data[0] & 1 else None
            continue
        assert b0 == 0x2C, hex(b0)
        ix, iy, iw, ih, ifl = struct.unpack("<HHHHB", blob[pos : pos + 9])
        pos += 9
        ct = gct
        if ifl & 0x80:
            n = 2 << (ifl & 7)
            ct = [tuple(blob[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        mc = blob[pos]
        pos += 1
        data, pos = _read_subblocks(blob, pos)
        indices = _scalar_lzw(data, mc, iw * ih)
        if ifl & 0x40:
            order = [
                r
                for (s, st) in ((0, 8), (4, 8), (2, 4), (1, 2))
                for r in range(s, ih, st)
            ]
        else:
            order = list(range(ih))
        grid = [[0] * iw for _ in range(ih)]
        p = 0
        for r in order:
            for c in range(iw):
                grid[r][c] = indices[p]
                p += 1
        saved = [row[:] for row in canvas] if disposal == 3 else None
        for r in range(ih):
            for c in range(iw):
                v = grid[r][c]
                if transp is not None and v == transp:
                    continue
                canvas[iy + r][ix + c] = ct[v]
        frames.append(np.array(canvas, dtype=np.uint8))
        if disposal == 2:
            for r in range(ih):
                for c in range(iw):
                    canvas[iy + r][ix + c] = bg_rgb
        elif disposal == 3:
            canvas = saved
        disposal, transp = 0, None
    assert frames, "no frames"
    return frames


def main() -> None:
    from datasketches_pig_spark.data.videos import synth_gif_video_bytes
    from datasketches_pig_spark.session import get_spark
    from datasketches_pig_spark.videoops.frames import decode_frames
    from tools.gen_jpeg_oracle import _java_decode

    spark = get_spark("gen-gif-oracle", cores=2, shuffle_partitions=2)

    hash_sets: dict[int, set[int]] = {}
    n_gif = 0
    for vid in range(N_VIDEOS):
        blob, codec, w, h = synth_gif_video_bytes(vid)
        if codec == "gif_anim":
            n_gif += 1
            frames = scalar_gif_frames(blob)
            # third implementation on frame 0: the JDK reader's raw first
            # frame equals the composited one (full-canvas by construction)
            jdk0 = _java_decode(spark, blob)
            assert np.array_equal(jdk0, frames[0]), f"JDK frame-0 mismatch {vid}"
        else:
            arr = np.frombuffer(blob, dtype=np.uint8)
            assert len(arr) % (w * h * 3) == 0
            frames = list(arr.reshape(-1, h, w, 3))
        ours = decode_frames(blob, codec, w, h)
        assert len(ours) == len(frames), f"frame count differs on video {vid}"
        for i, f in enumerate(frames):
            assert np.array_equal(ours[i], f), (
                f"decoder disagreement on video {vid} frame {i} ({codec})"
            )
        hash_sets[vid] = {_scalar_dhash(f) for f in frames}
    assert 0 < n_gif < N_VIDEOS, "corpus is not codec-mixed"

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
    mixed = sum(
        1
        for a, b in planted
        if synth_gif_video_bytes(a)[1] != synth_gif_video_bytes(b)[1]
    )
    assert mixed == len(planted), "planted pairs do not all mix codecs"

    print(
        f"-- {len(rows)} pairs ({len(planted)} planted, all raw<->gif);"
        f" min_shared {MIN_SHARED}; {n_gif} animated payloads"
    )
    print('SQL_DEDUP_GIF_ANIM = """')
    print(
        "SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, "
        "CAST(shared_frames AS BIGINT) AS shared_frames FROM (VALUES"
    )
    print(",\n".join(f"  ({a}, {b}, {s})" for a, b, s in sorted(rows)))
    print(') t(a, b, shared_frames)')
    print('"""')
    spark.stop()


if __name__ == "__main__":
    main()
