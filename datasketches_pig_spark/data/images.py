"""Deterministic synthetic JPEG image corpus for the compressed-media
near-dup gate query (``queries.py::q_dedup_jpeg``).

The driver's parquet tables carry no media columns, so — like the CJK
corpus that ``dedup_minhash_cjk`` derives from ``documents`` via
``translate`` — the image corpus is derived deterministically from
``documents.doc_id``: every engine (Spark query, oracle generator) that
starts from the same ids reconstructs bit-identical JPEG bytes.

Construction is chosen so the 64-bit dHash is *bit-exact across JPEG
decoders* (ours and javax.imageio), which is what makes a VALUES oracle
stable:

- the image is an 8x9 grid of 8x8-pixel flat gray cells, so cell corners
  line up with JPEG block boundaries and each block is DC-only
  (quantization error at quality 90 stays within a few gray levels);
- cell levels come from {32, 96, 160, 224} with horizontally adjacent
  cells always at *different* levels — every dHash comparison sees a
  >=64-level margin, orders of magnitude above the codec noise;
- ``codecs.resize_nearest(img, 9, 8)`` samples exactly the top-left pixel
  of each cell (72 = 9*8, 64 = 8*8), so the hash reads one flat-block
  pixel per cell.

Planted near-dups: for ``doc_id % 5 == 4`` the image copies the cell grid
of ``doc_id - 2`` with one or two cells re-leveled (keeping the adjacency
margin), flipping at most 2 dHash bits per cell — pairs land at Hamming
<= 4 while independent images sit near the ~32-bit expectation.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyspark.sql.functions as F

GRID_H, GRID_W = 8, 9  # dHash geometry: 9x8 grayscale -> 8x8 comparisons
CELL = 8  # pixels per cell edge; aligns cells with JPEG 8x8 blocks
WIDTH, HEIGHT = GRID_W * CELL, GRID_H * CELL
LEVELS = np.array([32, 96, 160, 224], dtype=np.uint8)
JPEG_QUALITY = 90

IMAGE_SCHEMA = "image_id long, bytes binary, fmt string, width int, height int"


def _base_cells(doc_id: int) -> np.ndarray:
    """(GRID_H, GRID_W) level-index grid; horizontally adjacent cells always
    differ (next = prev + 1 + u mod 4, u in {0,1,2})."""
    rng = np.random.default_rng(doc_id * 9973 + 17)
    idx = np.empty((GRID_H, GRID_W), dtype=np.int64)
    idx[:, 0] = rng.integers(0, 4, size=GRID_H)
    steps = rng.integers(1, 4, size=(GRID_H, GRID_W - 1))
    for c in range(1, GRID_W):
        idx[:, c] = (idx[:, c - 1] + steps[:, c - 1]) % 4
    return idx


def image_cells(doc_id: int) -> np.ndarray:
    """Level-index grid for one image; planted near-dup rule documented in
    the module docstring."""
    if doc_id >= 4 and doc_id % 5 == 4:
        cells = _base_cells(doc_id - 2)
        rng = np.random.default_rng(doc_id * 9973 + 29)
        for _ in range(1 + doc_id % 2):  # 1 or 2 cell edits
            r = int(rng.integers(0, GRID_H))
            c = int(rng.integers(0, GRID_W))
            banned = {int(cells[r, c])}
            if c > 0:
                banned.add(int(cells[r, c - 1]))
            if c < GRID_W - 1:
                banned.add(int(cells[r, c + 1]))
            for k in range(1, 4):  # 4 levels, <=3 banned: always succeeds
                cand = (int(cells[r, c]) + k) % 4
                if cand not in banned:
                    cells[r, c] = cand
                    break
        return cells
    return _base_cells(doc_id)


def render_cells(cells: np.ndarray) -> np.ndarray:
    """Level-index grid -> (HEIGHT, WIDTH, 3) uint8 gray image."""
    plane = np.repeat(np.repeat(LEVELS[cells], CELL, axis=0), CELL, axis=1)
    return np.stack([plane, plane, plane], axis=-1)


def synth_image(doc_id: int) -> np.ndarray:
    return render_cells(image_cells(doc_id))


def synth_jpeg_bytes(doc_id: int) -> bytes:
    from datasketches_pig_spark.imageops.jpeg import jpeg_encode

    return jpeg_encode(synth_image(doc_id), quality=JPEG_QUALITY, subsample=False)


def synth_jpeg_frame(ids_df, id_col: str = "doc_id"):
    """DataFrame of ids -> (image_id, bytes, fmt='jpeg', width, height);
    JPEG encoding runs executor-side in one Arrow pass (the driver never
    sees a pixel — same no-driver-data-path rule as the clip generator,
    ``data/clips.py``)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "image_id": ids.to_numpy(),
                    "bytes": [synth_jpeg_bytes(int(i)) for i in ids],
                    "fmt": "jpeg",
                    "width": np.int32(WIDTH),
                    "height": np.int32(HEIGHT),
                }
            )

    # spread the synth work: the id frame usually arrives as one filtered
    # parquet partition, which would serialize the per-item codec chain
    # (and everything fused downstream of it) into one task
    par = ids_df.sparkSession.sparkContext.defaultParallelism
    ids_df = ids_df.select(id_col).repartition(par, F.col(id_col))
    return ids_df.mapInPandas(run, schema=IMAGE_SCHEMA)
