"""Shingling — transcript byte k-grams and PCM-derived feature-stream k-grams.

Everything here is vectorized numpy over Arrow batches; the per-clip Python is
bookkeeping only (offsets into concatenated arrays), mirroring the reference's
rule that values are hashed from their canonical byte representation with
MurmurHash3 seed 9001 (``pig/theta/DataToSketch.java:184-187``,
``dictionary.html:48-52``).

Audio features are designed to be invariant to the perturbation classes the
dup model defines (FIXTURES.md F1): peak-relative log-energy (gain ±1 dB and
µ-law re-encode safe), quarter-octave zero-crossing pitch levels (codec safe),
25 ms frames at 10 ms hop (pad/trim ≤ 50 ms only perturbs edge frames).
"""

from __future__ import annotations

import re

import numpy as np

from datasketches_pig_spark.config import DedupConfig
from datasketches_pig_spark.functions.murmur3 import murmur3_x64_128_fixed

_WS = re.compile(r"\s+")


def normalize_text(s: str) -> str:
    return _WS.sub(" ", s.strip().lower())


def text_shingle_hashes(
    texts: list[str | None], cfg: DedupConfig
) -> list[np.ndarray]:
    """Per text: uint64 hashes of its distinct byte k-grams (k=shingle_k_text).

    All k-grams across the batch are hashed in one fixed-length vectorized
    murmur call.  Texts shorter than k contribute one whole-string shingle.
    """
    k = cfg.shingle_k_text
    bufs: list[np.ndarray] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    short: list[tuple[int, bytes]] = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        raw = np.frombuffer(normalize_text(t).encode("utf-8"), dtype=np.uint8)
        if len(raw) == 0:
            continue
        if len(raw) < k:
            short.append((i, raw.tobytes()))
            continue
        n = len(raw) - k + 1
        # stride-trick window view → (n, k) grams
        grams = np.lib.stride_tricks.sliding_window_view(raw, k)
        bufs.append(grams)
        counts[i] = n

    out: list[np.ndarray] = [np.empty(0, dtype=np.uint64) for _ in texts]
    if bufs:
        allgrams = np.concatenate(bufs, axis=0)
        h1, _ = murmur3_x64_128_fixed(np.ascontiguousarray(allgrams), cfg.seed)
        pos = 0
        for i, c in enumerate(counts):
            if c:
                out[i] = np.unique(h1[pos : pos + c])
                pos += c
    from datasketches_pig_spark.functions.murmur3 import murmur3_x64_128

    for i, b in short:
        out[i] = np.array([murmur3_x64_128(b, cfg.seed)[0]], dtype=np.uint64)
    return out


# ---------------------------------------------------------------------------
# audio feature stream
# ---------------------------------------------------------------------------

def frame_symbols(pcm: np.ndarray, sr_hz: int, cfg: DedupConfig) -> np.ndarray:
    """PCM float32 → uint8 symbol stream (one symbol per 10 ms frame).

    symbol = pitch_level * 4 + energy_level
      pitch_level  : quarter-octave quantized frequency (0..23) from the
                     *interpolated* zero-crossing estimate — crossing count
                     minus one over the first→last crossing span, which is
                     phase-invariant (plain ZCR jitters ±1 crossing with frame
                     phase, a full quantization level at low frequencies)
      energy_level : peak-relative log-energy in 6 dB steps (0..3, 0 = peak)
                     → gain-invariant
    """
    frame = max(int(sr_hz * cfg.audio_frame_ms / 1000), 4)
    hop = max(int(sr_hz * cfg.audio_hop_ms / 1000), 1)
    n = len(pcm)
    if n < frame:
        pcm = np.pad(pcm, (0, frame - n))
        n = frame
    nf = 1 + (n - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(nf)[:, None]
    frames = pcm[idx]  # (nf, frame)

    energy = (frames.astype(np.float64) ** 2).mean(axis=1)
    log_e = np.log10(energy + 1e-12)
    e_rel = log_e - log_e.max()  # peak-relative → gain-invariant
    e_level = np.clip(np.round(-e_rel / 0.6), 0, 3).astype(np.uint8)  # 6 dB steps

    signs = frames >= 0.0
    cross = signs[:, 1:] != signs[:, :-1]
    n_cross = cross.sum(axis=1)
    first = np.argmax(cross, axis=1)
    last = cross.shape[1] - 1 - np.argmax(cross[:, ::-1], axis=1)
    span = np.maximum(last - first, 1)
    freq = np.where(n_cross >= 2, (n_cross - 1) * sr_hz / (2.0 * span), 0.0)
    pitch = np.clip(
        np.round(4.0 * np.log2(np.maximum(freq, 1.0) / 110.0)), 0, 23
    ).astype(np.uint8)
    return pitch * np.uint8(4) + e_level


def audio_symbols(pcm: np.ndarray, sr_hz: int, cfg: DedupConfig) -> np.ndarray:
    """PCM → run-length-encoded *note* symbols.

    Frame symbols are fragile exactly at note boundaries (frames straddling a
    transition), and those transitional k-grams dominate the distinct-shingle
    set.  Run-length encoding with a minimum run keeps only stable note
    symbols: runs shorter than ``audio_min_run`` frames are dropped, adjacent
    equal symbols then merge.  Pad/trim ≤ 50 ms shifts run lengths by a frame
    or two but leaves the note-symbol *sequence* intact — which is what gets
    shingled.
    """
    sym = frame_symbols(pcm, sr_hz, cfg)
    if len(sym) == 0:
        return sym
    change = np.flatnonzero(np.diff(sym.astype(np.int16)) != 0)
    starts = np.concatenate([[0], change + 1])
    ends = np.concatenate([change + 1, [len(sym)]])
    lengths = ends - starts
    keep = lengths >= cfg.audio_min_run
    runs = sym[starts[keep]]
    if len(runs) == 0:
        return runs
    # merge adjacent equal symbols exposed by dropped short runs
    dedup = np.concatenate([[True], runs[1:] != runs[:-1]])
    return runs[dedup]


def audio_shingle_hashes(
    pcms: list[np.ndarray | None], srs: list[int], cfg: DedupConfig
) -> list[np.ndarray]:
    """Per clip: uint64 hashes of distinct k-grams of its symbol stream."""
    k = cfg.shingle_k_audio
    bufs: list[np.ndarray] = []
    counts = np.zeros(len(pcms), dtype=np.int64)
    for i, pcm in enumerate(pcms):
        if pcm is None or len(pcm) == 0:
            continue
        sym = audio_symbols(pcm, int(srs[i]), cfg)
        if len(sym) < k:
            sym = np.pad(sym, (0, k - len(sym)))
        grams = np.lib.stride_tricks.sliding_window_view(sym, k)
        bufs.append(grams)
        counts[i] = grams.shape[0]

    out: list[np.ndarray] = [np.empty(0, dtype=np.uint64) for _ in pcms]
    if bufs:
        allgrams = np.concatenate(bufs, axis=0)
        h1, _ = murmur3_x64_128_fixed(np.ascontiguousarray(allgrams), cfg.seed)
        pos = 0
        for i, c in enumerate(counts):
            if c:
                out[i] = np.unique(h1[pos : pos + c])
                pos += c
    return out
