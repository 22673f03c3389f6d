"""Deterministic synthetic generator for the primary input table.

Schema (BASELINE.json input_hint):
    clips(clip_id: string, bytes: binary, sr_hz: int, dur_ms: int,
          codec: string, transcript: string)

Clips are generated in *groups*; within a dup group the original is perturbed
by one of: (a) exact byte copy, (b) µ-law re-encode round trip, (c) pad/trim
≤ 50 ms, (d) amplitude scale ±1 dB, (e) transcript ≤ 1 word edit.  Singleton
groups are the negative controls.  Ground-truth tables are emitted alongside:
``truth_pairs(a, b)`` and ``truth_clusters(clip_id, cluster_id)``.

Every clip's randomness derives from ``default_rng([seed, group_id])``, so the
distributed (Spark ``mapInPandas``) generator and the in-memory pandas
generator produce byte-identical tables for the same (seed, n_groups) — the
basis of the cross-parallelism determinism invariant (FIXTURES.md F4).

Audio is a "melody": 3–10 notes, each a sinusoid with frequency from a
quarter-octave scale, so the quantized energy/ZCR feature stream (see
operators/shingle.py) carries real sequence structure instead of a constant
symbol.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from datasketches_pig_spark.audioops.codecs import (
    ulaw_decode,
    ulaw_encode,
    wav_encode_pcm16,
)

SAMPLE_RATES = (8000, 16000, 22050, 44100)
NOTE_FREQS = 110.0 * 2.0 ** (np.arange(20) / 4.0)  # 110 Hz .. ~2.9 kHz
NOTE_AMPS = (0.3, 0.55, 1.0)
VARIANTS = ("exact", "ulaw", "trim", "gain", "transcript")
GROUP_SIZE_CHOICES = (1, 1, 1, 2, 2, 3, 4, 5)

_SYL_A = ("ba", "de", "ki", "lo", "mu", "na", "po", "ra", "su", "ti", "vo", "za", "che", "dri", "fla", "gno")
_SYL_B = ("ck", "l", "m", "n", "r", "s", "t", "x", "", "", "", "")


def make_word_pool(seed: int = 42, size: int = 512) -> list[str]:
    rng = np.random.default_rng([seed, 311217])
    pool: list[str] = []
    seen: set[str] = set()
    while len(pool) < size:
        n_syl = int(rng.integers(2, 5))
        w = "".join(_SYL_A[int(rng.integers(len(_SYL_A)))] for _ in range(n_syl))
        w += _SYL_B[int(rng.integers(len(_SYL_B)))]
        if w not in seen:
            seen.add(w)
            pool.append(w)
    return pool


def _synth_pcm(rng: np.random.Generator, sr_hz: int) -> np.ndarray:
    """Note-sequence sinusoid synth, total duration ~0.25–2.0 s."""
    n_notes = int(rng.integers(3, 11))
    target_s = float(rng.uniform(0.3, 1.9))
    durs = rng.uniform(0.08, 0.25, size=n_notes)
    durs *= target_s / durs.sum()
    segs = []
    for d in durs:
        f = float(NOTE_FREQS[int(rng.integers(len(NOTE_FREQS)))])
        f = min(f, sr_hz / 2.5)  # stay safely under Nyquist
        a = float(NOTE_AMPS[int(rng.integers(len(NOTE_AMPS)))])
        n = max(int(d * sr_hz), 8)
        t = np.arange(n, dtype=np.float64) / sr_hz
        phase = float(rng.uniform(0, 2 * np.pi))
        segs.append(a * np.sin(2 * np.pi * f * t + phase))
    pcm = np.concatenate(segs)
    noise = rng.normal(0.0, 1e-3, size=pcm.shape)  # ~-60 dB floor
    pcm = 0.8 * pcm / max(np.abs(pcm).max(), 1e-9) + noise
    return pcm.astype(np.float32)


def _make_transcript(rng: np.random.Generator, pool: list[str]) -> str:
    n_words = int(rng.integers(5, 41))
    idx = rng.integers(0, len(pool), size=n_words)
    return " ".join(pool[int(i)] for i in idx)


def _edit_one_word(rng: np.random.Generator, transcript: str, pool: list[str]) -> str:
    words = transcript.split(" ")
    pos = int(rng.integers(len(words)))
    words[pos] = pool[int(rng.integers(len(pool)))]
    return " ".join(words)


def group_rows(
    seed: int,
    group_id: int,
    group_size: int,
    start_index: int,
    pool: list[str],
    variants: tuple[str, ...] = VARIANTS,
) -> list[dict]:
    """Generate all rows of one dup group. Deterministic in (seed, group_id,
    variants).  ``variants`` defaults to the benchmark corpus mix; tests opt
    into extra codecs (e.g. ``"adpcm"``) without perturbing the corpus every
    recorded scaling number was measured on."""
    rng = np.random.default_rng([seed, group_id])
    sr_hz = int(SAMPLE_RATES[int(rng.integers(len(SAMPLE_RATES)))])
    pcm = _synth_pcm(rng, sr_hz)
    transcript = _make_transcript(rng, pool)
    base_bytes = wav_encode_pcm16(pcm, sr_hz)

    rows = [
        {
            "clip_id": f"clip_{start_index:010d}",
            "bytes": base_bytes,
            "sr_hz": sr_hz,
            "dur_ms": int(round(1000 * len(pcm) / sr_hz)),
            "codec": "pcm_s16le",
            "transcript": transcript,
        }
    ]
    for j in range(1, group_size):
        variant = variants[int(rng.integers(len(variants)))]
        v_pcm, v_codec, v_transcript = pcm, "pcm_s16le", transcript
        if variant == "exact":
            blob = base_bytes
        elif variant == "ulaw":
            blob = ulaw_encode(pcm)
            v_codec = "ulaw"
        elif variant == "adpcm":
            from datasketches_pig_spark.audioops.adpcm import adpcm_encode

            blob = adpcm_encode(pcm, sr_hz)
            v_codec = "adpcm_ima"
        elif variant == "trim":
            trim_ms = int(rng.integers(5, 51))
            n_cut = max(int(trim_ms * sr_hz / 1000), 1)
            v_pcm = pcm[n_cut:] if rng.integers(2) else pcm[:-n_cut]
            blob = wav_encode_pcm16(v_pcm, sr_hz)
        elif variant == "gain":
            db = float(rng.choice([-1.0, 1.0]))
            v_pcm = np.clip(pcm * 10 ** (db / 20.0), -1.0, 1.0).astype(np.float32)
            blob = wav_encode_pcm16(v_pcm, sr_hz)
        else:  # transcript edit; audio identical
            blob = base_bytes
            v_transcript = _edit_one_word(rng, transcript, pool)
        rows.append(
            {
                "clip_id": f"clip_{start_index + j:010d}",
                "bytes": blob,
                "sr_hz": sr_hz,
                "dur_ms": int(round(1000 * len(v_pcm) / sr_hz)),
                "codec": v_codec,
                "transcript": v_transcript,
            }
        )
    return rows


def plan_groups(seed: int, n_groups: int) -> np.ndarray:
    """Deterministic group sizes (one rng pass; cheap on the driver)."""
    rng = np.random.default_rng([seed, 0x5123E])
    choices = np.asarray(GROUP_SIZE_CHOICES)
    return choices[rng.integers(0, len(choices), size=n_groups)]


def decode_ground_truth(blob: bytes, codec: str) -> np.ndarray:
    """Ground-truth decode used by the SNR invariant test."""
    if codec == "ulaw":
        return ulaw_decode(blob)
    if codec == "adpcm_ima":
        from datasketches_pig_spark.audioops.adpcm import adpcm_decode

        return adpcm_decode(blob)[0]
    from datasketches_pig_spark.audioops.codecs import wav_decode_pcm16

    return wav_decode_pcm16(blob)[0]


def generate_clips_pandas(
    n_groups: int, seed: int = 42, variants: tuple[str, ...] = VARIANTS
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """In-memory generator → (clips, truth_pairs, truth_clusters)."""
    pool = make_word_pool(seed)
    sizes = plan_groups(seed, n_groups)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    rows: list[dict] = []
    pairs: list[tuple[str, str]] = []
    clusters: list[tuple[str, str]] = []
    for g in range(n_groups):
        grows = group_rows(seed, g, int(sizes[g]), int(offsets[g]), pool, variants)
        rows.extend(grows)
        ids = [r["clip_id"] for r in grows]
        root = min(ids)
        clusters.extend((cid, root) for cid in ids)
        pairs.extend((a, b) for i, a in enumerate(ids) for b in ids[i + 1 :])
    clips = pd.DataFrame(rows)
    truth_pairs = pd.DataFrame(pairs, columns=["a", "b"])
    truth_clusters = pd.DataFrame(clusters, columns=["clip_id", "cluster_id"])
    return clips, truth_pairs, truth_clusters


CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
)


def generate_clips_spark(
    spark,
    n_groups: int,
    seed: int = 42,
    out_dir: str | None = None,
    variants: tuple[str, ...] = VARIANTS,
):
    """Distributed generator: one task per group-range, deterministic per group.

    At 10^12-clip design scale this is the pattern that matters: no driver-side
    row materialization — the driver plans group offsets (O(n_groups) ints),
    executors synthesize their own ranges.
    """
    import pyspark.sql.functions as F  # noqa: F401

    sizes = plan_groups(seed, n_groups)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    plan = pd.DataFrame(
        {"group_id": np.arange(n_groups, dtype=np.int64),
         "group_size": sizes.astype(np.int64),
         "start_index": offsets.astype(np.int64)}
    )
    n_parts = min(max(n_groups // 64, 1), 1024)
    plan_df = spark.createDataFrame(plan).repartition(n_parts, "group_id")

    def gen(batches):
        pool = make_word_pool(seed)
        for pdf in batches:
            rows: list[dict] = []
            for g, sz, off in zip(pdf["group_id"], pdf["group_size"], pdf["start_index"]):
                rows.extend(group_rows(seed, int(g), int(sz), int(off), pool, variants))
            if rows:
                yield pd.DataFrame(rows)

    clips = plan_df.mapInPandas(gen, schema=CLIPS_SCHEMA)
    if out_dir is not None:
        clips.write.mode("overwrite").parquet(f"{out_dir}/clips.parquet")
        clips = spark.read.parquet(f"{out_dir}/clips.parquet")
    return clips


def generate_truth_spark(spark, n_groups: int, seed: int = 42, out_dir: str | None = None):
    """Distributed truth tables (pairs + clusters) from the same group plan."""
    sizes = plan_groups(seed, n_groups)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    plan = pd.DataFrame(
        {"group_size": sizes.astype(np.int64), "start_index": offsets.astype(np.int64)}
    )
    plan_df = spark.createDataFrame(plan).repartition(
        min(max(n_groups // 4096, 1), 256)
    )

    def gen_pairs(batches):
        for pdf in batches:
            out_a, out_b = [], []
            for sz, off in zip(pdf["group_size"], pdf["start_index"]):
                ids = [f"clip_{off + j:010d}" for j in range(int(sz))]
                for i, a in enumerate(ids):
                    for b in ids[i + 1 :]:
                        out_a.append(a)
                        out_b.append(b)
            yield pd.DataFrame({"a": out_a, "b": out_b})

    def gen_clusters(batches):
        for pdf in batches:
            cid, root = [], []
            for sz, off in zip(pdf["group_size"], pdf["start_index"]):
                ids = [f"clip_{off + j:010d}" for j in range(int(sz))]
                r = min(ids)
                cid.extend(ids)
                root.extend([r] * len(ids))
            yield pd.DataFrame({"clip_id": cid, "cluster_id": root})

    pairs = plan_df.mapInPandas(gen_pairs, schema="a string, b string")
    clusters = plan_df.mapInPandas(gen_clusters, schema="clip_id string, cluster_id string")
    if out_dir is not None:
        pairs.write.mode("overwrite").parquet(f"{out_dir}/truth_pairs.parquet")
        clusters.write.mode("overwrite").parquet(f"{out_dir}/truth_clusters.parquet")
        pairs = spark.read.parquet(f"{out_dir}/truth_pairs.parquet")
        clusters = spark.read.parquet(f"{out_dir}/truth_clusters.parquet")
    return pairs, clusters
