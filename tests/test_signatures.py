"""Unit tests for shingle + signature kernels (reference test style: tiny
deterministic inputs, exact-mode assertions with delta 0 —
``theta/DataToSketchTest.java:137``)."""

import numpy as np

from datasketches_pig_spark.config import DedupConfig
from datasketches_pig_spark.operators.shingle import (
    audio_symbols,
    normalize_text,
    text_shingle_hashes,
)
from datasketches_pig_spark.operators.signatures import (
    band_hashes,
    hamming64,
    kmv_bottom_k,
    kmv_distinct_estimate,
    kmv_jaccard,
    make_perm_params,
    minhash_signatures,
    simhash64,
)

CFG = DedupConfig()


def test_normalize_text():
    assert normalize_text("  Hello\t WORLD \n") == "hello world"


def test_text_shingles_deterministic_and_distinct():
    out = text_shingle_hashes(["abcdefgh", "abcdefgh", "zzzzzzzz", None, ""], CFG)
    assert np.array_equal(out[0], out[1])
    assert len(out[0]) == len("abcdefgh") - CFG.shingle_k_text + 1
    assert len(out[3]) == 0 and len(out[4]) == 0
    assert len(np.intersect1d(out[0], out[2])) == 0
    # shorter than k → one whole-string shingle
    short = text_shingle_hashes(["ab"], CFG)
    assert len(short[0]) == 1


def test_kmv_exact_mode():
    """Below k the sketch retains everything → exact distinct count with zero
    error (dictionary.html:62-63)."""
    h = np.random.default_rng(3).integers(1, 2**63, size=64, dtype=np.uint64)
    sk = kmv_bottom_k(h, 256)
    assert kmv_distinct_estimate(sk, 256) == 64.0  # delta 0.0


def test_kmv_estimate_above_k():
    rng = np.random.default_rng(4)
    h = rng.integers(1, 2**64, size=100_000, dtype=np.uint64)
    sk = kmv_bottom_k(h, 256)
    est = kmv_distinct_estimate(sk, 256)
    assert abs(est - 100_000) / 100_000 < 0.25  # ~4σ at k=256


def test_kmv_jaccard_exact_mode():
    a = np.arange(1, 101, dtype=np.uint64)  # 1..100
    b = np.arange(51, 151, dtype=np.uint64)  # 51..150 → J = 50/150
    ja = kmv_jaccard(kmv_bottom_k(a, 256), kmv_bottom_k(b, 256), 256)
    assert abs(ja - 50.0 / 150.0) < 1e-12


def test_kmv_jaccard_estimate_large():
    rng = np.random.default_rng(5)
    common = rng.integers(1, 2**64, size=8000, dtype=np.uint64)
    only_a = rng.integers(1, 2**64, size=2000, dtype=np.uint64)
    only_b = rng.integers(1, 2**64, size=2000, dtype=np.uint64)
    a = np.concatenate([common, only_a])
    b = np.concatenate([common, only_b])
    true_j = 8000 / 12000
    est = kmv_jaccard(kmv_bottom_k(a, 256), kmv_bottom_k(b, 256), 256)
    assert abs(est - true_j) < 0.12


def test_minhash_agreement_tracks_jaccard():
    rng = np.random.default_rng(6)
    common = rng.integers(1, 2**64, size=900, dtype=np.uint64)
    a = np.concatenate([common, rng.integers(1, 2**64, size=100, dtype=np.uint64)])
    b = np.concatenate([common, rng.integers(1, 2**64, size=100, dtype=np.uint64)])
    counts = np.array([len(a), len(b)])
    sig = minhash_signatures(np.concatenate([a, b]), counts, 128, 9001)
    agree = (sig[0] == sig[1]).mean()
    assert abs(agree - 900 / 1100) < 0.15


def test_minhash_deterministic_and_permutation_params():
    a1, b1 = make_perm_params(128, 9001)
    a2, b2 = make_perm_params(128, 9001)
    assert np.array_equal(a1, a2) and np.array_equal(b1, b2)
    assert (a1 % 2 == 1).all()
    h = np.arange(1, 500, dtype=np.uint64)
    s1 = minhash_signatures(h, np.array([499]), 64, 9001)
    s2 = minhash_signatures(h, np.array([499]), 64, 9001)
    assert np.array_equal(s1, s2)


def test_minhash_empty_clip():
    sig = minhash_signatures(np.empty(0, dtype=np.uint64), np.array([0]), 16, 9001)
    assert (sig == np.uint64(0xFFFFFFFFFFFFFFFF)).all()


def test_simhash_identical_and_perturbed():
    rng = np.random.default_rng(7)
    base = rng.integers(1, 2**64, size=500, dtype=np.uint64)
    perturbed = base.copy()
    perturbed[:25] = rng.integers(1, 2**64, size=25, dtype=np.uint64)  # 5% change
    other = rng.integers(1, 2**64, size=500, dtype=np.uint64)
    counts = np.array([500, 500, 500])
    fp = simhash64(np.concatenate([base, perturbed, other]), counts)
    d_close = hamming64(fp[0:1], fp[1:2])[0]
    d_far = hamming64(fp[0:1], fp[2:3])[0]
    assert d_close < 12
    assert d_far > 20  # independent ≈ 32 ± 4


def test_hamming64():
    a = np.array([0, -1, 0x0F], dtype=np.int64)
    b = np.array([0, 0, 0], dtype=np.int64)
    assert hamming64(a, b).tolist() == [0, 64, 4]


def test_band_hashes_shape_and_locality():
    rng = np.random.default_rng(8)
    sig = rng.integers(1, 2**64, size=(4, 128), dtype=np.uint64)
    sig[1] = sig[0]  # identical signature → identical bands
    bh = band_hashes(sig, 32, 4, 9001)
    assert bh.shape == (4, 32)
    assert np.array_equal(bh[0], bh[1])
    assert not np.array_equal(bh[0], bh[2])
    # change one signature slot → exactly one band changes
    sig2 = sig.copy()
    sig2[0, 5] ^= np.uint64(1)
    bh2 = band_hashes(sig2, 32, 4, 9001)
    assert (bh2[0] != bh[0]).sum() == 1


def test_audio_symbols_invariances():
    from datasketches_pig_spark.data.clips import _synth_pcm

    rng = np.random.default_rng(9)
    sr = 16000
    pcm = _synth_pcm(np.random.default_rng(11), sr)
    base = audio_symbols(pcm, sr, CFG)
    # gain ±1 dB → identical symbols (peak-relative energy)
    gain = audio_symbols((pcm * 10 ** (1 / 20)).clip(-1, 1).astype(np.float32), sr, CFG)
    assert (base == gain).mean() > 0.95
    # trim 50 ms → most interior symbols survive as a subsequence alphabet
    cut = int(0.05 * sr)
    trim = audio_symbols(pcm[cut:], sr, CFG)
    inter = len(np.intersect1d(base, trim)) / len(np.unique(base))
    assert inter > 0.8


def test_kmv_jaccard_batch_matches_scalar():
    import numpy as np

    from datasketches_pig_spark.operators.signatures import (
        kmv_bottom_k,
        kmv_jaccard,
        kmv_jaccard_batch,
    )

    rng = np.random.RandomState(7)
    k = 64
    a_cells, b_cells, expected = [], [], []
    for trial in range(200):
        na, nb = rng.randint(0, 400), rng.randint(0, 400)
        overlap = rng.randint(0, min(na, nb) + 1)
        common = rng.randint(0, 1 << 62, size=overlap).astype(np.uint64)
        a = kmv_bottom_k(
            np.concatenate([common, rng.randint(0, 1 << 62, size=na - overlap).astype(np.uint64)])
            if na
            else np.empty(0, np.uint64),
            k,
        )
        b = kmv_bottom_k(
            np.concatenate([common, rng.randint(0, 1 << 62, size=nb - overlap).astype(np.uint64)])
            if nb
            else np.empty(0, np.uint64),
            k,
        )
        a_cells.append(a.view(np.int64))
        b_cells.append(b.view(np.int64))
        expected.append(kmv_jaccard(a, b, k))
    counts_a = np.array([len(c) for c in a_cells], dtype=np.int64)
    counts_b = np.array([len(c) for c in b_cells], dtype=np.int64)
    got = kmv_jaccard_batch(
        np.concatenate(a_cells) if counts_a.sum() else np.empty(0, np.int64),
        counts_a,
        np.concatenate(b_cells) if counts_b.sum() else np.empty(0, np.int64),
        counts_b,
        k,
    )
    np.testing.assert_allclose(got, np.array(expected), rtol=0, atol=1e-12)


# ---------------------------------------------------------------------------
# flat word-shingle kernel (word_ngram_hash_sets / flat_token_hashes)
# ---------------------------------------------------------------------------

WORD_TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "",
    None,
    "one two",            # < n tokens → no grams
    "single",
    "a  b\tc\nd e f g h i j k l",      # mixed whitespace, > 8 tokens
    "dup dup dup dup dup",             # repeated grams collapse to one
    "Ünïcode tökens här okay",         # multibyte utf-8 tokens
]


def _scalar_gram_set(t, n=3, seed=9001):
    from datasketches_pig_spark.functions.murmur3 import murmur3_x64_128

    toks = (t or "").lower().encode("utf-8").split()
    th = [murmur3_x64_128(w, seed)[0] for w in toks]
    return sorted(
        {
            murmur3_x64_128(
                b"".join(int(h).to_bytes(8, "little") for h in th[i : i + n]),
                seed,
            )[0]
            for i in range(max(len(th) - n + 1, 0))
        }
    )


def test_word_ngram_hash_sets_matches_scalar_spec():
    """The flat batch kernel (one lexsort, no per-doc loop) must reproduce
    the scalar hash-of-token-hashes replication doc by doc — the same
    contract the VALUES oracles are generated from."""
    from datasketches_pig_spark.operators.signatures import word_ngram_hash_sets

    # word-only mode: the pre-r4 contract (char fallback off); the fallback
    # path has its own scalar-parity tests in tests/test_cjk.py
    gs, counts = word_ngram_hash_sets(WORD_TEXTS, 3, 9001, char_fallback_n=None)
    assert counts.sum() == len(gs)
    pos = 0
    for i, t in enumerate(WORD_TEXTS):
        want = _scalar_gram_set(t)
        got = np.sort(gs[pos : pos + counts[i]])
        pos += counts[i]
        assert counts[i] == len(want)
        assert np.array_equal(got, np.array(want, dtype=np.uint64))
    # empty / short / None docs really contribute zero grams
    assert counts[1] == counts[2] == counts[3] == 0


def test_flat_token_hashes_token_identity():
    """A token's hash must equal the murmur of its lowercased utf-8 bytes
    regardless of which document or batch position it sits in."""
    from datasketches_pig_spark.functions.murmur3 import murmur3_x64_128
    from datasketches_pig_spark.operators.signatures import flat_token_hashes

    th, counts = flat_token_hashes(["Alpha beta", None, "beta GAMMA alpha"], 9001)
    assert counts.tolist() == [2, 0, 3]
    toks = [b"alpha", b"beta", b"beta", b"gamma", b"alpha"]
    want = [murmur3_x64_128(w, 9001)[0] for w in toks]
    assert th.tolist() == want


def test_fingerprint_batch_matches_scalar_spec():
    from datasketches_pig_spark.functions.murmur3 import murmur3_x64_128
    from datasketches_pig_spark.textops.analysis import _fingerprint_batch

    BASE, MASK = 1000003, (1 << 64) - 1

    def scalar_fp(t):
        toks = (t or "").lower().encode("utf-8").split()
        th = [murmur3_x64_128(w, 9001)[0] for w in toks]
        if not th:
            return 0
        w = min(8, len(th))
        best = None
        for p in range(len(th) - w + 1):
            acc = 0
            for j in range(w):
                acc = (acc * BASE + int(th[p + j])) & MASK
            best = acc if best is None else min(best, acc)
        return best - (1 << 64) if best >= (1 << 63) else best

    texts = WORD_TEXTS + ["t " * 200, "exactly eight tokens one two three four five"]
    got = _fingerprint_batch(texts)
    assert got.tolist() == [scalar_fp(t) for t in texts]


def test_simhash_combo_keys_np_matches_codegen(spark):
    """The Arrow-pass numpy combo keys must equal the codegen expression
    form bit for bit (both remain in the tree; the banding guarantee rests
    on identical key values)."""
    import pyspark.sql.functions as F

    from datasketches_pig_spark.operators.signatures import simhash_combo_keys_np
    from datasketches_pig_spark.textops.dedup import _simhash_combo_keys

    rng = np.random.RandomState(7)
    sims = rng.randint(-(2**63), 2**63 - 1, size=100, dtype=np.int64)
    for h in (3, 6):
        df = spark.createDataFrame([(int(s),) for s in sims], "simhash long")
        got_sql = np.array(
            df.select(
                F.array(*_simhash_combo_keys(F.col("simhash"), h)).alias("k")
            ).toPandas()["k"].tolist()
        )
        assert np.array_equal(got_sql, simhash_combo_keys_np(sims, h))
