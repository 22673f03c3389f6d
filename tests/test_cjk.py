"""No-space-script (CJK) dedup + lang-id coverage — the r4 char-n-gram
shingle fallback.

A CJK document is ONE whitespace token, so without the fallback the whole
text-dedup family silently excluded it (zero word n-grams).  These tests
plant a CJK corpus with known duplicate structure and assert the
MinHash/SimHash/containment operators find it, that the kernel matches an
independent scalar replication, and that ``lang_id`` classifies zh text
(its pre-r4 ``\\b的\\b`` pattern could never match — RE2 ``\\b`` is ASCII).
"""

import numpy as np
import pandas as pd
import pytest

SEED = 9001
_POOL = list("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得")


def _cjk_text(rng: np.random.Generator, n_chars: int) -> str:
    return "".join(rng.choice(_POOL) for _ in range(n_chars))


def _perturb(text: str, rng: np.random.Generator, n_edits: int) -> str:
    chars = list(text)
    for pos in rng.choice(len(chars), size=n_edits, replace=False):
        chars[pos] = str(rng.choice(_POOL))
    return "".join(chars)


def _corpus() -> pd.DataFrame:
    rng = np.random.default_rng(42)
    base = [_cjk_text(rng, 150) for _ in range(6)]
    texts = list(base)
    texts.append(base[0])                       # 6: exact dup of 0
    texts.append(_perturb(base[1], rng, 2))     # 7: near dup of 1 (2 chars
    # edited -> ~15 of ~296 char-5-grams change: J ~0.9, small nonzero hamming)
    texts.append(base[2][10:40])                # 8: contained in 2
    texts.append("the quick brown fox jumps over the lazy dog")  # 9: word doc
    texts.append("the quick brown fox jumps over the lazy cat")  # 10: near dup of 9
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


@pytest.fixture(scope="module")
def cjk_docs(spark):
    return spark.createDataFrame(_corpus()).cache()


def test_kernel_char_fallback_matches_scalar():
    """Vectorized char-fallback kernel vs a pure-scalar replication (the
    same replication style the VALUES oracles use)."""
    from datasketches_pig_spark.functions.murmur3 import murmur3_x64_128
    from datasketches_pig_spark.operators.signatures import word_ngram_hash_sets

    texts = list(_corpus()["text"]) + ["", None, "一二", "ab cd", "一 二 三 四 五 六"]

    def scalar(t, n=3, cn=5):
        toks = (t or "").lower().encode("utf-8").split()
        if len(toks) >= n:
            th = [murmur3_x64_128(w, SEED)[0] for w in toks]
        else:
            norm = b" ".join(toks).decode("utf-8")
            th = [murmur3_x64_128(c.encode("utf-8"), SEED)[0] for c in norm]
            n = cn
        return {
            murmur3_x64_128(
                b"".join(h.to_bytes(8, "little") for h in th[i : i + n]), SEED
            )[0]
            for i in range(max(len(th) - n + 1, 0))
        }

    vals, counts = word_ngram_hash_sets(texts, 3, SEED)
    pos = 0
    for i, t in enumerate(texts):
        got = set(vals[pos : pos + counts[i]].tolist())
        pos += counts[i]
        assert got == scalar(t), f"doc {i}"
    # 6 space-separated single-char tokens: the word path applies (6 >= n)
    assert counts[len(texts) - 1] == 4  # 6 tokens -> 4 word 3-grams


def test_minhash_cjk_matches_bruteforce(spark, cjk_docs):
    """LSH dedup over the planted CJK corpus equals brute-force char-gram
    Jaccard — recall 1.0 on a mixed CJK + English corpus."""
    from datasketches_pig_spark.textops.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
    )

    brute = ngram_jaccard_pairs(cjk_docs, "doc_id", "text", 3, 0.5).toPandas()
    lsh = minhash_dedup_pairs(cjk_docs, "doc_id", "text", 3, 0.5).toPandas()
    bset = {(r.a, r.b, round(r.jaccard, 9)) for r in brute.itertuples()}
    lset = {(r.a, r.b, round(r.jaccard, 9)) for r in lsh.itertuples()}
    assert bset == lset
    pairs = {(r.a, r.b) for r in lsh.itertuples()}
    assert (0, 6) in pairs   # exact CJK dup
    assert (1, 7) in pairs   # near CJK dup (3/60 chars edited)
    assert (9, 10) in pairs  # the word path still works alongside
    # no cross-script pairs (word and char grams never collide)
    assert not any(a == 9 or b == 9 for a, b in pairs if (a, b) != (9, 10))


def test_simhash_cjk_near_dup(spark, cjk_docs):
    from datasketches_pig_spark.textops.dedup import simhash_near_pairs

    out = simhash_near_pairs(cjk_docs, "doc_id", "text", n=3, max_hamming=6).toPandas()
    pairs = {(r.a, r.b): r.hamming for r in out.itertuples()}
    assert pairs[(0, 6)] == 0  # exact dup -> identical fingerprint
    assert (1, 7) in pairs     # near dup within hamming budget


def test_containment_cjk(spark, cjk_docs):
    """A CJK fragment contained in a longer CJK doc is found via the char
    fallback with a PLAIN substring verify (no word-boundary padding)."""
    from datasketches_pig_spark.textops.dedup import containment_dedup_pairs

    out = containment_dedup_pairs(cjk_docs, "doc_id", "text", n=3).toPandas()
    pairs = {(r.contained_id, r.container_id) for r in out.itertuples()}
    assert (8, 2) in pairs
    # word-path containment keeps its boundary contract: "lazy cat" docs are
    # near dups, not containments
    assert (10, 9) not in pairs


def test_word_only_mode_excludes_cjk(spark, cjk_docs):
    """char_fallback_n=None restores the pre-r4 word-only contract."""
    from datasketches_pig_spark.textops.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        cjk_docs, "doc_id", "text", 3, 0.5, char_fallback_n=None
    ).toPandas()
    pairs = {(r.a, r.b) for r in out.itertuples()}
    assert pairs == {(9, 10)}  # only the English near-dup survives


def test_lang_id_zh(spark):
    from datasketches_pig_spark.textops.analysis import lang_id

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "我在这里的时候他是了一个人",      # zh markers, no spaces
                "the cat is on the mat",           # en
                "这是我的书了我在看它了是的",      # zh with more markers
                "これは私の本ですそれを見たのは昨日でした",  # ja
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = df.select("doc_id", lang_id("text").alias("l")).toPandas().set_index("doc_id")
    assert out.loc[0, "l"] == "zh"
    assert out.loc[1, "l"] == "en"
    assert out.loc[2, "l"] == "zh"
    assert out.loc[3, "l"] == "ja"


def test_char_fallback_n_equal_to_n_rejected():
    """ADVICE r4 (low): char_fallback_n == n gives word and char gram windows
    the same byte length (8n), so cross-script gram hashes could genuinely
    collide — rejected at construction."""
    import pytest

    from datasketches_pig_spark.operators.signatures import word_ngram_hash_sets

    with pytest.raises(ValueError, match="differ from n"):
        word_ngram_hash_sets(["a b c"], 5, 9001, char_fallback_n=5)
    # the default (n=3, fallback 5) and the disabled form stay valid
    word_ngram_hash_sets(["a b c"], 3, 9001, char_fallback_n=5)
    word_ngram_hash_sets(["a b c"], 5, 9001, char_fallback_n=None)


def test_lang_id_ko_ru_ar_hi(spark):
    """r5 profiles.  Korean is the key class: Hangul IS space-delimited but
    its markers are non-ASCII, so they must match without RE2's ASCII-only
    \\b.  The Spark cascade and the generated DuckDB oracle SQL must agree
    on every row (the lang_id gate query's contract, exercised here on a
    corpus that actually hits the new profiles)."""
    import duckdb

    from datasketches_pig_spark.queries import _sql_lang_id
    from datasketches_pig_spark.textops.analysis import lang_id

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                "나는 학교에 간다 그는 책을 읽는다 우리의 집이 좋다",  # ko, spaces
                "я не знаю что это в доме на столе и больше",           # ru
                "هذا الكتاب من المكتبة وهو على الطاولة في البيت",      # ar
                "यह किताब मेरी है और वह मेज़ में की गई का काम",          # hi
                "the cat is on the mat and the dog",                     # en still wins
                "no markers here xyzzy",                                 # und
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = df.select("doc_id", lang_id("text").alias("l")).toPandas().set_index("doc_id")
    assert out.loc[0, "l"] == "ko"
    assert out.loc[1, "l"] == "ru"
    assert out.loc[2, "l"] == "ar"
    assert out.loc[3, "l"] == "hi"
    assert out.loc[4, "l"] == "en"
    assert out.loc[5, "l"] == "und"

    con = duckdb.connect()
    con.register("documents", pdf)
    got = con.execute(_sql_lang_id()).fetchdf().set_index("doc_id")
    for i in pdf["doc_id"]:
        assert got.loc[i, "pred_lang"] == out.loc[i, "l"], i
