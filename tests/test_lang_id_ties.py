"""lang_id tie-break + mixed-language + short-doc contract (VERDICT r5 §7).

The decision rule, pinned here so it can't drift silently:

* score(lang) = number of marker hits (ASCII markers as \\b-delimited whole
  words, non-ASCII markers as plain character matches — RE2 \\b is
  ASCII-only);
* winner = argmax score among langs with score ≥ 1;
* TIES break by PROFILE ORDER in LANG_MARKERS (en > de > es > fr > zh > ja >
  ko > ru > ar > hi): the cascade requires ``>`` against earlier profiles
  and ``>=`` against later ones, so the earliest tied profile wins;
* zero hits everywhere → 'und' (the fallback is a literal, not a guess).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datasketches_pig_spark.textops.analysis import LANG_MARKERS, lang_id


def _ids(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r["lang"] for r in df.select(lang_id("text").alias("lang")).collect()]


def test_profile_order_is_the_documented_one():
    assert list(LANG_MARKERS) == [
        "en", "de", "es", "fr", "zh", "ja", "ko", "ru", "ar", "hi",
    ]


def test_tie_breaks_to_earlier_profile(spark):
    # exactly one marker hit each: en('the') vs de('der') → en wins the tie;
    # de('der') vs fr('le' as a whole word) → de wins (earlier profile)
    got = _ids(spark, ["xx the yy der zz", "xx der yy le zz", "xx le yy est zz"])
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"  # two fr markers beat nothing else


def test_strict_majority_beats_order(spark):
    # 1 en hit vs 2 de hits → de despite en being first in profile order.
    # (Filler tokens must avoid 'a' — it is itself an en marker.)
    assert _ids(spark, ["x the y der z und w"]) == ["de"]


def test_mixed_cjk_latin(spark):
    # zh characters match WITHOUT \b; three zh marker chars vs one en word →
    # zh; flip the balance → en.  (zh was dead code before the r4 \b fix.)
    texts = ["the 我是在 data", "the and of is 的 pipeline"]
    assert _ids(spark, texts) == ["zh", "en"]


def test_cjk_tie_breaks_to_zh_over_ja(spark):
    # 'の' (ja) and '的' (zh) once each → zh, the earlier profile
    assert _ids(spark, ["x 的 y の z"]) == ["zh"]


def test_ko_space_delimited_nonascii_markers(spark):
    # Hangul IS space-delimited but the markers must still match without \b
    assert _ids(spark, ["나는 학교 에 가는 중"]) == ["ko"]


def test_short_and_empty_docs_fall_back_to_und(spark):
    got = _ids(spark, ["", "x", "zzz qqq", "12345 !!"])
    assert got == ["und", "und", "und", "und"]


def test_ascii_markers_do_not_match_inside_words(spark):
    # 'the' inside 'theory'/'weather' must not count (whole-word \b rule) —
    # with no standalone marker anywhere, the doc is 'und'
    assert _ids(spark, ["theory weather blande"]) == ["und"]
