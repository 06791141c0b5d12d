"""Unicode normalization + mojibake repair (functions/unicode.py):
kernel behavior vs hand-built corruption pairs (single and double
encoding through both latin-1 and cp1252), conservative no-false-
positive guarantees, unicodedata parity for the normalizer, and the
Arrow-batched Spark surface."""

import unicodedata

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.unicode import (
    fix_mojibake_str,
    make_mojibake_fixer,
    make_unicode_normalizer,
)

GOOD = [
    "héllo — “smart” quotes and café",
    "naïve façade über Zürich",
    "русский текст and 中文 mixed",
    "plain ascii only",
    "ends with é",
]


@pytest.mark.parametrize("codec", ["latin-1", "cp1252"])
@pytest.mark.parametrize("passes", [1, 2])
def test_mojibake_repair_roundtrip(codec, passes):
    for good in GOOD:
        try:
            bad = good
            for _ in range(passes):
                bad = bad.encode("utf-8").decode(codec)
        except UnicodeDecodeError:
            continue  # cp1252 holes: corruption itself impossible
        assert fix_mojibake_str(bad) == good, (codec, passes, good)


def test_mojibake_conservative_on_clean_text():
    clean = GOOD + [
        "o Ã da moda",          # standalone mojibake-looking letter
        "Ângela and Ãlvaro",    # names starting with the lead chars
        "",
    ]
    for t in clean:
        assert fix_mojibake_str(t) == t, t
    # "Â±" is statistically ALWAYS mojibake of "±" — repaired, like ftfy
    assert fix_mojibake_str("math: a Â± b") == "math: a ± b"
    # idempotence on repaired output
    bad = GOOD[0].encode("utf-8").decode("latin-1")
    once = fix_mojibake_str(bad)
    assert fix_mojibake_str(once) == once == GOOD[0]


def test_mojibake_mixed_document():
    # corruption localized in a larger clean document still repairs
    bad_frag = "café".encode("utf-8").decode("latin-1")
    doc = f"A long clean sentence. Then {bad_frag} appears. More text."
    assert fix_mojibake_str(doc) == (
        "A long clean sentence. Then café appears. More text."
    )


def test_unicode_normalizer_matches_unicodedata(spark):
    texts = [
        "éclair",          # combining acute: NFC composes
        "ﬁne ①",                # NFKC expands ligature + circled digit
        "Å̊",               # already-composed + combining ring
        None,
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    for form in ("NFC", "NFKC"):
        norm = make_unicode_normalizer(form)
        got = {r["i"]: r["n"] for r in df.select("i", norm(F.col("t")).alias("n")).collect()}
        for i, t in enumerate(texts):
            want = unicodedata.normalize(form, t) if t is not None else None
            assert got[i] == want, (form, i)
    with pytest.raises(ValueError, match="normalization form"):
        make_unicode_normalizer("NFX")


def test_mojibake_fixer_spark_surface(spark):
    bad = GOOD[0].encode("utf-8").decode("latin-1")
    df = spark.createDataFrame(
        [(0, bad), (1, GOOD[1]), (2, None)], "i long, t string"
    )
    fixer = make_mojibake_fixer()
    got = {r["i"]: r["f"] for r in df.select("i", fixer(F.col("t")).alias("f")).collect()}
    assert got[0] == GOOD[0]
    assert got[1] == GOOD[1]
    assert got[2] is None
    # plan stays Arrow-batched, never row-at-a-time Python
    plan = df.select(fixer(F.col("t")))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
