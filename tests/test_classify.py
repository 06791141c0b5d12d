"""Hashed linear classifier: row-exact parity vs the pure-Python reference,
threshold semantics, and the narrow no-shuffle/no-Python-worker plan shape."""

from __future__ import annotations

import contextlib
import io
import math
import random

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions import classify

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "the the the the the",
    "  Mixed   CASE   and\tweird\n whitespace  ",
    "punctuation, heavy!! text;; with (brackets) and --- dashes",
    "word",
    "",
    "   ",
    "numbers 123 456 and a url http://example.com/path?q=1",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
]


@pytest.fixture(scope="module")
def weights():
    rng = random.Random(7)
    return [rng.uniform(-2.0, 2.0) for _ in range(4096)]


def test_scores_match_python_reference(spark, weights):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["id", "text"]
    )
    for bigrams in (True, False):
        got = {
            r["id"]: (r["score"], r["p"])
            for r in df.select(
                "id",
                classify.linear_score(
                    F.col("text"), weights, bias=0.25, bigrams=bigrams
                ).alias("score"),
                classify.classifier_probability(
                    F.col("text"), weights, bias=0.25, bigrams=bigrams
                ).alias("p"),
            ).collect()
        }
        for i, t in enumerate(TEXTS):
            want = classify.reference_score(t, weights, bias=0.25, bigrams=bigrams)
            # bit-exact: same hash, same feature order, same left-fold adds
            assert got[i][0] == want, (i, t, bigrams)
            # exp() may differ by 1 ulp between the JVM and libm — the
            # MARGIN is the bit-stable contract, the sigmoid is monotone in
            # it so verdicts can't flip; allow ulp-scale slack here
            assert math.isclose(
                got[i][1],
                classify.reference_probability(
                    t, weights, bias=0.25, bigrams=bigrams
                ),
                rel_tol=1e-12,
            )


def test_empty_text_scores_bias(spark, weights):
    df = spark.createDataFrame([("",), ("   ",)], ["text"])
    rows = df.select(
        classify.linear_score(F.col("text"), weights, bias=1.5).alias("s")
    ).collect()
    assert [r["s"] for r in rows] == [1.5, 1.5]


def test_keep_threshold_semantics(spark):
    # single-feature vocabulary: weight index of crc32("good") decides
    import zlib

    dim = 64
    w = [0.0] * dim
    w[zlib.crc32(b"good") % dim] = 5.0
    w[zlib.crc32(b"bad") % dim] = -5.0
    df = spark.createDataFrame([("good",), ("bad",)], ["text"])
    rows = (
        df.select(
            "text",
            classify.classifier_keep(
                F.col("text"), w, threshold=0.5, bigrams=False
            ).alias("keep"),
        )
        .orderBy("text")
        .collect()
    )
    assert [(r["text"], r["keep"]) for r in rows] == [("bad", False), ("good", True)]
    # sigmoid(5) > 0.5 > sigmoid(-5); sanity of the probability scale
    assert math.isclose(1.0 / (1.0 + math.exp(-5.0)), 0.9933, abs_tol=1e-3)


def test_classifier_plan_is_narrow_jvm_only(spark, weights):
    """Inference must be a narrow map on the scan: no Exchange (shuffle), no
    Python workers (BatchEvalPython / ArrowEvalPython), weights folded into
    the plan as a constant — the shape that runs at 100 TB scan speed."""
    df = spark.range(10).withColumn("text", F.concat(F.lit("doc "), F.col("id")))
    scored = df.select(
        "id", classify.classifier_probability(F.col("text"), weights).alias("p")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scored.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert scored.count() == 10


def test_dim_validation():
    with pytest.raises(ValueError):
        classify.feature_indices(F.lit(["x"]), 0)


def test_train_classifier_learns_separable_corpus(spark):
    """End-to-end train/serve loop: GD training on a separable corpus must
    drive the loss down monotonically-ish and the TRAINED weights, fed to
    the codegen inference path, must classify held-out docs correctly."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.classify import (
        classifier_keep,
        reference_probability,
        train_classifier,
    )

    good = ["curated encyclopedia article about {}", "well written essay on {}"]
    bad = ["buy cheap {} now click here", "winner winner free {} prize claim"]
    topics = ["history", "biology", "music", "trade", "soil", "ships"]
    rows = []
    for i, t in enumerate(topics):
        rows.append((i * 4 + 0, good[0].format(t), 1))
        rows.append((i * 4 + 1, good[1].format(t), 1))
        rows.append((i * 4 + 2, bad[0].format(t), 0))
        rows.append((i * 4 + 3, bad[1].format(t), 0))
    train = spark.createDataFrame(rows[:-4], "id long, text string, y int")
    held = rows[-4:]  # last topic never seen in training

    w, b, losses = train_classifier(
        train, "text", "y", dim=512, iterations=40, learning_rate=20.0
    )
    assert losses[-1] < losses[0] * 0.5  # training actually converged
    # held-out verdicts via the Python reference (== codegen inference)
    for _id, text, y in held:
        p = reference_probability(text, w, b)
        assert (p >= 0.5) == bool(y), (text, p)
    # and through the actual Spark filter surface
    hdf = spark.createDataFrame(held, "id long, text string, y int")
    kept = {r["id"] for r in hdf.filter(classifier_keep(F.col("text"), w, b)).collect()}
    assert kept == {r[0] for r in held if r[2] == 1}


def test_train_classifier_validation(spark):
    from sample_dms_kinesis_rds_mariadb_spark.functions.classify import (
        train_classifier,
    )

    empty = spark.createDataFrame([], "text string, y int")
    with pytest.raises(ValueError, match="empty"):
        train_classifier(empty, "text", "y", dim=8, iterations=1)
    df = spark.createDataFrame([("a", 1)], "text string, y int")
    with pytest.raises(ValueError, match="dim"):
        train_classifier(df, "text", "y", dim=0)
