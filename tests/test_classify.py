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
    """Inference must be a narrow map on the scan — no Exchange (shuffle)
    at ANY dim. Below BROADCAST_DIM the plan is pure JVM (no Python
    workers, weights folded into the plan as a constant); at or above it
    linear_score auto-dispatches to the broadcast + Arrow kernel (r13:
    the literal path's driver-side plan analysis grows linearly with dim
    while the Arrow path is flat), so the plan carries exactly an
    ArrowEvalPython node and still no shuffle."""
    df = spark.range(10).withColumn("text", F.concat(F.lit("doc "), F.col("id")))

    def plan_of(w):
        scored = df.select(
            "id", classify.classifier_probability(F.col("text"), w).alias("p")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            scored.explain("formatted")
        return scored, buf.getvalue()

    # literal path: dim below the crossover stays JVM-only
    small = weights[: classify.BROADCAST_DIM // 2]
    scored, plan = plan_of(small)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert scored.count() == 10

    # broadcast path: dim >= BROADCAST_DIM rides the Arrow kernel — still
    # narrow, still shuffle-free
    assert len(weights) >= classify.BROADCAST_DIM
    scored, plan = plan_of(weights)
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
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


def test_broadcast_training_matches_literal_path(spark):
    """VERDICT r6 item 5: the broadcast+Arrow margin path must reproduce
    the plan-literal path's training trajectory. The margins themselves
    are bit-identical (sequential cumsum fold — asserted in the serving
    test below); the end-to-end weights agree up to the documented
    per-index gradient-sum float reduction order (1-ulp noise), so
    broadcast_threshold is a pure performance knob."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.classify import (
        train_classifier,
    )

    rows = [
        (0, "curated encyclopedia article about history", 1),
        (1, "well written essay on music and trade", 1),
        (2, "buy cheap pills now click here", 0),
        (3, "winner winner free prize claim now", 0),
        (4, "", 0),  # empty doc exercises the 0-feature branch
    ]
    df = spark.createDataFrame(rows, "id long, text string, y int")
    kw = dict(dim=64, iterations=5, learning_rate=5.0, l2=0.01)
    w_lit, b_lit, loss_lit = train_classifier(df, "text", "y", **kw)
    w_bc, b_bc, loss_bc = train_classifier(
        df, "text", "y", broadcast_threshold=0, **kw
    )
    for a, b in zip(w_lit, w_bc):
        assert math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15), (a, b)
    assert math.isclose(b_lit, b_bc, rel_tol=1e-12)
    for a, b in zip(loss_lit, loss_bc):
        assert math.isclose(a, b, rel_tol=1e-12)


def test_broadcast_serving_matches_literal_and_bounds_plan(spark):
    """linear_score_broadcast == linear_score bit-exact at small dim; at
    dim=2^20 the broadcast plan stays KB-sized (the literal path would
    serialize an ~8 MB constant) and runs Arrow-batched, never
    row-at-a-time Python."""
    import random

    from sample_dms_kinesis_rds_mariadb_spark.functions.classify import (
        linear_score,
        linear_score_broadcast,
    )

    texts = [
        ("a", "curated encyclopedia article about history"),
        ("b", "buy cheap pills now click here now"),
        ("c", ""),
        ("d", None),
    ]
    df = spark.createDataFrame(texts, "id string, text string")
    rng = random.Random(7)
    w_small = [rng.uniform(-1, 1) for _ in range(256)]
    got = df.select(
        "id",
        linear_score(F.col("text"), w_small, 0.25).alias("lit"),
        linear_score_broadcast(
            F.col("text"), w_small, 0.25, spark=spark
        ).alias("bc"),
    ).collect()
    for r in got:
        assert r["lit"] == r["bc"], r  # bit-exact

    # fastText-scale dim: bounded plan, Arrow-batched execution
    dim = 2**20
    w_big = [0.0] * dim
    for i in range(0, dim, 4097):
        w_big[i] = rng.uniform(-1, 1)
    scored = df.select(
        linear_score_broadcast(F.col("text"), w_big, 0.0, spark=spark).alias(
            "s"
        )
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scored.explain("extended")
    plan = buf.getvalue()
    assert len(plan) < 100_000, f"plan blew up to {len(plan)} chars"
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert scored.count() == 4  # and it actually executes


def test_broadcast_training_learns_at_large_dim(spark):
    """dim=2^20 training runs with bounded per-iteration plans and the
    loss still goes down (the broadcast path is the default above the
    threshold — no caller opt-in needed)."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.classify import (
        reference_probability,
        train_classifier,
    )

    rows = []
    for i, t in enumerate(["history", "biology", "music", "trade"]):
        rows.append((i * 2, f"curated encyclopedia article about {t}", 1))
        rows.append((i * 2 + 1, f"buy cheap {t} now click here", 0))
    df = spark.createDataFrame(rows, "id long, text string, y int")
    w, b, losses = train_classifier(
        df, "text", "y", dim=2**20, iterations=10, learning_rate=10.0
    )
    assert len(w) == 2**20
    assert losses[-1] < losses[0] * 0.7
    assert reference_probability(
        "well curated encyclopedia article about ships", w, b
    ) > reference_probability("buy cheap ships now click here", w, b)
