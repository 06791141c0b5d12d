"""Staged (DataFrame-level) quality gates vs the inline-column forms:
bit-identical verdicts on adversarial and real documents, and the staged
plan actually keeps its producer projection (CollapseProject must NOT
fold the arrays back into every flag column — that would silently restore
the ~10x re-tokenization the staging exists to remove)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
    c4_quality_flags,
    gopher_quality_flags,
    gopher_repetition_flags,
    with_c4_quality_flags,
    with_gopher_quality_flags,
    with_gopher_repetition_flags,
)

SF = "/root/testdata/sf0.001"

ADVERSARIAL = [
    None,
    "",
    "   \n\t \r\n  ",
    "one two three",  # below word count
    "la " * 600,  # repeated unigram
    "\r\n".join(["the same exact line"] * 30),  # CRLF dup lines
    "\n\n".join(["para one has the words", "para one has the words",
                 "another paragraph here"] * 8),
    "### hashes " * 80,
    "ellipsis line...\n" * 25 + "closing line.",
    "• bullet\n- dash\n* star\n" * 15,
    "words with the and that have to be of normal english text " * 20,
    "{ lorem ipsum javascript cookie policy terms of use }",
    "A sentence ends here. Another one! A third? \"Quoted.\"\n" * 10,
    "word " * 40 + "…" * 10,
    "mixed nbsp and\ttabs\nand lines " * 30,
]


@pytest.fixture(scope="module")
def corpus(spark):
    synth = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)],
        "doc_id long, text string",
    )
    real = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
        .limit(200)
    )
    return synth.unionByName(real)


def _collect(df):
    return {
        r["doc_id"]: {k: r[k] for k in df.columns if k != "doc_id"}
        for r in df.collect()
    }


@pytest.mark.parametrize(
    "inline_fn,staged_fn",
    [
        (gopher_quality_flags, with_gopher_quality_flags),
        (gopher_repetition_flags, with_gopher_repetition_flags),
        (c4_quality_flags, with_c4_quality_flags),
    ],
    ids=["gopher_quality", "gopher_repetition", "c4"],
)
def test_staged_equals_inline(spark, corpus, inline_fn, staged_fn):
    flags = inline_fn(F.col("text"))
    inline = corpus.select(
        "doc_id", *[c.alias(k) for k, c in flags.items()]
    )
    staged = staged_fn(corpus, "text").drop("text")
    assert inline.columns[1:] == staged.columns[1:]
    assert _collect(inline) == _collect(staged)


def test_c4_staged_equals_inline_with_badwords(spark, corpus):
    bads = ("naughty", "bad phrase here")
    flags = c4_quality_flags(F.col("text"), badwords=bads)
    inline = corpus.select(
        "doc_id", *[c.alias(k) for k, c in flags.items()]
    )
    staged = with_c4_quality_flags(corpus, "text", badwords=bads).drop("text")
    assert _collect(inline) == _collect(staged)


def test_staged_plan_keeps_producer_projection(spark):
    """Two Project nodes must survive optimization — if CollapseProject
    merged them, each flag column would re-derive the arrays and staging
    would be a no-op."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    staged = with_gopher_repetition_flags(docs, "text").drop("text")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        staged.explain("formatted")
    plan = buf.getvalue()
    n_projects = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and "Project" in ln and ":" not in ln
    )
    assert n_projects >= 2, plan[:1500]
    # still a pure scan pipeline: no shuffle, no Python
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_staged_column_collision_raises(spark):
    df = spark.createDataFrame([(1, "x", 1)], "doc_id long, text string, __gq_toks int")
    with pytest.raises(ValueError, match="collision"):
        with_gopher_quality_flags(df, "text")


def test_char_entropy_matches_python_and_edge_cases(spark):
    """char_entropy (pure-codegen sorted-run fold) vs a Python Counter
    entropy, plus the signal direction and empty/degenerate edges."""
    import math
    from collections import Counter

    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        char_entropy,
    )

    texts = [
        "aaaaaaaa",                      # zero entropy
        "abababab",                      # exactly 1 bit/char
        "the quick brown fox jumps",     # diverse
        "héllo wörld — ünïcode",         # multibyte chars count as chars
        "",                              # empty -> 0
        "x",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    out = df.select("i", char_entropy(F.col("t")).alias("e"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no UDF of any kind
    got = {r["i"]: r["e"] for r in out.collect()}

    def py_entropy(t):
        if not t:
            return 0.0
        c = Counter(t)
        n = len(t)
        return -sum((k / n) * math.log2(k / n) for k in c.values())

    for i, t in enumerate(texts):
        assert got[i] == pytest.approx(py_entropy(t), abs=1e-12), repr(t)
    assert got[0] == 0.0 and got[1] == pytest.approx(1.0) and got[5] == 0.0
    assert got[2] > got[1] > got[0]


def test_compression_ratio_signal(spark):
    """make_compression_ratio: Arrow-batched, parity vs direct zlib, and
    the direction (repetitive text compresses far better)."""
    import zlib

    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        make_compression_ratio,
    )

    texts = [
        "spam " * 400,
        "The heterogeneous quartz formations exhibit unusual banding; "
        "mineralogists dispute their provenance across several basins.",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    ratio = make_compression_ratio(spark)
    out = df.select("i", ratio(F.col("t")).alias("r"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
    got = {r["i"]: r["r"] for r in out.collect()}
    for i, t in enumerate(texts):
        want = (
            len(zlib.compress(t.encode(), 6)) / len(t.encode()) if t else 0.0
        )
        assert got[i] == pytest.approx(want, rel=1e-12)
    assert got[0] < 0.05 < got[1]
