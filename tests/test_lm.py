"""Bigram LM perplexity scoring: training counts vs a Python counter,
end-to-end score parity, vocabulary truncation, and the quality-signal
direction (gibberish scores worse than in-distribution text)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions import lm

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
    "the cat chased the dog",
    "dogs and cats are pets",
]


def _py_tokens(text: str) -> list[str]:
    import re

    norm = re.sub(r"\s+", " ", text).strip().lower()
    return [t for t in norm.split(" ") if t]


def _py_counts(corpus: list[str]) -> dict:
    uni: Counter = Counter()
    bi: Counter = Counter()
    for text in corpus:
        toks = _py_tokens(text)
        if not toks:
            continue
        seq = [lm.BOS] + toks
        uni.update(seq)
        bi.update(zip(seq, seq[1:]))
    return {"unigrams": dict(uni), "bigrams": dict(bi), "total": sum(uni.values())}


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], ["text"]).cache()


def test_train_counts_match_python_counter(spark, corpus_df):
    model = lm.train_ngram_counts(corpus_df, "text", vocab_size=10_000)
    want = _py_counts(CORPUS)
    assert model["unigrams"] == want["unigrams"]
    assert model["bigrams"] == want["bigrams"]
    assert model["total"] == want["total"]


def test_vocab_truncation_keeps_most_frequent(spark, corpus_df):
    model = lm.train_ngram_counts(corpus_df, "text", vocab_size=3)
    assert len(model["unigrams"]) == 3
    full = _py_counts(CORPUS)["unigrams"]
    kept = set(model["unigrams"])
    # every kept unigram is at least as frequent as every dropped one
    worst_kept = min(full[t] for t in kept)
    best_dropped = max(n for t, n in full.items() if t not in kept)
    assert worst_kept >= best_dropped


def test_spark_scores_match_reference_end_to_end(spark, corpus_df):
    model = lm.train_ngram_counts(corpus_df, "text", vocab_size=10_000)
    scorer = lm.make_perplexity_scorer(spark, model)
    probes = [
        "the cat sat on the mat",       # in-distribution
        "the dog chased a cat",         # recombined
        "zx qwv flurb glorp",           # gibberish (all OOV)
        "",                             # empty
        "   ",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(probes)], ["i", "text"])
    got = {
        r["i"]: r["bits"]
        for r in df.select(
            "i",
            scorer(lm.doc_tokens_column(F.col("text"))).alias("bits"),
        ).collect()
    }
    for i, t in enumerate(probes):
        assert got[i] == lm.reference_bits_per_token(t, model), (i, t)
    # quality-signal direction: gibberish >> in-distribution; empty = 0
    assert got[2] > got[0] + 2.0
    assert got[3] == 0.0 and got[4] == 0.0


def test_scoring_is_arrow_batched_not_per_row(spark, corpus_df):
    import contextlib
    import io

    model = lm.train_ngram_counts(corpus_df, "text", vocab_size=100)
    scorer = lm.make_perplexity_scorer(spark, model)
    df = corpus_df.select(scorer(lm.doc_tokens_column(F.col("text"))).alias("b"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" in plan       # vectorized pandas_udf
    assert "BatchEvalPython" not in plan   # never the row-at-a-time path


def test_lam_validation(spark, corpus_df):
    model = lm.train_ngram_counts(corpus_df, "text", vocab_size=100)
    with pytest.raises(ValueError, match="lam"):
        lm.make_perplexity_scorer(spark, model, lam=1.0)
    with pytest.raises(ValueError, match="lam"):
        lm.reference_bits_per_token("the cat", model, lam=-0.1)
