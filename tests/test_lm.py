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


# --- interpolated Kneser-Ney ----------------------------------------------


def _ref_kn_bits(tokens: list[str], corpus: list[str], d: float) -> float:
    """INDEPENDENT Kneser-Ney reference straight from the published
    equations (Chen & Goodman 1999), computed from raw Python counts —
    no code shared with functions/lm.py beyond the token convention."""
    import math

    c = _py_counts(corpus)
    uni, bi = c["unigrams"], c["bigrams"]
    fan = Counter(a for (a, _b) in bi)
    cont = Counter(b for (_a, b) in bi)
    v = len(uni) + 1
    nbi = len(bi)

    def p_cont(w):
        return (cont.get(w, 0) + 1.0) / (nbi + v)

    def p(wv, w):
        cv = uni.get(wv, 0)
        if cv > 0 and fan.get(wv, 0) > 0:
            return (
                max(bi.get((wv, w), 0) - d, 0.0) / cv
                + d * fan[wv] / cv * p_cont(w)
            )
        return p_cont(w)

    seq = [lm.BOS] + tokens
    bits = -sum(math.log2(p(a, b)) for a, b in zip(seq, seq[1:]))
    return bits / len(tokens)


def test_kn_matches_independent_reference(spark, corpus_df):
    model = lm.train_kn_model(corpus_df, "text", discount=0.75)
    for text in CORPUS + ["the cat", "zebra quux flurble", "dogs chased rugs"]:
        got = lm.reference_kn_bits_per_token(text, model)
        want = _ref_kn_bits(_py_tokens(text), CORPUS, 0.75)
        assert got == pytest.approx(want, rel=1e-12), text


def test_kn_probabilities_normalize(spark, corpus_df):
    """For a seen context, summing P_KN(w|v) over every seen token plus the
    leftover continuation mass of unseen buckets must equal 1: the
    discount mass is exactly redistributed."""
    model = lm.train_kn_model(corpus_df, "text")
    uni = model["unigrams"]
    v = len(uni) + 1
    for ctx in ("the", "cat", lm.BOS):
        total = sum(lm._kn_prob(ctx, w, model) for w in uni)
        # unseen tokens all share the same continuation term: (0+1)/(N+V)
        d = model["discount"]
        lam = d * model["n1_fore"][ctx] / uni[ctx]
        unseen_each = lam * (1.0 / (model["n_bigrams"] + v))
        # buckets outside the seen vocab: exactly v - len(uni) + ... the
        # +1 OOV bucket (p_cont denominators count V+1 buckets)
        total += unseen_each * 1  # the single shared OOV bucket
        assert total == pytest.approx(1.0, abs=1e-9), ctx


def test_kn_quality_direction_and_spark_parity(spark, corpus_df):
    model = lm.train_kn_model(corpus_df, "text")
    scorer = lm.make_kn_perplexity_scorer(spark, model)
    out = corpus_df.select(
        "text", scorer(lm.doc_tokens_column(F.col("text"))).alias("bpt")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    for r in out.collect():
        assert r["bpt"] == pytest.approx(
            lm.reference_kn_bits_per_token(r["text"], model), rel=1e-12
        )
    in_dist = lm.reference_kn_bits_per_token("the cat sat on the mat", model)
    gibberish = lm.reference_kn_bits_per_token("zxq qzx flurble wibble", model)
    assert gibberish > in_dist
    # the KN signature (the "San Francisco" effect): after an UNSEEN
    # context the backoff prefers words seen in MANY contexts over words
    # pinned to one context — 'sat' follows {cat, dog} (continuation 2)
    # while 'mat' only ever follows 'the' (continuation 1)
    assert model["n1_back"]["sat"] > model["n1_back"]["mat"]
    assert lm._kn_prob("zebra", "sat", model) > lm._kn_prob("zebra", "mat", model)
    with pytest.raises(ValueError, match="discount"):
        lm.train_kn_model(corpus_df, "text", discount=1.5)
    with pytest.raises(ValueError, match="KN model"):
        lm.make_kn_perplexity_scorer(spark, lm.train_ngram_counts(corpus_df, "text"))


def test_perplexity_buckets_validation_and_shape(spark, corpus_df):
    from sample_dms_kinesis_rds_mariadb_spark.functions import lm as _lm

    scored = corpus_df.select(F.length("text").cast("double").alias("s"))
    out = _lm.perplexity_buckets(scored, "s")
    got = {r["ppl_bucket"] for r in out.collect()}
    assert got <= {"head", "middle", "tail"} and "head" in got
    with pytest.raises(ValueError, match="labels"):
        _lm.perplexity_buckets(scored, "s", probs=(0.5,), labels=("a", "b", "c"))


# --- interpolated TRIGRAM Kneser-Ney (r9) -----------------------------------


def _ref_kn3_bits(tokens: list[str], corpus: list[str], d: float,
                  d3: float) -> float:
    """INDEPENDENT trigram Kneser-Ney straight from the published
    equations (Chen & Goodman 1999): raw counts at the top order,
    continuation counts in the middle, add-one unigram continuation
    floor — computed from raw Python counts, no code shared with
    functions/lm.py beyond the token convention."""
    import math

    c = _py_counts(corpus)
    uni, bi = c["unigrams"], c["bigrams"]
    tri: Counter = Counter()
    for text in corpus:
        toks = _py_tokens(text)
        if toks:
            seq = [lm.BOS] + toks
            tri.update(zip(seq, seq[1:], seq[2:]))
    fan3 = Counter((u, v) for (u, v, _w) in tri)
    cont2 = Counter((v, w) for (_u, v, w) in tri)     # N1+(.vw)
    ctx2 = Counter(v for (_u, v, _w) in tri)          # N1+(.v.)
    fan2 = Counter(v for (v, _w) in cont2)            # |{w: N1+(.vw)>0}|
    cont1 = Counter(b for (_a, b) in bi)              # N1+(.w)
    v_buckets = len(uni) + 1
    nbi = len(bi)

    def p_cont(w):
        return (cont1.get(w, 0) + 1.0) / (nbi + v_buckets)

    def p2(v, w):
        cx = ctx2.get(v, 0)
        if cx > 0:
            return (
                max(cont2.get((v, w), 0) - d, 0.0) / cx
                + d * fan2.get(v, 0) / cx * p_cont(w)
            )
        return p_cont(w)

    # top-order denominator: the trigram CONTEXT total sum_w c(uvw) —
    # the Chen-Goodman count-of-the-table-being-discounted, NOT the raw
    # bigram count (which over-counts document-final (u,v) occurrences
    # that have no successor, leaking mass)
    ctx3 = Counter()
    for (u, v, _w), n in tri.items():
        ctx3[(u, v)] += n

    def p3(u, v, w):
        tuv = ctx3.get((u, v), 0)
        if tuv > 0 and fan3.get((u, v), 0) > 0:
            return (
                max(tri.get((u, v, w), 0) - d3, 0.0) / tuv
                + d3 * fan3[(u, v)] / tuv * p2(v, w)
            )
        return p2(v, w)

    seq = [lm.BOS, lm.BOS] + tokens
    bits = -sum(
        math.log2(p3(a, b, w)) for a, b, w in zip(seq, seq[1:], seq[2:])
    )
    return bits / len(tokens)


def test_kn3_matches_independent_reference(spark, corpus_df):
    model = lm.train_kn_trigram_model(
        corpus_df, "text", discount=0.75, discount3=0.6
    )
    for text in CORPUS + [
        "the cat", "zebra quux flurble", "dogs chased rugs",
        "the cat sat on the rug", "a",
    ]:
        got = lm.reference_kn3_bits_per_token(text, model)
        want = _ref_kn3_bits(_py_tokens(text), CORPUS, 0.75, 0.6)
        assert got == pytest.approx(want, rel=1e-12), text


def test_kn3_probabilities_normalize(spark, corpus_df):
    """Summing P_KN(w|u,v) over the vocab plus the shared OOV bucket must
    be exactly 1 for EVERY context — including document-final ones like
    ('the', 'mat') whose raw bigram count exceeds their trigram successor
    total (the r9 mass-leak fix: the top-order denominator is the
    retained trigram context total, not c(u,v))."""
    model = lm.train_kn_trigram_model(corpus_df, "text")
    uni = model["unigrams"]
    for ctx in (
        (lm.BOS, "the"), ("the", "cat"), ("cat", "sat"),
        ("the", "mat"),   # document-final: c(the,mat)=1, no trigram successor
        ("are", "pets"),  # document-final
    ):
        total = sum(lm._kn3_prob(ctx[0], ctx[1], w, model) for w in uni)
        # the OOV bucket: zero trigram/cont2 counts everywhere, so its
        # probability is the fully-backed-off chain evaluated at an
        # unseen token — use a token guaranteed absent
        total += lm._kn3_prob(ctx[0], ctx[1], "\x00oov\x00", model)
        assert total == pytest.approx(1.0, abs=1e-9), ctx


def test_kn3_beats_bigram_on_trigram_structure(spark, corpus_df):
    """A probe whose trigrams are all in-corpus must score strictly better
    under the trigram model than a token-scrambled version of itself —
    structure the bigram model can only partly see."""
    model3 = lm.train_kn_trigram_model(corpus_df, "text")
    fluent = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"
    assert lm.reference_kn3_bits_per_token(fluent, model3) < (
        lm.reference_kn3_bits_per_token(scrambled, model3)
    )


def test_kn3_spark_parity_and_plan(spark, corpus_df):
    model = lm.train_kn_trigram_model(corpus_df, "text")
    scorer = lm.make_kn3_perplexity_scorer(spark, model)
    out = corpus_df.select(
        "text", scorer(lm.doc_tokens_column(F.col("text"))).alias("bpt")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    for r in out.collect():
        assert r["bpt"] == pytest.approx(
            lm.reference_kn3_bits_per_token(r["text"], model), rel=1e-12
        )
    # a bigram-only model is rejected loudly
    with pytest.raises(ValueError, match="trigram KN"):
        lm.make_kn3_perplexity_scorer(
            spark, lm.train_kn_model(corpus_df, "text")
        )


# --- order-n interpolated Kneser-Ney (r10: the 5-gram CCNet setup) -----------


def _ref_knn_bits(tokens: list[str], corpus: list[str], order: int,
                  ds: dict[int, float]) -> float:
    """INDEPENDENT order-n Kneser-Ney straight from the published
    recursion (Chen & Goodman 1999 eq. 18): raw counts at the top order
    over retained-context totals, continuation counts in the middle
    orders, add-one unigram continuation floor — raw Python Counters, no
    code shared with functions/lm.py beyond the token convention."""
    import math

    grams: dict[int, Counter] = {k: Counter() for k in range(1, order + 1)}
    for text in corpus:
        toks = _py_tokens(text)
        if not toks:
            continue
        seq = [lm.BOS] + toks
        for k in range(1, order + 1):
            grams[k].update(
                tuple(seq[i : i + k]) for i in range(len(seq) - k + 1)
            )
    uni = {g[0]: n for g, n in grams[1].items()}
    cont1 = Counter(g[1] for g in grams[2])
    v_buckets = len(uni) + 1
    nbi = len(grams[2])
    # middle-order continuation tables from the (k+1)-gram sets
    cont = {k: Counter(g[1:] for g in grams[k + 1]) for k in range(2, order)}
    cont_ctx = {
        k: sum_by_prefix(cont[k]) for k in range(2, order)
    }
    cont_fan = {
        k: Counter(g[:-1] for g in cont[k]) for k in range(2, order)
    }
    top_ctx = sum_by_prefix(grams[order])
    top_fan = Counter(g[:-1] for g in grams[order])

    def p(ctx: tuple, w: str) -> float:
        prob = (cont1.get(w, 0) + 1.0) / (nbi + v_buckets)
        for k in range(2, order):
            c = ctx[-(k - 1):]
            t = cont_ctx[k].get(c, 0)
            if t > 0:
                d = ds[k]
                prob = (
                    max(cont[k].get(c + (w,), 0) - d, 0.0) / t
                    + d * cont_fan[k].get(c, 0) / t * prob
                )
        c = ctx[-(order - 1):]
        t = top_ctx.get(c, 0)
        if t > 0:
            d = ds[order]
            prob = (
                max(grams[order].get(c + (w,), 0) - d, 0.0) / t
                + d * top_fan.get(c, 0) / t * prob
            )
        return prob

    ctx = (lm.BOS,) * (order - 1)
    bits = 0.0
    for tok in tokens:
        bits -= math.log2(p(ctx, tok))
        ctx = ctx[1:] + (tok,)
    return bits / len(tokens)


def sum_by_prefix(counter: Counter) -> Counter:
    out: Counter = Counter()
    for g, n in counter.items():
        out[g[:-1]] += n
    return out


def test_kn5_matches_independent_reference(spark, corpus_df):
    ds = {2: 0.75, 3: 0.75, 4: 0.7, 5: 0.6}
    model = lm.train_kn_ngram_model(
        corpus_df, "text", order=5, discount=0.75,
        discounts={4: 0.7, 5: 0.6},
    )
    for text in CORPUS + [
        "the cat", "zebra quux flurble", "dogs chased rugs",
        "the cat sat on the rug", "the cat sat on the mat today", "a",
    ]:
        got = lm.reference_knn_bits_per_token(text, model)
        want = _ref_knn_bits(_py_tokens(text), CORPUS, 5, ds)
        assert got == pytest.approx(want, rel=1e-12), text


def test_knn_order3_cross_validates_trigram_model(spark, corpus_df):
    """The general order-n trainer at order=3 must score IDENTICALLY to
    the dedicated trigram model (same discounts) — two independently
    written trainers, one published recursion."""
    m3 = lm.train_kn_trigram_model(corpus_df, "text", discount=0.75,
                                   discount3=0.6)
    mn = lm.train_kn_ngram_model(corpus_df, "text", order=3,
                                 discount=0.75, discounts={3: 0.6})
    for text in CORPUS + ["the cat sat", "zebra quux", "a dog and a cat"]:
        assert lm.reference_knn_bits_per_token(text, mn) == pytest.approx(
            lm.reference_kn3_bits_per_token(text, m3), rel=1e-12
        ), text


def test_kn5_probabilities_normalize_every_level(spark, corpus_df):
    """Σ_w P(w|ctx) over vocab + OOV bucket == 1 exactly, for contexts
    hitting every backoff depth: fully-trained, document-final (top order
    empty), and gibberish (every order empty — pure floor)."""
    model = lm.train_kn_ngram_model(corpus_df, "text", order=5)
    uni = model["unigrams"]
    for ctx in (
        (lm.BOS, "the", "cat", "sat"),        # trained top context
        ("cat", "sat", "on", "the"),          # trained, mid-document
        ("sat", "on", "the", "mat"),          # document-final
        ("zz", "qq", "on", "the"),            # only low orders trained
        ("zz", "qq", "ww", "ee"),             # pure floor
    ):
        total = sum(lm._knn_prob(ctx, w, model) for w in uni)
        total += lm._knn_prob(ctx, "\x00oov\x00", model)
        assert total == pytest.approx(1.0, abs=1e-9), ctx


def test_kn5_spark_parity_plan_and_validation(spark, corpus_df):
    model = lm.train_kn_ngram_model(corpus_df, "text", order=5)
    scorer = lm.make_knn_perplexity_scorer(spark, model)
    out = corpus_df.select(
        "text", scorer(lm.doc_tokens_column(F.col("text"))).alias("bpt")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    for r in out.collect():
        assert r["bpt"] == pytest.approx(
            lm.reference_knn_bits_per_token(r["text"], model), rel=1e-12
        )
    with pytest.raises(ValueError, match="order-n KN"):
        lm.make_knn_perplexity_scorer(spark, lm.train_kn_model(corpus_df, "text"))
    with pytest.raises(ValueError, match="order must be"):
        lm.train_kn_ngram_model(corpus_df, "text", order=1)
    with pytest.raises(ValueError, match="discount for order"):
        lm.train_kn_ngram_model(corpus_df, "text", order=3, discounts={3: 1.5})


def test_kn5_beats_lower_orders_on_long_structure(spark, corpus_df):
    """A probe whose 5-grams are all in-corpus scores at least as well
    under the 5-gram model as its scramble — long-range structure only
    the top order sees."""
    m5 = lm.train_kn_ngram_model(corpus_df, "text", order=5)
    fluent = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"
    assert lm.reference_knn_bits_per_token(fluent, m5) < (
        lm.reference_knn_bits_per_token(scrambled, m5)
    )
