"""N-gram language-model perplexity scoring — the statistical quality
filter (CCNet-style: score documents against an LM trained on a trusted
corpus; high perplexity = unlike the reference distribution = candidate
for down-weighting or removal).

Two halves, split the way the other model operators are:

- TRAINING is a distributed aggregation (`train_ngram_counts`): one
  corpus scan emits n-gram rows bounded per doc, partial-aggregated
  counts, TakeOrdered to the top-``vocab_size`` — the model that comes
  back to the driver is bounded by construction (a vocabulary, not a
  corpus), exactly like `IvfIndex.build`'s centroids or the BPE merges
  table.
- SCORING ships that bounded model ONCE per executor via a SparkContext
  broadcast and runs as an Arrow-batched ``pandas_udf`` over the
  pre-tokenized column (`make_perplexity_scorer`) — the documented
  escape-hatch pattern (`make_bpe_counter` precedent): per-row work is
  dict lookups, no per-row Python UDF, no shuffle, composable with any
  downstream gate.

The model is an interpolated bigram LM with add-one-smoothed unigram
backoff — deliberately simple and fully specified, so an independent
pure-Python reference reproduces scores exactly (the test contract; this
repo cannot ship a trained KenLM, and the operator's value is the
Spark-side shape, which is identical for any n-gram model you load).

No reference-counterpart (reference run.py consumes CDC events); this is
north-star LLM-pipeline territory ("quality scoring" beyond rules and the
hashed linear classifier).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
    clean_tokens,
    py_clean_tokens,
    word_ngrams,
)

BOS = "<s>"


def _doc_tokens(col):
    """Normalized tokens (shared :func:`...text.clean_tokens`), BOS-prefixed
    so the first real token is scored by a (BOS, token) bigram."""
    toks = clean_tokens(col)
    return F.when(F.size(toks) > 0, F.concat(F.array(F.lit(BOS)), toks)).otherwise(
        toks
    )


def train_ngram_counts(
    df: DataFrame, text_col: str, vocab_size: int = 65_536,
    single_scan: bool = True,
) -> dict:
    """Train the bigram model: unigram and bigram counts over the corpus,
    truncated to the ``vocab_size`` most frequent of each (Zipf's head
    carries the mass; the tail backs off). Two aggregates, both
    TakeOrdered-bounded — the returned dict is the bounded model:
    ``{"unigrams": {tok: n}, "bigrams": {(a, b): n}, "total": N}``.

    ``single_scan`` (default): ONE corpus read for both orders, with the
    aggregated (key, n) frame eagerly checkpointed so the two TakeOrdered
    cuts read it — the storage trade is that DISTINCT bigrams grow
    roughly with corpus tokens, so the checkpoint can occupy real
    executor storage at extreme corpus scale. Pass ``single_scan=False``
    to fall back to the two-scan streaming form (each order is one
    explode → aggregate → TakeOrdered job, nothing materialized) when
    the corpus is big enough that a second read is cheaper than holding
    the distinct-bigram aggregate on disk (r13 review note)."""
    toks = _doc_tokens(F.col(text_col))
    if not single_scan:
        staged = df.select(toks.alias("_t"))
        uni_rows = (
            staged.select(F.explode(F.col("_t")).alias("g"))
            .groupBy("g")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "g")
            .limit(vocab_size)
            .collect()
        )
        bi_rows = (
            staged.select(
                F.explode(word_ngrams(F.col("_t"), 2)).alias("g")
            )
            .groupBy("g")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "g")
            .limit(vocab_size)
            .collect()
        )
        unigrams = {r["g"]: int(r["n"]) for r in uni_rows}
        bigrams = {}
        for r in bi_rows:
            a, _, b = r["g"].partition(" ")
            bigrams[(a, b)] = int(r["n"])
        return {
            "unigrams": unigrams,
            "bigrams": bigrams,
            "total": sum(unigrams.values()),
        }
    # ONE corpus scan for both orders (r13, guide §1.2 — fewer passes):
    # unigram and bigram keys are DISJOINT string spaces (clean_tokens
    # splits on whitespace, so no token contains a space; every bigram
    # is space-joined), so a single explode of their concatenation +
    # one aggregate is the exact union of the two separate aggregates.
    # The aggregated (key, n) frame is model-scale (distinct n-grams,
    # never corpus-scale rows) and is pinned so the two TakeOrdered
    # cuts read it instead of re-scanning + re-tokenizing the corpus —
    # at 100 TB that halves the training read. Each cut filters its
    # kind first, so its ordered head is identical to the old per-kind
    # job's. The token array is staged into a column so the tokenize
    # chain runs once per row (concat references it twice).
    staged = df.select(toks.alias("_t"))
    agg = (
        staged.select(
            F.explode(
                F.concat(F.col("_t"), word_ngrams(F.col("_t"), 2))
            ).alias("g")
        )
        .groupBy("g")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    uni_rows = (
        agg.filter(~F.col("g").contains(" "))
        .orderBy(F.desc("n"), "g")
        .limit(vocab_size)
        .collect()
    )
    bi_rows = (
        agg.filter(F.col("g").contains(" "))
        .orderBy(F.desc("n"), "g")
        .limit(vocab_size)
        .collect()
    )
    unigrams = {r["g"]: int(r["n"]) for r in uni_rows}
    bigrams = {}
    for r in bi_rows:
        a, _, b = r["g"].partition(" ")
        bigrams[(a, b)] = int(r["n"])
    return {
        "unigrams": unigrams,
        "bigrams": bigrams,
        "total": sum(unigrams.values()),
    }


def _validate_lam(lam: float) -> None:
    """``lam`` must leave unigram mass: at ``lam == 1.0`` a missing bigram
    yields p = 0 and ``log2(0)`` kills executor tasks mid-run; the add-one
    unigram backoff guarantees p > 0 only when ``(1 - lam) > 0``."""
    if not 0.0 <= lam < 1.0:
        raise ValueError(f"lam must be in [0, 1), got {lam}")


def _logprob(tokens: list[str], model: dict, lam: float) -> float:
    """Mean negative log2 probability (bits/token) of the token sequence
    under interpolated bigram + add-one unigram backoff. Pure function —
    shared verbatim by the executor UDF and the test reference."""
    unigrams, bigrams, total = (
        model["unigrams"],
        model["bigrams"],
        model["total"],
    )
    v = len(unigrams) + 1  # +1: one shared OOV bucket
    if not tokens:
        return 0.0
    bits = 0.0
    prev = BOS
    n_scored = 0
    for tok in tokens:
        p_uni = (unigrams.get(tok, 0) + 1.0) / (total + v)
        c_prev = unigrams.get(prev, 0)
        p_bi = (bigrams.get((prev, tok), 0) / c_prev) if c_prev > 0 else 0.0
        p = lam * p_bi + (1.0 - lam) * p_uni
        bits -= math.log2(p)
        n_scored += 1
        prev = tok
    return bits / n_scored


def make_perplexity_scorer(spark, model: dict, lam: float = 0.7):
    """Arrow-batched scorer: ``ARRAY<STRING>`` tokens (BOS included — feed
    it :func:`doc_tokens_column`) → mean bits/token (log2 perplexity).
    The model broadcasts once per executor; per-row work is dict hits."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    _validate_lam(lam)
    bc = spark.sparkContext.broadcast(model)

    def scorer(tokens):
        m = bc.value

        def one(seq) -> float:
            if seq is None or len(seq) == 0:
                return 0.0
            # seq[0] is BOS; score the real tokens against running context
            return _logprob(list(seq[1:]), m, lam)

        return tokens.map(one)

    scorer.__annotations__ = {"tokens": pd.Series, "return": pd.Series}
    return pandas_udf("double")(scorer)


def doc_tokens_column(text_col) -> object:
    """The tokenization the scorer expects (public so callers pre-compute
    or persist it): normalized tokens, BOS-prefixed, empties dropped."""
    return _doc_tokens(text_col)


def reference_bits_per_token(
    text: str, model: dict, lam: float = 0.7
) -> float:
    """Independent reference: normalize with the shared Python mirror of
    the Spark tokenization, then score with the same pure function."""
    _validate_lam(lam)
    return _logprob(py_clean_tokens(text), model, lam)


# --- interpolated Kneser-Ney (Chen & Goodman 1999) ------------------------


def train_kn_model(
    df: DataFrame, text_col: str, vocab_size: int = 65_536,
    discount: float = 0.75,
) -> dict:
    """Train an interpolated Kneser-Ney bigram model — the smoothing family
    KenLM implements and CCNet's quality filter actually uses, as the
    upgrade over the add-one model of :func:`train_ngram_counts`.

    Corpus cost is identical (the same two bounded aggregates); the KN
    statistics — per-context fan-out N1+(v·), per-word continuation count
    N1+(·w), distinct-bigram total — derive from the RETAINED bigram
    table on the driver (the model is fully specified by its own counts,
    so truncation keeps train/score consistent). Returns the
    ``train_ngram_counts`` dict extended with ``n1_fore``, ``n1_back``,
    ``n_bigrams``, ``discount``.
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    model = train_ngram_counts(df, text_col, vocab_size)
    n1_fore: dict[str, int] = {}
    n1_back: dict[str, int] = {}
    for (a, b), _n in model["bigrams"].items():
        n1_fore[a] = n1_fore.get(a, 0) + 1
        n1_back[b] = n1_back.get(b, 0) + 1
    model["n1_fore"] = n1_fore
    model["n1_back"] = n1_back
    model["n_bigrams"] = len(model["bigrams"])
    model["discount"] = discount
    return model


def _kn_prob(prev: str, tok: str, model: dict) -> float:
    """P_KN(tok | prev): absolute discounting with continuation-probability
    backoff —

        P(w|v) = max(c(vw) - D, 0)/c(v) + D·N1+(v·)/c(v) · P_cont(w)
        P_cont(w) = (N1+(·w) + 1) / (N1+(··) + V + 1)

    P_cont carries add-one smoothing over V+1 buckets (shared OOV bucket,
    mirroring the add-one model) so every token has p > 0; contexts with
    no retained bigrams back off to P_cont alone. Pure function — shared
    verbatim by the executor UDF and the test reference."""
    unigrams = model["unigrams"]
    d = model["discount"]
    v = len(unigrams) + 1
    p_cont = (model["n1_back"].get(tok, 0) + 1.0) / (model["n_bigrams"] + v)
    c_prev = unigrams.get(prev, 0)
    fan_out = model["n1_fore"].get(prev, 0)
    if c_prev > 0 and fan_out > 0:
        c_bi = model["bigrams"].get((prev, tok), 0)
        return max(c_bi - d, 0.0) / c_prev + d * fan_out / c_prev * p_cont
    return p_cont


def _kn_logprob(tokens: list[str], model: dict) -> float:
    """Mean negative log2 probability (bits/token) under interpolated KN."""
    if not tokens:
        return 0.0
    bits = 0.0
    prev = BOS
    for tok in tokens:
        bits -= math.log2(_kn_prob(prev, tok, model))
        prev = tok
    return bits / len(tokens)


def make_kn_perplexity_scorer(spark, model: dict):
    """Arrow-batched KN scorer — same contract as
    :func:`make_perplexity_scorer` (``ARRAY<STRING>`` BOS-prefixed tokens →
    bits/token; broadcast model, dict-hit per-row work)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    for key in ("n1_fore", "n1_back", "n_bigrams", "discount"):
        if key not in model:
            raise ValueError(f"not a KN model (missing {key!r}); use train_kn_model")
    bc = spark.sparkContext.broadcast(model)

    def scorer(tokens):
        m = bc.value

        def one(seq) -> float:
            if seq is None or len(seq) == 0:
                return 0.0
            return _kn_logprob(list(seq[1:]), m)

        return tokens.map(one)

    scorer.__annotations__ = {"tokens": pd.Series, "return": pd.Series}
    return pandas_udf("double")(scorer)


def reference_kn_bits_per_token(text: str, model: dict) -> float:
    """Independent-entry reference: shared Python tokenization mirror +
    the same pure scoring function."""
    return _kn_logprob(py_clean_tokens(text), model)


def train_kn_trigram_model(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 65_536,
    discount: float = 0.75,
    discount3: float | None = None,
) -> dict:
    """Interpolated TRIGRAM Kneser-Ney (Chen & Goodman 1999) — CCNet's
    published setup is a 5-gram KenLM; the trigram with pruned context
    tables closes most of the bigram model's gap at the same bounded
    shape: ONE extra corpus aggregate (trigram counts, TakeOrdered to
    ``vocab_size`` rows — Zipf's head carries the mass) on top of
    :func:`train_kn_model`'s two.

    The model dict extends the bigram KN model with:

    - ``trigrams``: raw counts c(uvw) — the highest order scores with RAW
      counts, per Chen-Goodman;
    - ``tri_ctx``: per-(u,v) RETAINED trigram context totals Σ_w c(uvw) —
      the top order's denominator. Using the raw bigram count c(uv)
      instead would leak mass: document-final (u,v) occurrences have no
      trigram successor and TakeOrdered truncation prunes tail trigrams,
      so Σ_w c(uvw) ≤ c(uv) and P(w|u,v) would sum below 1. With the
      retained total every context normalizes EXACTLY (the test asserts
      it on document-final contexts);
    - ``n1_fore2``: per-(u,v) fan-out N1+(uv·) — the top level's backoff
      weight;
    - ``cont2`` / ``cont2_ctx`` / ``cont2_fan``: the middle order's
      CONTINUATION statistics derived from the retained trigram table —
      N1+(·vw), N1+(·v·) and |{w: N1+(·vw)>0}| — the defining KN move
      (the middle order asks "how many contexts does vw complete", not
      "how often");
    - ``discount3``: the top level's absolute discount (defaults to
      ``discount``).

    All statistics derive from the RETAINED tables, so truncation keeps
    train/score self-consistent (the same contract as the bigram model).
    """
    if discount3 is None:
        discount3 = discount
    if not 0.0 < discount3 < 1.0:
        raise ValueError(f"discount3 must be in (0, 1), got {discount3}")
    model = train_kn_model(df, text_col, vocab_size, discount)
    toks = _doc_tokens(F.col(text_col))
    tri_rows = (
        df.select(F.explode(word_ngrams(toks, 3)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "g")
        .limit(vocab_size)
        .collect()
    )
    trigrams: dict[tuple[str, str, str], int] = {}
    for r in tri_rows:
        u, _, rest = r["g"].partition(" ")
        v, _, w = rest.partition(" ")
        trigrams[(u, v, w)] = int(r["n"])
    n1_fore2: dict[tuple[str, str], int] = {}
    tri_ctx: dict[tuple[str, str], int] = {}
    cont2: dict[tuple[str, str], int] = {}
    cont2_ctx: dict[str, int] = {}
    cont2_fan: dict[str, int] = {}
    for (u, v, w), n in trigrams.items():
        n1_fore2[(u, v)] = n1_fore2.get((u, v), 0) + 1
        tri_ctx[(u, v)] = tri_ctx.get((u, v), 0) + n
        key = (v, w)
        if key not in cont2:
            cont2_fan[v] = cont2_fan.get(v, 0) + 1
        cont2[key] = cont2.get(key, 0) + 1  # distinct (u,·,·) per key
        cont2_ctx[v] = cont2_ctx.get(v, 0) + 1
    model["trigrams"] = trigrams
    model["tri_ctx"] = tri_ctx
    model["n1_fore2"] = n1_fore2
    model["cont2"] = cont2
    model["cont2_ctx"] = cont2_ctx
    model["cont2_fan"] = cont2_fan
    model["discount3"] = discount3
    return model


def _kn3_middle(v: str, w: str, model: dict) -> float:
    """Middle order of the trigram KN: continuation counts (how many
    distinct predecessors complete v·w) with absolute discounting, backing
    off to the add-one-smoothed unigram continuation probability."""
    d = model["discount"]
    v_buckets = len(model["unigrams"]) + 1
    p_cont = (model["n1_back"].get(w, 0) + 1.0) / (
        model["n_bigrams"] + v_buckets
    )
    ctx = model["cont2_ctx"].get(v, 0)
    if ctx > 0:
        c = model["cont2"].get((v, w), 0)
        fan = model["cont2_fan"].get(v, 0)
        return max(c - d, 0.0) / ctx + d * fan / ctx * p_cont
    return p_cont


def _kn3_prob(u: str, v: str, w: str, model: dict) -> float:
    """P_KN(w | u, v): raw-count absolute discounting at the top order,
    continuation-count middle order, add-one unigram continuation floor —
    every token has p > 0. The top-order denominator is the RETAINED
    trigram context total Σ_w c(uvw) (``tri_ctx``), not the raw bigram
    count c(uv), so P(·|u,v) sums to exactly 1 even for document-final
    or truncation-pruned contexts (VERDICT r9 ADVICE). Pure function —
    shared verbatim by the executor UDF and the test reference."""
    p2 = _kn3_middle(v, w, model)
    t_uv = model["tri_ctx"].get((u, v), 0)
    fan3 = model["n1_fore2"].get((u, v), 0)
    if t_uv > 0 and fan3 > 0:
        d3 = model["discount3"]
        c_tri = model["trigrams"].get((u, v, w), 0)
        return max(c_tri - d3, 0.0) / t_uv + d3 * fan3 / t_uv * p2
    return p2


def _kn3_logprob(tokens: list[str], model: dict) -> float:
    """Mean negative log2 probability (bits/token) under interpolated
    trigram KN. Context starts at (BOS, BOS): the first real token backs
    off to the trained (BOS, token) middle order — self-consistent with
    the single-BOS training prefix."""
    if not tokens:
        return 0.0
    bits = 0.0
    prev2 = prev1 = BOS
    for tok in tokens:
        bits -= math.log2(_kn3_prob(prev2, prev1, tok, model))
        prev2, prev1 = prev1, tok
    return bits / len(tokens)


def make_kn3_perplexity_scorer(spark, model: dict):
    """Arrow-batched trigram-KN scorer — same contract as
    :func:`make_perplexity_scorer` (``ARRAY<STRING>`` BOS-prefixed tokens
    → bits/token; broadcast model, dict-hit per-row work)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    for key in ("trigrams", "tri_ctx", "n1_fore2", "cont2", "cont2_ctx",
                "discount3"):
        if key not in model:
            raise ValueError(
                f"not a trigram KN model (missing {key!r}); "
                "use train_kn_trigram_model"
            )
    bc = spark.sparkContext.broadcast(model)

    def scorer(tokens):
        m = bc.value

        def one(seq) -> float:
            if seq is None or len(seq) == 0:
                return 0.0
            return _kn3_logprob(list(seq[1:]), m)

        return tokens.map(one)

    scorer.__annotations__ = {"tokens": pd.Series, "return": pd.Series}
    return pandas_udf("double")(scorer)


def reference_kn3_bits_per_token(text: str, model: dict) -> float:
    """Independent-entry reference: shared Python tokenization mirror +
    the same pure scoring function."""
    return _kn3_logprob(py_clean_tokens(text), model)


# --- order-n interpolated Kneser-Ney (r10: CCNet's published setup is a
# --- 5-gram KenLM; the chain below generalizes the bigram/trigram models
# --- to arbitrary order with the same bounded TakeOrdered aggregates) ------


def train_kn_ngram_model(
    df: DataFrame,
    text_col: str,
    order: int = 5,
    vocab_size: int = 65_536,
    discount: float = 0.75,
    discounts: dict[int, float] | None = None,
) -> dict:
    """Interpolated order-``n`` Kneser-Ney (Chen & Goodman 1999, eq. 18):
    one bounded TakeOrdered aggregate per order (k-gram counts, k = 1..n
    — Zipf's head carries the mass), every derived statistic computed
    from the RETAINED tables so truncation keeps train/score
    self-consistent (the bigram/trigram models' contract).

    The level structure, exactly the published recursion:

    - TOP (k = n): RAW counts c(g), absolute discount ``D_n``,
      denominator the retained context total Σ_w c(ctx·w) (the r9
      mass-leak fix — never the raw (n−1)-gram count), backoff weight
      ``D_n · N1+(ctx·) / Σ_w c(ctx·w)``.
    - MIDDLE (2 ≤ k < n): CONTINUATION counts derived from the retained
      (k+1)-gram table — c'(g) = N1+(·g) = |{u : (u,g) retained}| — with
      the same discount/backoff shape over continuation context totals
      (the defining KN move: a middle order asks "how many contexts does
      this k-gram complete", not "how often does it occur").
    - FLOOR (k = 1): add-one-smoothed unigram continuation probability
      over V+1 buckets (one shared OOV bucket) — every token has p > 0.

    Returns ``{"order", "unigrams", "raw_top", "top_ctx", "top_fan",
    "cont", "cont_ctx", "cont_fan", "n1_back", "n_bigrams",
    "discounts"}`` where ``cont*[k]`` hold level-k continuation tables
    (tuple-keyed). ``discounts`` maps k → D_k (``discount`` everywhere
    unless overridden per level).

    Scale shape: ``order`` corpus aggregates, each partial-aggregated
    and TakeOrdered-bounded to ``vocab_size`` rows; the driver-side model
    is a vocabulary, not a corpus, and ships once per executor via
    broadcast (the `make_perplexity_scorer` pattern).
    """
    if order < 2:
        raise ValueError(f"order must be >= 2, got {order}")
    ds = {k: discount for k in range(2, order + 1)}
    if discounts:
        ds.update(discounts)
    for k, d in ds.items():
        if not 0.0 < d < 1.0:
            raise ValueError(f"discount for order {k} must be in (0, 1), got {d}")

    toks = _doc_tokens(F.col(text_col))
    uni_rows = (
        df.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "t")
        .limit(vocab_size)
        .collect()
    )
    unigrams = {r["t"]: int(r["n"]) for r in uni_rows}

    grams: dict[int, dict[tuple[str, ...], int]] = {}
    for k in range(2, order + 1):
        rows = (
            df.select(F.explode(word_ngrams(toks, k)).alias("g"))
            .groupBy("g")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "g")
            .limit(vocab_size)
            .collect()
        )
        grams[k] = {tuple(r["g"].split(" ")): int(r["n"]) for r in rows}

    # floor: unigram continuation from the retained bigram table
    n1_back: dict[str, int] = {}
    for (_a, b) in grams[2]:
        n1_back[b] = n1_back.get(b, 0) + 1

    # top order: raw counts + retained context totals + fan-out
    raw_top = grams[order]
    top_ctx: dict[tuple[str, ...], int] = {}
    top_fan: dict[tuple[str, ...], int] = {}
    for g, n in raw_top.items():
        c = g[:-1]
        top_ctx[c] = top_ctx.get(c, 0) + n
        top_fan[c] = top_fan.get(c, 0) + 1

    # middle orders: continuation tables from the retained (k+1)-gram set
    cont: dict[int, dict[tuple[str, ...], int]] = {}
    cont_ctx: dict[int, dict[tuple[str, ...], int]] = {}
    cont_fan: dict[int, dict[tuple[str, ...], int]] = {}
    for k in range(2, order):
        ck: dict[tuple[str, ...], int] = {}
        for g in grams[k + 1]:
            ck[g[1:]] = ck.get(g[1:], 0) + 1  # N1+(·g): distinct predecessors
        cx: dict[tuple[str, ...], int] = {}
        fn: dict[tuple[str, ...], int] = {}
        for g, n in ck.items():
            c = g[:-1]
            cx[c] = cx.get(c, 0) + n
            fn[c] = fn.get(c, 0) + 1
        cont[k], cont_ctx[k], cont_fan[k] = ck, cx, fn

    return {
        "order": order,
        "unigrams": unigrams,
        "raw_top": raw_top,
        "top_ctx": top_ctx,
        "top_fan": top_fan,
        "cont": cont,
        "cont_ctx": cont_ctx,
        "cont_fan": cont_fan,
        "n1_back": n1_back,
        "n_bigrams": len(grams[2]),
        "discounts": ds,
    }


def _knn_prob(context: tuple[str, ...], w: str, model: dict) -> float:
    """P_KN(w | context) for an order-n model — the published recursion,
    iterative from the floor up so every level's backoff weight applies
    exactly once. ``context`` is the last order−1 tokens (BOS-padded).
    Pure function — shared verbatim by the executor UDF and the test
    reference."""
    v = len(model["unigrams"]) + 1
    p = (model["n1_back"].get(w, 0) + 1.0) / (model["n_bigrams"] + v)
    order = model["order"]
    ds = model["discounts"]
    for k in range(2, order):  # middle orders, continuation counts
        c = context[-(k - 1):]
        t = model["cont_ctx"][k].get(c, 0)
        if t > 0:
            d = ds[k]
            n = model["cont"][k].get(c + (w,), 0)
            fan = model["cont_fan"][k].get(c, 0)
            p = max(n - d, 0.0) / t + d * fan / t * p
    c = context[-(order - 1):]
    t = model["top_ctx"].get(c, 0)
    if t > 0:
        d = ds[order]
        n = model["raw_top"].get(c + (w,), 0)
        fan = model["top_fan"].get(c, 0)
        p = max(n - d, 0.0) / t + d * fan / t * p
    return p


def _knn_logprob(tokens: list[str], model: dict) -> float:
    """Mean negative log2 probability (bits/token) under order-n KN.
    Context starts BOS-padded to order−1 (the single-BOS training prefix
    means the all-BOS top context is untrained and backs off naturally —
    the trigram model's convention)."""
    if not tokens:
        return 0.0
    order = model["order"]
    ctx = (BOS,) * (order - 1)
    bits = 0.0
    for tok in tokens:
        bits -= math.log2(_knn_prob(ctx, tok, model))
        ctx = ctx[1:] + (tok,)
    return bits / len(tokens)


def make_knn_perplexity_scorer(spark, model: dict):
    """Arrow-batched order-n KN scorer — same contract as
    :func:`make_perplexity_scorer` (``ARRAY<STRING>`` BOS-prefixed tokens
    → bits/token; broadcast model, dict-hit per-row work)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    for key in ("order", "raw_top", "top_ctx", "cont", "cont_ctx",
                "discounts"):
        if key not in model:
            raise ValueError(
                f"not an order-n KN model (missing {key!r}); "
                "use train_kn_ngram_model"
            )
    bc = spark.sparkContext.broadcast(model)

    def scorer(tokens):
        m = bc.value

        def one(seq) -> float:
            if seq is None or len(seq) == 0:
                return 0.0
            return _knn_logprob(list(seq[1:]), m)

        return tokens.map(one)

    scorer.__annotations__ = {"tokens": pd.Series, "return": pd.Series}
    return pandas_udf("double")(scorer)


def reference_knn_bits_per_token(text: str, model: dict) -> float:
    """Independent-entry reference: shared Python tokenization mirror +
    the same pure scoring function."""
    return _knn_logprob(py_clean_tokens(text), model)


def perplexity_buckets(
    df: DataFrame,
    score_col: str,
    probs: tuple[float, ...] = (1.0 / 3, 2.0 / 3),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    bucket_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by perplexity
    percentile (head = lowest = most in-distribution — the slice CCNet
    keeps or upsamples).

    Scale shape: thresholds come from ONE exact ``percentile`` aggregate
    (a len(probs)-double driver value — NOT a global sort, NOT a global
    NTILE window, which would funnel the corpus through one task);
    assignment is then a narrow CASE over the score column. At 100 TB
    swap the exact percentile for ``approx_percentile`` — one line, same
    plan shape, documented accuracy trade.
    """
    if len(labels) != len(probs) + 1:
        raise ValueError(
            f"need len(probs)+1 labels, got {len(labels)} for {len(probs)}"
        )
    ths = df.select(
        F.percentile(F.col(score_col), F.lit(list(probs))).alias("t")
    ).first()["t"]
    expr = None
    for th, label in zip(ths, labels):
        cond = F.col(score_col) <= F.lit(float(th))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = expr.otherwise(labels[-1])
    return df.withColumn(bucket_col, expr)
