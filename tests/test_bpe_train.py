"""BPE tokenizer TRAINING (functions/text.py::train_bpe) vs an
INDEPENDENT recount-from-scratch reference: the production trainer
maintains pair counts incrementally (the classic trainer bug surface);
the reference recounts every pair from the expanded word table each
iteration — same published algorithm (Sennrich et al. 2016), different
implementation strategy, so agreement on random corpora is evidence the
incremental bookkeeping is right. Plus apply-parity through
make_bpe_counter, partitioning determinism, and the one-scan plan shape."""

import random
import re

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
    _byte_to_unicode,
    bpe_piece_counts,
    bpe_pretokenize,
    make_bpe_counter,
    train_bpe,
)

# Python-re mirror of the GPT-2 pretokenizer for ASCII corpora ((?!\S) is
# supported by re; \p{L}/\p{N} narrowed to ASCII classes — tests use ASCII)
_PY_PRETOKEN = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)|\s+"
)


def _py_pieces(text: str) -> list[str]:
    return _PY_PRETOKEN.findall(text)


def _merge_word_ref(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _reference_train(texts, n_merges, min_pair_count=2, byte_level=False):
    """Recount-from-scratch trainer over Python-pretokenized pieces."""
    table = _byte_to_unicode() if byte_level else None
    freq: dict[str, int] = {}
    for t in texts:
        for p in _py_pieces(t):
            freq[p] = freq.get(p, 0) + 1
    words = [
        (
            tuple(table[b] for b in p.encode("utf-8"))
            if table
            else tuple(p),
            n,
        )
        for p, n in freq.items()
    ]
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in words:
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                counts[pr] = counts.get(pr, 0) + cnt
        if not counts:
            break
        best, best_n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < min_pair_count:
            break
        merges.append(best)
        words = [(_merge_word_ref(s, best), c) for s, c in words]
    return merges


def _py_apply_count(text, merges, byte_level=False):
    """Independent full BPE apply: greedy lowest-rank merge per piece."""
    table = _byte_to_unicode() if byte_level else None
    ranks = {pair: i for i, pair in enumerate(merges)}
    total = 0
    for p in _py_pieces(text):
        word = (
            [table[b] for b in p.encode("utf-8")] if table else list(p)
        )
        while len(word) > 1:
            cands = [
                (ranks[(word[i], word[i + 1])], i)
                for i in range(len(word) - 1)
                if (word[i], word[i + 1]) in ranks
            ]
            if not cands:
                break
            _, i = min(cands)
            pair = (word[i], word[i + 1])
            word = list(_merge_word_ref(tuple(word), pair))
        total += len(word)
    return total


def _corpus(n=120, seed=5):
    rng = random.Random(seed)
    vocab = [
        "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs",
        "training", "tokenizer", "corpus", "merge", "pairs", "12345",
        "data,", "pipeline!", "spark's",
    ]
    return [
        " ".join(rng.choices(vocab, k=rng.randint(3, 12))) for _ in range(n)
    ]


def test_train_matches_recount_reference(spark):
    texts = _corpus()
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe(df, "text", n_merges=40)
    want = _reference_train(texts, n_merges=40)
    assert got == want
    assert len(got) == 40


def test_apply_parity_and_monotonicity(spark):
    texts = _corpus(seed=9)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = train_bpe(df, "text", n_merges=60)
    counter = make_bpe_counter(spark, merges)
    out = df.select(
        F.col("text"), counter(bpe_pretokenize(F.col("text"))).alias("n")
    ).collect()
    for r in out:
        assert r["n"] == _py_apply_count(r["text"], merges)
    # more merges never increase any document's token count
    few = make_bpe_counter(spark, merges[:10])
    pairs = (
        df.select(
            few(bpe_pretokenize(F.col("text"))).alias("a"),
            counter(bpe_pretokenize(F.col("text"))).alias("b"),
        ).collect()
    )
    assert all(r["b"] <= r["a"] for r in pairs)


def test_deterministic_across_partitionings(spark):
    texts = _corpus(seed=21)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = train_bpe(df.repartition(13), "text", n_merges=25)
    b = train_bpe(df.coalesce(1), "text", n_merges=25)
    assert a == b


def test_byte_level_training(spark):
    texts = ["héllo wörld héllo", "héllo wörld", "naïve héllo café"] * 10
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = train_bpe(df, "text", n_merges=15, byte_level=True)
    assert merges  # learned something
    alphabet = set(_byte_to_unicode().values())
    # every merge symbol is built from the published byte alphabet
    for a, b in merges:
        assert set(a) <= alphabet and set(b) <= alphabet
    counter = make_bpe_counter(spark, merges, byte_level=True)
    out = df.limit(3).select(
        counter(bpe_pretokenize(F.col("text"))).alias("n")
    ).collect()
    assert all(r["n"] > 0 for r in out)


def test_min_pair_count_stops_early(spark):
    # every piece distinct and size-2: all pairs occur exactly once
    df = spark.createDataFrame(
        [("ab cd ef gh ij kl",)], "text string"
    )
    assert train_bpe(df, "text", n_merges=10, min_pair_count=2) == []
    got = train_bpe(df, "text", n_merges=3, min_pair_count=1)
    assert len(got) == 3  # with threshold 1 it proceeds deterministically


def test_piece_counts_is_one_scan(spark):
    df = spark.createDataFrame([(t,) for t in _corpus(20)], "text string")
    plan = bpe_piece_counts(df, "text")._jdf.queryExecution().executedPlan().toString()
    # one exchange (the final hash aggregate), partial agg before it
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan or "partial" in plan.lower()


def test_merges_txt_roundtrip_and_vocab(spark, tmp_path):
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        bpe_vocab,
        load_merges,
        save_merges,
    )

    import pytest

    df = spark.createDataFrame([(t,) for t in _corpus(seed=31)], "text string")
    # char-level merges can hold literal-space symbols the space-separated
    # format cannot represent — save refuses those
    with pytest.raises(ValueError, match="byte_level"):
        save_merges(train_bpe(df, "text", n_merges=20), str(tmp_path / "x"))
    merges = train_bpe(df, "text", n_merges=20, byte_level=True)
    p = str(tmp_path / "merges.txt")
    save_merges(merges, p)
    with open(p, encoding="utf-8") as f:
        first = f.readline()
    assert first.startswith("#version")
    assert load_merges(p) == merges
    # loaded merges drive the counter identically
    c1 = make_bpe_counter(spark, merges, byte_level=True)
    c2 = make_bpe_counter(spark, load_merges(p), byte_level=True)
    row = df.limit(1).select(
        c1(bpe_pretokenize(F.col("text"))).alias("a"),
        c2(bpe_pretokenize(F.col("text"))).alias("b"),
    ).collect()[0]
    assert row["a"] == row["b"]
    vocab = bpe_vocab(merges, byte_level=True)
    assert len(vocab) == 256 + len(merges)
    assert vocab[-1] == merges[-1][0] + merges[-1][1]
    # every merge output token appears after its operands' positions
    pos = {tok: i for i, tok in enumerate(vocab)}
    for a, b in merges:
        assert pos[a + b] > max(pos.get(a, -1), pos.get(b, -1))
    cvocab = bpe_vocab([("a", "b"), ("ab", "c")])
    assert cvocab == ["a", "b", "c", "ab", "abc"]
