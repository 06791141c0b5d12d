"""WordPiece and unigram-LM tokenizers vs INDEPENDENT references.

WordPiece: the production trainer keeps pair/symbol counts incrementally;
the reference here recounts everything from scratch each iteration with
exact Fraction arithmetic for the likelihood score — agreement on random
corpora is evidence the incremental bookkeeping is right. Unigram:
forward-backward expected counts and Viterbi segmentation are checked
against brute-force enumeration over ALL segmentations. Plus
partitioning determinism and Arrow-batched apply parity."""

import itertools
import math
import random
import re
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.text import bpe_pretokenize
from sample_dms_kinesis_rds_mariadb_spark.functions.tokenizers import (
    _forward_backward,
    _viterbi_segment,
    _wp_merge_symbol,
    _wp_symbolize,
    make_unigram_tokenizer,
    make_wordpiece_tokenizer,
    train_unigram,
    train_wordpiece,
    unigram_tokenize,
    wordpiece_tokenize,
)

_PY_PRETOKEN = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)|\s+"
)

SPECIALS = ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")


def _reference_wordpiece(texts, vocab_size, min_pair_count=2):
    """Recount-from-scratch WordPiece trainer (exact Fraction scores)."""
    freq: dict[str, int] = {}
    for t in texts:
        for p in _PY_PRETOKEN.findall(t):
            if p:
                freq[p] = freq.get(p, 0) + 1
    words = [[list(_wp_symbolize(p)), n] for p, n in freq.items()]
    alphabet = sorted({s for syms, _ in words for s in syms})
    vocab = list(SPECIALS) + alphabet
    seen = set(vocab)
    while len(vocab) < vocab_size:
        sym_counts: dict[str, int] = {}
        pair_counts: dict[tuple, int] = {}
        for syms, n in words:
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + n
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        best = min(
            pair_counts,
            key=lambda p: (
                -Fraction(pair_counts[p], sym_counts[p[0]] * sym_counts[p[1]]),
                p,
            ),
        )
        if pair_counts[best] < min_pair_count:
            break
        merged = _wp_merge_symbol(*best)
        for w in words:
            syms = w[0]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            w[0] = out
        if merged not in seen:
            vocab.append(merged)
            seen.add(merged)
    return vocab


CORPUS_WORDS = [
    "the", "their", "there", "then", "than", "thinking", "unaffable",
    "unhappy", "unfair", "running", "runner", "run", "jumped", "jumping",
    "lower", "lowest", "newer", "newest", "wider",
]


def _random_corpus(seed: int, n_docs: int = 40) -> list[str]:
    rng = random.Random(seed)
    return [
        " ".join(rng.choices(CORPUS_WORDS, k=rng.randint(3, 12)))
        for _ in range(n_docs)
    ]


@pytest.mark.parametrize("seed", [0, 1])
def test_wordpiece_trainer_matches_reference(spark, seed):
    texts = _random_corpus(seed)
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = train_wordpiece(df, "text", vocab_size=60, specials=SPECIALS)
    want = _reference_wordpiece(texts, vocab_size=60)
    assert got == want


def test_wordpiece_partitioning_invariance(spark):
    texts = _random_corpus(7)
    df1 = spark.createDataFrame([(t,) for t in texts], "text STRING").coalesce(1)
    df7 = spark.createDataFrame([(t,) for t in texts], "text STRING").repartition(7)
    assert train_wordpiece(df1, "text", 50) == train_wordpiece(df7, "text", 50)


def test_wordpiece_tokenize_handchecked():
    vocab = {"un", "##aff", "##able", "##happy", "runn", "##ing", "r",
             "u", "n", "a"}
    assert wordpiece_tokenize("unaffable", vocab) == ["un", "##aff", "##able"]
    assert wordpiece_tokenize("unhappy", vocab) == ["un", "##happy"]
    assert wordpiece_tokenize("running", vocab) == ["runn", "##ing"]
    # greedy longest-first: 'runn' wins over 'r'+'##...' paths
    assert wordpiece_tokenize("zebra", vocab) == ["[UNK]"]  # no 'z'
    assert wordpiece_tokenize("x" * 500, vocab) == ["[UNK]"]  # length cap


def test_wordpiece_spark_apply_parity(spark):
    texts = _random_corpus(3)
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    vocab = train_wordpiece(df, "text", 70)
    tok = make_wordpiece_tokenizer(spark, vocab)
    out = df.select(
        F.col("text"), tok(bpe_pretokenize(F.col("text"))).alias("toks")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
    vset = set(vocab)
    for r in out.collect():
        expect = []
        for p in _PY_PRETOKEN.findall(r["text"]):
            expect.extend(wordpiece_tokenize(p, vset))
        assert list(r["toks"]) == expect
    # every non-UNK token round-trips: join of pieces reconstructs text
    any_tokens = out.collect()[0]["toks"]
    assert all(t in vset for t in any_tokens)


# --- unigram --------------------------------------------------------------


def _brute_segmentations(piece: str, logp: dict, max_len: int):
    """All (tokens, logprob) segmentations by brute force."""
    n = len(piece)
    results = []

    def rec(pos, toks, acc):
        if pos == n:
            results.append((list(toks), acc))
            return
        for end in range(pos + 1, min(pos + max_len, n) + 1):
            t = piece[pos:end]
            if t in logp:
                toks.append(t)
                rec(end, toks, acc + logp[t])
                toks.pop()

    rec(0, [], 0.0)
    return results


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_viterbi_and_forward_backward_vs_bruteforce(seed):
    rng = random.Random(seed)
    alphabet = "abc"
    # random model over chars + random substrings
    toks = set(alphabet)
    for _ in range(8):
        L = rng.randint(2, 4)
        toks.add("".join(rng.choices(alphabet, k=L)))
    logp = {t: -rng.uniform(0.5, 5.0) for t in toks}
    for _ in range(10):
        piece = "".join(rng.choices(alphabet, k=rng.randint(1, 9)))
        segs = _brute_segmentations(piece, logp, 4)
        vit_toks, vit_score = _viterbi_segment(piece, logp, 4)
        assert segs, piece  # chars present -> always segmentable
        best_toks, best_score = max(segs, key=lambda s: s[1])
        assert vit_score == pytest.approx(best_score)
        assert vit_score >= max(s for _, s in segs) - 1e-12
        # forward-backward: z = logsumexp over all segmentations; expected
        # counts = posterior-weighted token counts
        exp, z = _forward_backward(piece, logp, 4)
        want_z = math.log(sum(math.exp(s) for _, s in segs))
        assert z == pytest.approx(want_z)
        want_exp: dict[str, float] = {}
        for toks_i, s in segs:
            w = math.exp(s - want_z)
            for t in toks_i:
                want_exp[t] = want_exp.get(t, 0.0) + w
        assert set(exp) == set(want_exp)
        for t in exp:
            assert exp[t] == pytest.approx(want_exp[t], abs=1e-9)


def test_unigram_train_properties(spark):
    texts = _random_corpus(11, n_docs=60)
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    model = train_unigram(df, "text", vocab_size=80)
    # normalized: probabilities sum to 1
    assert sum(math.exp(p) for p in model.values()) == pytest.approx(1.0)
    chars = {c for t in texts for p in _PY_PRETOKEN.findall(t) for c in p}
    assert chars <= set(model)  # fallback alphabet always survives
    n_multi = sum(1 for t in model if len(t) > 1)
    assert n_multi <= 80
    # frequent whole words should have survived as single tokens
    survivors = [t for t in model if len(t) > 2]
    assert survivors, "no multi-char tokens learned"
    # determinism across partitioning
    df5 = spark.createDataFrame([(t,) for t in texts], "text STRING").repartition(5)
    assert train_unigram(df5, "text", vocab_size=80) == model


def test_unigram_tokenize_and_spark_parity(spark):
    texts = _random_corpus(13)
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    model = train_unigram(df, "text", vocab_size=60)
    # fallback: unsegmentable piece (char outside model) -> chars
    assert unigram_tokenize("éé", {"a": -1.0}) == ["é", "é"]
    tok = make_unigram_tokenizer(spark, model)
    out = df.select("text", tok(bpe_pretokenize(F.col("text"))).alias("toks"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    for r in out.collect():
        expect = []
        for p in _PY_PRETOKEN.findall(r["text"]):
            expect.extend(unigram_tokenize(p, model))
        assert list(r["toks"]) == expect
        # lossless: concatenation reconstructs the pretokens
        assert "".join(r["toks"]) == "".join(_PY_PRETOKEN.findall(r["text"]))


def test_artifact_interchange_roundtrip(spark, tmp_path):
    """vocab.txt (BERT convention) and unigram tsv round-trip exactly;
    a tokenizer rebuilt from the loaded artifacts segments identically."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.tokenizers import (
        load_unigram_model,
        load_wordpiece_vocab,
        save_unigram_model,
        save_wordpiece_vocab,
    )

    texts = _random_corpus(19)
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    vocab = train_wordpiece(df, "text", 60)
    vp = tmp_path / "vocab.txt"
    save_wordpiece_vocab(vocab, str(vp))
    loaded = load_wordpiece_vocab(str(vp))
    assert loaded == vocab
    # ids are line numbers: the BERT contract
    assert loaded.index("[UNK]") == vocab.index("[UNK]")
    for piece in ("the", "running", "unhappy"):
        assert wordpiece_tokenize(piece, set(loaded)) == wordpiece_tokenize(
            piece, set(vocab)
        )
    with pytest.raises(ValueError, match="not representable"):
        save_wordpiece_vocab(["ok", "bad\ntoken"], str(vp))

    model = train_unigram(df, "text", vocab_size=50)
    mp = tmp_path / "unigram.tsv"
    save_unigram_model(model, str(mp))
    loaded_m = load_unigram_model(str(mp))
    assert loaded_m == model  # repr round-trip: bit-exact floats
    for piece in (" the", " lowest"):
        assert unigram_tokenize(piece, loaded_m) == unigram_tokenize(piece, model)
