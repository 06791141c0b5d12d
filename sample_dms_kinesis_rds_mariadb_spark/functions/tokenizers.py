"""WordPiece and unigram-LM tokenizer training/inference — the two
non-BPE subword families an LLM data pipeline standardizes on (BERT-style
WordPiece, SentencePiece-style unigram), as duals of the BPE trainer in
``functions/text.py``.

Both trainers share the BPE trainer's scale shape: the corpus is touched
by ONE distributed scan (``bpe_piece_counts`` — pretokenize, explode,
hash-aggregate with map-side partial aggregation), and the learning loop
runs on the driver over the BOUNDED (piece, count) frequency table —
vocabulary-sized, not corpus-sized. Inference is Arrow-batched
``pandas_udf`` over pretoken arrays with a per-worker memo cache, never
per-row Python UDFs.

Algorithms are the published ones: WordPiece merge selection maximizes
the likelihood score count(ab) / (count(a)·count(b)) (Schuster &
Nakajima 2012; the BERT/HF `tokenizers` trainer), with the ``##``
continuing-subword prefix; unigram-LM runs EM with forward-backward
expected counts and prunes by likelihood loss (Kudo 2018, SentencePiece).
"""

from __future__ import annotations

import math

from pyspark.sql.functions import pandas_udf

from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
    bpe_piece_counts,
)

_WP_PREFIX = "##"


def _wp_symbolize(piece: str) -> tuple[str, ...]:
    """Initial WordPiece symbols: first char bare, rest ##-prefixed."""
    return tuple(
        c if i == 0 else _WP_PREFIX + c for i, c in enumerate(piece)
    )


def _wp_merge_symbol(a: str, b: str) -> str:
    """Merged token keeps a's word-start/continuation role; b always
    contributes its bare content (its ## is positional, not content)."""
    return a + (b[len(_WP_PREFIX):] if b.startswith(_WP_PREFIX) else b)


def train_wordpiece(
    df,
    text_col: str,
    vocab_size: int,
    min_pair_count: int = 2,
    specials: tuple[str, ...] = ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"),
) -> list[str]:
    """Learn a WordPiece vocabulary from a corpus.

    Greedy agglomerative training over the distributed (piece, count)
    table: repeatedly merge the adjacent symbol pair with the highest
    likelihood score count(ab) / (count(a)·count(b)), until the vocab
    (specials + alphabet + merged tokens) reaches ``vocab_size`` or the
    best pair's raw count drops below ``min_pair_count``. Ties break on
    the lexicographically smallest pair, so training is DETERMINISTIC —
    independent of partitioning and row order.

    Driver cost is the same incremental-update loop as ``train_bpe``
    (only words containing the merged pair are re-paired), plus symbol
    unigram counts for the score's denominator.

    Verified in tests/test_tokenizers.py against an independent
    recount-from-scratch trainer and hand-checked tokenizations.
    """
    rows = bpe_piece_counts(df, text_col).collect()
    words: list[tuple[tuple[str, ...], int]] = [
        (_wp_symbolize(r["piece"]), int(r["n"])) for r in rows if r["piece"]
    ]
    sym_counts: dict[str, int] = {}
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, (syms, cnt) in enumerate(words):
        for s in syms:
            sym_counts[s] = sym_counts.get(s, 0) + cnt
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            pair_words.setdefault(p, set()).add(wid)

    vocab: list[str] = list(specials) + sorted(sym_counts)
    seen = set(vocab)

    def merge_word(syms: tuple[str, ...], pair: tuple[str, str]):
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
                out.append(_wp_merge_symbol(syms[i], syms[i + 1]))
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    while len(vocab) < vocab_size and pair_counts:
        # score in exact rational arithmetic: count(ab)/(count(a)count(b))
        # compared via cross-multiplication to keep tie-breaks exact
        best = None
        best_num = best_den = 0
        for p, n in pair_counts.items():
            den = sym_counts.get(p[0], 0) * sym_counts.get(p[1], 0)
            if den <= 0:
                continue
            # n/den > best_num/best_den  <=>  n*best_den > best_num*den
            if best is None or n * best_den > best_num * den or (
                n * best_den == best_num * den and p < best
            ):
                best, best_num, best_den = p, n, den
        if best is None or pair_counts[best] < min_pair_count:
            break
        merged = _wp_merge_symbol(*best)
        if merged not in seen:
            vocab.append(merged)
            seen.add(merged)
        sym_counts[merged] = sym_counts.get(merged, 0)
        for wid in list(pair_words.get(best, ())):
            syms, cnt = words[wid]
            new_syms = merge_word(syms, best)
            for seq, sign in ((syms, -cnt), (new_syms, cnt)):
                for s in seq:
                    sym_counts[s] = sym_counts.get(s, 0) + sign
                for i in range(len(seq) - 1):
                    p = (seq[i], seq[i + 1])
                    n = pair_counts.get(p, 0) + sign
                    if n > 0:
                        pair_counts[p] = n
                    else:
                        pair_counts.pop(p, None)
                    if sign > 0:
                        pair_words.setdefault(p, set()).add(wid)
            old_pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
            new_pairs = {
                (new_syms[i], new_syms[i + 1]) for i in range(len(new_syms) - 1)
            }
            for p in old_pairs - new_pairs:
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wid)
                    if not ws:
                        pair_words.pop(p, None)
            words[wid] = (new_syms, cnt)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
        # prune zero/negative symbol counts so scores stay well-defined
        sym_counts = {s: c for s, c in sym_counts.items() if c > 0 or s == merged}
    return vocab


def wordpiece_tokenize(
    piece: str, vocab: set[str], unk: str = "[UNK]", max_chars: int = 200
) -> list[str]:
    """Greedy longest-match-first WordPiece segmentation of one pretoken
    (the BERT `WordpieceTokenizer` algorithm): at each position take the
    longest vocab entry (##-prefixed after the first), or collapse the
    whole piece to ``unk`` when any position has no match."""
    if len(piece) > max_chars:
        return [unk]
    out: list[str] = []
    start = 0
    while start < len(piece):
        end = len(piece)
        cur = None
        while start < end:
            sub = piece[start:end]
            if start > 0:
                sub = _WP_PREFIX + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk]
        out.append(cur)
        start = end
    return out


def make_wordpiece_tokenizer(spark, vocab, unk: str = "[UNK]"):
    """Arrow-batched ``pandas_udf``: pretoken array → WordPiece token
    array, broadcast vocab, per-worker memo cache (same worker-lifetime
    cache discipline as ``make_bpe_counter``)."""
    import pandas as pd

    bc = spark.sparkContext.broadcast(set(vocab))
    cache: dict[str, list[str]] = {}
    _CACHE_CAP = 1_000_000

    def wp_tokenizer(pretokens):
        v = bc.value

        def doc_tokens(pieces):
            if pieces is None:
                return []
            toks: list[str] = []
            for p in pieces:
                t = cache.get(p)
                if t is None:
                    if len(cache) >= _CACHE_CAP:
                        cache.clear()
                    t = wordpiece_tokenize(p, v, unk)
                    cache[p] = t
                toks.extend(t)
            return toks

        return pretokens.map(doc_tokens)

    wp_tokenizer.__annotations__ = {"pretokens": pd.Series, "return": pd.Series}
    return pandas_udf("array<string>")(wp_tokenizer)


# --- unigram LM (SentencePiece) ------------------------------------------


def _viterbi_segment(
    piece: str, logp: dict[str, float], max_len: int
) -> tuple[list[str], float]:
    """Max-probability segmentation under a unigram model (None-free:
    pieces the model can't segment return ([], -inf))."""
    n = len(piece)
    best = [(-math.inf, -1)] * (n + 1)
    best[0] = (0.0, -1)
    for e in range(1, n + 1):
        for s in range(max(0, e - max_len), e):
            if best[s][0] == -math.inf:
                continue
            lp = logp.get(piece[s:e])
            if lp is None:
                continue
            cand = best[s][0] + lp
            if cand > best[e][0]:
                best[e] = (cand, s)
    if best[n][0] == -math.inf:
        return [], -math.inf
    out = []
    e = n
    while e > 0:
        s = best[e][1]
        out.append(piece[s:e])
        e = s
    return out[::-1], best[n][0]


def _forward_backward(
    piece: str, logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """Expected token counts over ALL segmentations of ``piece`` and the
    total log-likelihood (log-sum over segmentations) — the E-step."""
    n = len(piece)
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    spans: list[tuple[int, int, str, float]] = []
    for e in range(1, n + 1):
        acc = -math.inf
        for s in range(max(0, e - max_len), e):
            lp = logp.get(piece[s:e])
            if lp is None or alpha[s] == -math.inf:
                continue
            spans.append((s, e, piece[s:e], lp))
            acc = _logadd(acc, alpha[s] + lp)
        alpha[e] = acc
    if alpha[n] == -math.inf:
        return {}, -math.inf
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for s, e, tok, lp in reversed(spans):
        beta[s] = _logadd(beta[s], lp + beta[e])
    z = alpha[n]
    exp: dict[str, float] = {}
    for s, e, tok, lp in spans:
        post = math.exp(alpha[s] + lp + beta[e] - z)
        exp[tok] = exp.get(tok, 0.0) + post
    return exp, z


def _logadd(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    m = a if a > b else b
    return m + math.log1p(math.exp(-abs(a - b)))


def train_unigram(
    df,
    text_col: str,
    vocab_size: int,
    seed_size: int = 0,
    max_piece_len: int = 8,
    n_em_iters: int = 2,
    prune_frac: float = 0.25,
) -> dict[str, float]:
    """Learn a unigram-LM vocabulary {token: log-prob} (Kudo 2018).

    Seeding: all substrings of corpus pieces up to ``max_piece_len``,
    scored by occurrence-count × length, top ``seed_size`` (default
    ``8 × vocab_size``) plus every single character (so segmentation
    never fails). Then alternate: EM (forward-backward expected counts
    over the bounded piece table, counts weighted by piece frequency) and
    pruning (drop the ``prune_frac`` of multi-char tokens with the lowest
    estimated likelihood loss — approximated, as in SentencePiece, by the
    token's expected count × its log-prob deficit vs its Viterbi
    alternative; we use the standard simpler proxy: lowest expected
    count) until ``vocab_size`` remains.

    Scale shape: ONE distributed corpus scan (``bpe_piece_counts``); the
    EM/prune loop is driver-side over the distinct-piece table — the same
    bounded collect as ``train_bpe``. Deterministic: ties break on the
    token string.
    """
    rows = bpe_piece_counts(df, text_col).collect()
    # sorted: float accumulation order (and so every learned log-prob,
    # bit-for-bit) must not depend on partitioning/arrival order
    pieces = sorted((r["piece"], int(r["n"])) for r in rows if r["piece"])
    if not pieces:
        return {}
    if seed_size <= 0:
        seed_size = 8 * vocab_size
    # seed: substring counts (driver-side over the bounded piece table)
    sub_counts: dict[str, int] = {}
    for piece, cnt in pieces:
        L = len(piece)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                s = piece[i:j]
                sub_counts[s] = sub_counts.get(s, 0) + cnt
    chars = {s for s in sub_counts if len(s) == 1}
    multi = sorted(
        (s for s in sub_counts if len(s) > 1),
        key=lambda s: (-sub_counts[s] * len(s), s),
    )[: max(seed_size - len(chars), 0)]
    vocab = chars | set(multi)
    total = sum(sub_counts[s] for s in vocab)
    logp = {s: math.log(sub_counts[s] / total) for s in vocab}

    def em_round(logp: dict[str, float]) -> dict[str, float]:
        exp_counts: dict[str, float] = {}
        for piece, cnt in pieces:
            exp, z = _forward_backward(piece, logp, max_piece_len)
            if z == -math.inf:
                continue
            for tok, c in exp.items():
                exp_counts[tok] = exp_counts.get(tok, 0.0) + c * cnt
        tot = sum(exp_counts.values())
        if tot <= 0:
            return logp
        # log(c) - log(tot): c/tot can underflow to 0.0 for near-zero
        # posterior counts while log(c) is still finite
        ltot = math.log(tot)
        return {
            t: math.log(c) - ltot for t, c in exp_counts.items() if c > 0
        }

    while True:
        for _ in range(n_em_iters):
            new_logp = em_round(logp)
            # single chars must survive EM even at zero expected count —
            # they are the segmentation fallback
            for c in chars:
                new_logp.setdefault(c, logp.get(c, math.log(1e-12)))
            logp = new_logp
        n_multi = sum(1 for t in logp if len(t) > 1)
        target_multi = max(vocab_size - len(chars), 0)
        if n_multi <= target_multi:
            break
        # prune lowest-expected-probability multi-char tokens, at least one
        # per round, never past the target
        drop_n = min(max(int(n_multi * prune_frac), 1), n_multi - target_multi)
        victims = sorted(
            (t for t in logp if len(t) > 1), key=lambda t: (logp[t], t)
        )[:drop_n]
        for t in victims:
            del logp[t]
    # renormalize after final prune
    tot = sum(math.exp(p) for p in logp.values())
    return {t: p - math.log(tot) for t, p in logp.items()}


def unigram_tokenize(
    piece: str, logp: dict[str, float], max_piece_len: int = 8
) -> list[str]:
    """Viterbi (max-probability) segmentation — SentencePiece's default
    inference. Unsegmentable pieces fall back to characters."""
    toks, score = _viterbi_segment(piece, logp, max_piece_len)
    if score == -math.inf:
        return list(piece)
    return toks


def make_unigram_tokenizer(spark, logp: dict[str, float], max_piece_len: int = 8):
    """Arrow-batched ``pandas_udf``: pretoken array → unigram token array
    (broadcast model, worker-lifetime memo cache)."""
    import pandas as pd

    bc = spark.sparkContext.broadcast(dict(logp))
    cache: dict[str, list[str]] = {}
    _CACHE_CAP = 1_000_000

    def ug_tokenizer(pretokens):
        model = bc.value

        def doc_tokens(pieces):
            if pieces is None:
                return []
            toks: list[str] = []
            for p in pieces:
                t = cache.get(p)
                if t is None:
                    if len(cache) >= _CACHE_CAP:
                        cache.clear()
                    t = unigram_tokenize(p, model, max_piece_len)
                    cache[p] = t
                toks.extend(t)
            return toks

        return pretokens.map(doc_tokens)

    ug_tokenizer.__annotations__ = {"pretokens": pd.Series, "return": pd.Series}
    return pandas_udf("array<string>")(ug_tokenizer)


# --- artifact interchange -------------------------------------------------


def save_wordpiece_vocab(vocab: list[str], path: str) -> None:
    """Write a WordPiece vocabulary in the BERT ``vocab.txt`` convention:
    one token per line, line number = token id — drops into any BERT-style
    tokenizer, and their files load here. Tokens containing newlines are
    unrepresentable and raise."""
    for t in vocab:
        if "\n" in t or "\r" in t:
            raise ValueError(f"token {t!r} not representable in vocab.txt")
    with open(path, "w", encoding="utf-8") as f:
        for t in vocab:
            f.write(t + "\n")


def load_wordpiece_vocab(path: str) -> list[str]:
    """Read a BERT-style ``vocab.txt`` (one token per line, id = line
    number). Blank interior lines are preserved as tokens only when BERT
    files do so; trailing newline is not a token."""
    with open(path, encoding="utf-8") as f:
        lines = f.read().split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return lines


def save_unigram_model(logp: dict[str, float], path: str) -> None:
    """Write a unigram model in the SentencePiece-export convention: one
    ``token<TAB>log_prob`` per line, sorted by descending probability then
    token (deterministic files). ``repr``-precision floats round-trip
    bit-exactly through ``load_unigram_model``."""
    for t in logp:
        if "\n" in t or "\t" in t or "\r" in t:
            raise ValueError(f"token {t!r} not representable in model tsv")
    with open(path, "w", encoding="utf-8") as f:
        for t in sorted(logp, key=lambda t: (-logp[t], t)):
            f.write(f"{t}\t{logp[t]!r}\n")


def load_unigram_model(path: str) -> dict[str, float]:
    """Read a ``token<TAB>log_prob`` model file back into the dict
    :func:`unigram_tokenize` / :func:`make_unigram_tokenizer` consume."""
    out: dict[str, float] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            tok, _, lp = line.partition("\t")
            if not lp:
                raise ValueError(f"malformed unigram model line: {line!r}")
            out[tok] = float(lp)
    return out
