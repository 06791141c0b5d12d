"""Text-analysis functions for training-data pipelines (north-star ops).

All built from `pyspark.sql.functions` primitives — JVM-side, codegen'd, no
Python UDFs — so they run at full scan speed over 100 TB of documents. The
md5-based fingerprints are chosen deliberately: md5 produces identical hex in
every engine, which makes these operators independently verifiable against
the DuckDB oracle (plans/llm_queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE = r"\s+"


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace, trim — canonical form for dedup."""
    return F.lower(F.trim(F.regexp_replace(col, WHITESPACE, " ")))


def tokenize(col: Column) -> Column:
    """Whitespace tokenization of trimmed text → ARRAY<STRING>."""
    return F.split(F.trim(col), WHITESPACE)


def token_count(col: Column) -> Column:
    # split('') yields [''] — an empty document has ZERO tokens, not one
    # (NULL text stays NULL: trim(NULL) is NULL, so the when falls through
    # to size(NULL)); the DuckDB oracles carry the matching CASE
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokenize(col)))


def clean_tokens(col: Column) -> Column:
    """Normalized tokens with empty strings dropped — ``split('')`` yields
    ``['']``, which would count empty documents as one-token documents.
    THE shared tokenization for every scoring operator (BM25, classifier,
    LM): one definition here keeps their cross-engine references aligned
    (:func:`py_clean_tokens` is the Python mirror)."""
    return F.filter(tokenize(normalize_text(col)), lambda t: t != F.lit(""))


def py_clean_tokens(text: str) -> list[str]:
    r"""Pure-Python mirror of :func:`clean_tokens` for parity references:
    same whitespace collapse, trim, lowercase, empty-drop. The whitespace
    class is the ASCII one Java's ``\s`` matches — Python's ``\s`` also
    matches Unicode whitespace (NBSP & co., common in scraped HTML), which
    would silently tokenize differently from the Spark side."""
    import re

    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text).strip().lower()
    return [t for t in norm.split(" ") if t]


# GPT-2-style pre-tokenizer pattern (public, from the GPT-2 release):
# contractions, letter runs, digit runs, punctuation runs (each with an
# optional leading space), then residual whitespace. Java regex flavor —
# \p{L}/\p{N} classes and the (?!\S) lookahead are supported natively.
BPE_PRETOKEN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)


def bpe_pretokenize(col: Column) -> Column:
    """BPE-ish pre-tokenization (the GPT-2 split regex) → ARRAY<STRING>.
    This is the *pre*-tokenizer: real BPE would further merge within these
    pieces against a learned vocabulary, so this count upper-bounds and
    tracks the true BPE token count. Pure JVM regexp — no Python workers."""
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN), 0)


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_pretokenize(col))


def _byte_to_unicode() -> dict[int, str]:
    """The GPT-2 byte→unicode alphabet (published with the GPT-2 release):
    a bijection from the 256 byte values to printable unicode chars —
    printable latin bytes map to themselves, the rest to 256+n — so
    byte-level merge symbols like ``Ġ`` (= space) are plain dict keys."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = list(bs)
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def make_bpe_counter(spark, merges, byte_level: bool = False):
    """EXACT BPE token counts against a learned merges table — the number a
    training pipeline actually budgets with (``bpe_token_count`` above is the
    pre-tokenizer upper bound).

    ``merges`` is the ordered merge list of a trained BPE vocabulary (pairs
    of symbol strings, highest priority first — the ``merges.txt`` format).
    Two symbol conventions exist in the wild, selected by ``byte_level``:

    - ``byte_level=False``: merge symbols are literal characters (including
      literal spaces) — the convention of character-level BPE releases and
      hand-built vocabularies.
    - ``byte_level=True``: merge symbols use the GPT-2 byte→unicode
      alphabet (``Ġ`` for space, multi-byte chars split into byte symbols)
      — REQUIRED for GPT-2/RoBERTa-family ``merges.txt`` files; each
      piece's UTF-8 bytes are mapped through the published alphabet before
      merging, so counts match the reference encoder exactly.

    Returns an Arrow-batched ``pandas_udf``
    mapping ``ARRAY<STRING>`` pre-token pieces (from :func:`bpe_pretokenize`,
    which stays pure-JVM) to the document's total BPE token count::

        counter = make_bpe_counter(spark, merges)
        df.withColumn("bpe_tokens", counter(bpe_pretokenize(F.col("text"))))

    Scale shape: the merge table ships ONCE per executor via a SparkContext
    broadcast (a 50k-merge GPT-2-class vocab is ~1 MB — broadcast, never a
    per-row closure), the UDF is vectorized over Arrow batches, and a
    per-worker piece cache (outliving batches and tasks) collapses the
    Zipfian head (most pieces repeat), so per-row work is a dict hit for
    common words. The merge loop itself is
    the standard greedy lowest-rank algorithm (Sennrich et al. 2016; the
    GPT-2 reference encoder): repeatedly merge the best-ranked adjacent
    pair until none ranks.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(
        {(a, b): i for i, (a, b) in enumerate(merges)}
    )
    byte_table = _byte_to_unicode() if byte_level else None

    def _n_tokens(piece: str, ranks: dict) -> int:
        if byte_table is not None:
            word = [byte_table[b] for b in piece.encode("utf-8")]
        else:
            word = list(piece)
        while len(word) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(word) - 1):
                r = ranks.get((word[i], word[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            # merge every occurrence of the best pair, left to right
            pair = (word[best_i], word[best_i + 1])
            merged = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and (word[i], word[i + 1]) == pair
                ):
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        return len(word)

    # one cache per Python WORKER process (the closure outlives individual
    # Arrow batches and tasks — workers are reused), so the Zipfian head of
    # common pieces is tokenized once per worker, not once per batch; the
    # cap bounds memory against adversarial vocabularies
    cache: dict[str, int] = {}
    _CACHE_CAP = 1_000_000

    def bpe_counter(pretokens):
        ranks = bc.value

        def doc_count(pieces) -> int:
            if pieces is None:
                return 0
            total = 0
            for p in pieces:
                n = cache.get(p)
                if n is None:
                    if len(cache) >= _CACHE_CAP:
                        cache.clear()
                    n = _n_tokens(p, ranks)
                    cache[p] = n
                total += n
            return total

        return pretokens.map(doc_count)

    # module-wide `from __future__ import annotations` stringifies inline
    # hints, which pandas_udf can't resolve (pandas is a local import here);
    # real class objects make the Series->Series eval type unambiguous
    bpe_counter.__annotations__ = {"pretokens": pd.Series, "return": pd.Series}
    return pandas_udf("long")(bpe_counter)


def bpe_piece_counts(df, text_col: str):
    """ONE distributed corpus scan → (piece, n) frequency table: pretokenize
    (pure-JVM GPT-2 regex), explode, hash-aggregate. This is the entire
    distributed half of BPE *training* — the standard trainer shape
    (SentencePiece / HF tokenizers do exactly this): count word-like pieces
    once over the corpus, then learn merges on the bounded frequency table.
    Partial aggregation collapses the explode map-side, so the shuffle
    carries ≤ |distinct pieces| rows per partition, never corpus-sized."""
    return (
        df.select(F.explode(bpe_pretokenize(F.col(text_col))).alias("piece"))
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    df,
    text_col: str,
    n_merges: int,
    byte_level: bool = False,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn a BPE merge list from a corpus — the trainer dual of
    :func:`make_bpe_counter` (its ``merges`` input is exactly this output).

    Algorithm (Sennrich et al. 2016, the subword-nmt trainer): split each
    piece into symbols (characters, or the GPT-2 byte→unicode alphabet when
    ``byte_level``), then repeatedly merge the most frequent adjacent
    symbol pair, ``n_merges`` times or until the best pair drops below
    ``min_pair_count``. Ties break on the lexicographically smallest pair,
    so the result is DETERMINISTIC — independent of corpus partitioning,
    row order, and dict iteration order.

    Scale shape: the corpus is touched by ONE distributed scan
    (:func:`bpe_piece_counts`); the driver collects only the (piece, count)
    frequency table — bounded by the corpus's distinct-piece vocabulary,
    the same control-plane bound as the n-gram LM's vocab collect, NOT by
    corpus size. The merge loop maintains pair counts incrementally (only
    words containing the merged pair are re-paired per iteration), so
    driver cost is O(affected-words × word-length) per merge.

    Verified in tests/test_bpe_train.py against an independent
    recount-from-scratch reference (the incremental update is the classic
    trainer bug surface), plus apply-parity through ``make_bpe_counter``.
    """
    rows = bpe_piece_counts(df, text_col).collect()
    byte_table = _byte_to_unicode() if byte_level else None

    def symbolize(piece: str) -> tuple[str, ...]:
        if byte_table is not None:
            return tuple(byte_table[b] for b in piece.encode("utf-8"))
        return tuple(piece)

    words: list[tuple[tuple[str, ...], int]] = [
        (symbolize(r["piece"]), int(r["n"])) for r in rows
    ]
    # pair -> total adjacent-occurrence count (overlaps included, the
    # subword-nmt convention); pair -> word ids that contain it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, (syms, cnt) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            pair_words.setdefault(p, set()).add(wid)

    def merge_word(syms: tuple[str, ...], pair: tuple[str, str]):
        # left-to-right non-overlapping — MUST match make_bpe_counter's
        # apply loop or trained merges would disagree with their own counter
        out = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best, best_n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < min_pair_count:
            break
        merges.append(best)
        for wid in list(pair_words.get(best, ())):
            syms, cnt = words[wid]
            new_syms = merge_word(syms, best)
            # full word-level delta: subtract old adjacencies, add new
            for seq, sign in ((syms, -cnt), (new_syms, cnt)):
                for i in range(len(seq) - 1):
                    p = (seq[i], seq[i + 1])
                    n = pair_counts.get(p, 0) + sign
                    if n > 0:
                        pair_counts[p] = n
                    else:
                        pair_counts.pop(p, None)
                    ws = pair_words.setdefault(p, set())
                    if sign > 0:
                        ws.add(wid)
            words[wid] = (new_syms, cnt)
            # membership cleanup: drop this word from pairs it no longer has
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
                        pair_counts.pop(p, None)
    return merges


# tiny high-frequency English function-word set: enough signal for a
# stopword-ratio quality gate without a dictionary dependency
STOPWORDS = (
    "the a an and or but of to in on at is are was were be been it "
    "this that as for with by from not have has had"
).split()


def stopword_count(col: Column) -> Column:
    """Tokens (lowercased) that are English stopwords. Literal-only lambda —
    no outer-column capture, stays cheap inside the HOF."""
    return F.size(
        F.filter(tokenize(F.lower(col)), lambda t: t.isin(*STOPWORDS))
    )


def stopword_ratio_x100(col: Column) -> Column:
    """floor(100 × stopwords/tokens) as an exact integer (0 for empty text).
    Natural English prose typically lands ≥ 10; machine noise near 0."""
    n = token_count(col)
    return F.when(n > 0, F.floor(stopword_count(col) * F.lit(100) / n)).otherwise(
        F.lit(0)
    ).cast("long")


def zip_ngrams(tokens: Column, n: int) -> Column:
    """n-grams as ``arrays_zip`` of n shifted slices → ARRAY<STRUCT>.

    The naive formulation (transform over an index sequence with
    ``element_at(tokens, i+j)`` in the lambda) captures the token expression
    inside an interpreted higher-order function and re-evaluates the whole
    tokenization per n-gram — O(tokens²) per document, measured 5× slower.
    Shifted slices + zip evaluate the token array once per row and stay in
    codegen.
    """
    length = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
    parts = [F.slice(tokens, i + 1, length) for i in range(n)]
    return F.arrays_zip(*parts)


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-grams (shingles) from a token array, space-joined."""
    return F.transform(
        zip_ngrams(tokens, n),
        lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]),
    )


def doc_fingerprint(col: Column) -> Column:
    """Whole-document fingerprint: md5 of normalized text (SURVEY north-star
    'document fingerprinting'). Cross-engine stable."""
    return F.md5(normalize_text(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_count(col: Column) -> Column:
    """Number of punctuation characters (quality-scoring feature)."""
    return F.length(col) - F.length(F.regexp_replace(col, r"[!-/:-@\[-`{-~]", ""))


def upper_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, "[A-Z]", ""))


def digit_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, "[0-9]", ""))


# Minimal stopword markers per language for the n-gram/marker language-ID
# heuristic. Deliberately tiny and deterministic — the operator contract is
# "same classification in any engine", not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
}


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-word hit counts over the token set."""
    toks = F.array_distinct(tokenize(normalize_text(col)))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            hit = F.array_contains(toks, m).cast("int")
            score = hit if score is None else score + hit
        out[lang] = score
    return out


def langid_heuristic(col: Column) -> Column:
    """Marker-based language guess with deterministic tiebreak (alphabetical
    language order, 'und' = undetermined when no marker hits)."""
    scores = lang_scores(col)
    langs = sorted(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    # reverse order so earlier (alphabetical) languages win ties
    for lang in reversed(langs):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring feature set (integer/boolean only — exact in every
    engine): lengths, token counts, punctuation/uppercase/digit counts and
    the derived acceptance flag."""
    n_chars = char_count(text)
    n_tokens = token_count(text)
    n_punct = punct_count(text)
    n_upper = upper_count(text)
    n_digit = digit_count(text)
    # mean token length ×100 as an exact integer (floor); 0 for zero-token
    # docs (division would be NULL now that empty docs count 0 tokens)
    avg_token_len_x100 = F.when(
        n_tokens > 0, F.floor(n_chars * F.lit(100) / n_tokens)
    ).otherwise(F.lit(0)).cast("long")
    is_quality = (
        (n_chars >= 50)
        & (n_tokens >= 10)
        & (n_punct * 5 <= n_chars)  # ≤20% punctuation
        & (n_digit * 2 <= n_chars)  # ≤50% digits
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "n_punct": n_punct.cast("long"),
        "n_upper": n_upper.cast("long"),
        "n_digit": n_digit.cast("long"),
        "avg_token_len_x100": avg_token_len_x100,
        "is_quality": is_quality,
    }


def repetition_ratios(text: Column) -> dict[str, Column]:
    """Within-document repetition signals (the Gopher/RefinedWeb quality
    rules): high values mark boilerplate, scraped templates, and
    degenerate generations. All built-in array expressions — codegen'd,
    no shuffle, composable with any filter threshold.

    - ``dup_line_frac``: fraction of non-empty lines that repeat an
      earlier line.
    - ``dup_trigram_frac``: fraction of word 3-grams that occur more
      than once (1 - distinct/total).

    Empty documents score 0.0 on both (nothing repeats in nothing).
    """
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != F.lit(""))
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))) / n_lines,
    ).otherwise(F.lit(0.0))

    grams = word_ngrams(tokenize(normalize_text(text)), 3)
    n_grams = F.size(grams)
    dup_gram = F.when(
        n_grams > 0,
        (n_grams - F.size(F.array_distinct(grams))) / n_grams,
    ).otherwise(F.lit(0.0))
    return {
        "dup_line_frac": dup_line.cast("double"),
        "dup_trigram_frac": dup_gram.cast("double"),
    }


# the 8 "required words" of the published Gopher rule (Rae et al. 2021,
# Appendix A) — distinct from the broader STOPWORDS ratio gate above
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# bullet glyphs the line rule recognizes (unicode bullets + '-'/'*')
_BULLET_RE = r"^(•|‣|▪|●|\*|-)"


def gopher_quality_flags(
    text: Column,
    *,
    toks: Column | None = None,
    lines: Column | None = None,
) -> dict[str, Column]:
    """The published Gopher document-quality rule set (Rae et al. 2021,
    Appendix A), each rule as a named boolean column plus the conjunction
    — the standard crawl gate alongside :func:`quality_columns`'s counts
    and :func:`repetition_ratios`. All built-in string/array expressions
    (codegen, no shuffle). NULL/empty text fails ``gopher_pass`` (the
    word-count rule trips; the per-line rules hold vacuously — zero
    lines have no bullets):

    - ``ok_word_count``: 50 <= words <= 100_000
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_symbol_ratio``: hash-to-word ratio <= 0.1 AND
      ellipsis-to-word ratio <= 0.1 — two INDEPENDENT verdicts, per the
      published wording "for either the hash symbol or the ellipsis"
      (a doc with 0.07 of each passes; pooling them would over-filter)
    - ``ok_bullet_lines``: <= 90% of non-empty lines start with a bullet
    - ``ok_ellipsis_lines``: <= 30% of non-empty lines end with ellipsis
    - ``ok_alpha_words``: >= 80% of words contain an alphabetic char
    - ``ok_required_words``: >= 2 of the 8 Gopher required words appear
    - ``gopher_pass``: all of the above

    Ratio thresholds are exact integer cross-multiplications (no float
    division), so the verdicts reproduce bit-identically in any engine.

    ``toks``/``lines`` accept PRE-MATERIALIZED columns (must be
    ``clean_tokens(text)`` / the trimmed non-empty line split) — the
    single-projection default re-derives them inside every flag column,
    and Spark's subexpression elimination skips lambda-bearing trees, so
    the tokenization runs ~10x per row; :func:`with_gopher_quality_flags`
    stages them once and is the form to use on a corpus-sized scan.
    """
    # clean_tokens, not raw split: split('') yields [''] and would count
    # empty documents as one-token documents
    if toks is None:
        toks = clean_tokens(text)
    n_words = F.coalesce(F.size(toks), F.lit(0))
    n_chars_in_words = F.coalesce(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)), F.lit(0)
    )
    ok_word_count = (n_words >= 50) & (n_words <= 100_000)
    ok_mean_word_len = (n_words > 0) & (
        (n_chars_in_words >= n_words * 3) & (n_chars_in_words <= n_words * 10)
    )
    hashes = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    # each '...' (or unicode ellipsis) counts as ONE symbol: count glyph
    # occurrences via the length delta divided by the glyph length
    dots3 = (
        F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / F.lit(3)
    uni_ellipsis = F.length(text) - F.length(
        F.regexp_replace(text, "…", "")
    )
    n_hashes = F.coalesce(hashes.cast("long"), F.lit(0))
    n_ellipses = F.coalesce((dots3 + uni_ellipsis).cast("long"), F.lit(0))
    # per-class thresholds ("either the hash symbol or the ellipsis"):
    # each symbol class must independently stay <= 10% of words
    ok_symbol_ratio = (
        (n_words > 0)
        & (n_hashes * 10 <= n_words)
        & (n_ellipses * 10 <= n_words)
    )
    # CRLF-safe line semantics, aligned bit-for-bit with the DuckDB oracle
    # and the Python reference: split on \r?\n and trim ALL whitespace
    # (F.trim strips spaces only; Java rlike '$' would also match before a
    # trailing \r while RE2/Python do not — trimming first removes both
    # divergences)
    def _ltrim(l):
        return F.regexp_replace(l, r"^\s+|\s+$", "")

    if lines is None:
        lines = F.filter(
            F.split(text, r"\r?\n"), lambda l: _ltrim(l) != F.lit("")
        )
    n_lines = F.coalesce(F.size(lines), F.lit(0))
    bullet_lines = F.coalesce(
        F.size(F.filter(lines, lambda l: _ltrim(l).rlike(_BULLET_RE))),
        F.lit(0),
    )
    ellipsis_lines = F.coalesce(
        F.size(
            F.filter(lines, lambda l: _ltrim(l).rlike(r"(\.\.\.|…)$"))
        ),
        F.lit(0),
    )
    ok_bullet_lines = (n_lines == 0) | (bullet_lines * 10 <= n_lines * 9)
    ok_ellipsis_lines = (n_lines == 0) | (ellipsis_lines * 10 <= n_lines * 3)
    alpha_words = F.coalesce(
        F.size(F.filter(toks, lambda t: t.rlike(r"[a-zA-Z]"))), F.lit(0)
    )
    ok_alpha_words = (n_words > 0) & (alpha_words * 10 >= n_words * 8)
    required_hits = F.coalesce(
        F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS]),
            )
        ),
        F.lit(0),
    )
    ok_required_words = required_hits >= 2
    flags = {
        "ok_word_count": ok_word_count,
        "ok_mean_word_len": ok_mean_word_len,
        "ok_symbol_ratio": ok_symbol_ratio,
        "ok_bullet_lines": ok_bullet_lines,
        "ok_ellipsis_lines": ok_ellipsis_lines,
        "ok_alpha_words": ok_alpha_words,
        "ok_required_words": ok_required_words,
    }
    gopher_pass = F.lit(True)
    for c in flags.values():
        gopher_pass = gopher_pass & c
    out = {k: F.coalesce(v, F.lit(False)) for k, v in flags.items()}
    out["gopher_pass"] = F.coalesce(gopher_pass, F.lit(False))
    return out


# -- C4 cleaning rules ------------------------------------------------------
# The published C4 heuristics (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer", §2.2): line
# rules keep only lines that end in a terminal punctuation mark, have at
# least 5 words, and mention neither "javascript" nor a cookie/policy
# boilerplate phrase; page rules drop any page containing "lorem ipsum" or
# a curly bracket, or with too few sentences after line cleaning.

C4_TERMINAL_PUNCT_RE = r'[.!?"]$'  # period, exclamation, question, end quote
C4_POLICY_SUBSTRINGS = (
    "terms of use", "privacy policy", "cookie policy", "uses cookies",
    "use of cookies", "use cookies",
)
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 5


def _c4_trim(l: Column) -> Column:
    # trim ALL whitespace (incl. tabs / stray \r), same CRLF-safe
    # semantics as gopher_quality_flags
    return F.regexp_replace(l, r"^\s+|\s+$", "")


def c4_kept_lines(
    text: Column, min_words_per_line: int = C4_MIN_WORDS_PER_LINE
) -> Column:
    """``array<string>`` of the (trimmed) lines the C4 LINE rules keep:
    non-empty, ending in a terminal punctuation mark (``.!?"``) but not in
    an ellipsis, at least ``min_words_per_line`` whitespace words, no
    "javascript", and none of the cookie/policy boilerplate phrases. All
    built-in array/string expressions — codegen, no shuffle."""

    def _keep(l: Column) -> Column:
        low = F.lower(l)
        ends_ok = l.rlike(C4_TERMINAL_PUNCT_RE) & ~l.rlike(r"\.\.\.$")
        words = F.size(
            F.filter(F.split(l, r"\s+"), lambda w: w != F.lit(""))
        )
        keep = (
            (l != F.lit(""))
            & ends_ok
            & (words >= min_words_per_line)
            & ~low.contains("javascript")
        )
        for p in C4_POLICY_SUBSTRINGS:
            keep = keep & ~low.contains(p)
        return keep

    return F.filter(F.transform(F.split(text, r"\r?\n"), _c4_trim), _keep)


def c4_clean_text(
    text: Column, min_words_per_line: int = C4_MIN_WORDS_PER_LINE
) -> Column:
    """The C4 line-level transform: the document with only the kept lines,
    newline-joined (the cleaned page the page rules then judge)."""
    return F.array_join(c4_kept_lines(text, min_words_per_line), "\n")


def c4_quality_flags(
    text: Column,
    min_sentences: int = C4_MIN_SENTENCES,
    badwords: tuple = (),
    *,
    low: Column | None = None,
    cleaned: Column | None = None,
    toks: Column | None = None,
) -> dict[str, Column]:
    """The C4 PAGE rules as named boolean verdicts plus the conjunction —
    the second published crawl gate alongside :func:`gopher_quality_flags`.
    NULL text fails ``c4_pass``.

    - ``no_lorem_ipsum``: "lorem ipsum" (case-insensitive) nowhere in the
      raw page.
    - ``no_curly_brace``: no ``{`` anywhere in the raw page (the paper's
      wording — "any page that contained a curly bracket"; the original
      implementation only checked surviving lines, so this is the
      stricter, simpler reading).
    - ``ok_sentence_count``: at least ``min_sentences`` sentences among
      the KEPT lines, counting sentences as terminal-mark (``.!?``)
      occurrences — a deterministic cross-engine proxy for the original's
      nltk sentence tokenizer (an ASCII ellipsis therefore counts 3; C4's
      line rules already drop ellipsis-terminated lines).
    - ``no_bad_words``: none of the ``badwords`` appear — single words
      match token-wise against :func:`clean_tokens`, phrases (containing
      a space) match substring-wise against the lowered page. The
      published rule uses the external "List of Dirty, Naughty, Obscene
      or Otherwise Bad Words"; pass it in as data (default empty tuple =
      rule passes vacuously).
    - ``c4_pass``: all of the above.
    """
    if low is None:
        low = F.lower(F.coalesce(text, F.lit("")))
    no_lorem = ~low.contains("lorem ipsum")
    no_curly = ~F.coalesce(text, F.lit("")).contains("{")
    if cleaned is None:
        cleaned = c4_clean_text(text)
    n_sentences = F.coalesce(
        F.length(cleaned)
        - F.length(F.regexp_replace(cleaned, r"[.!?]", "")),
        F.lit(0),
    )
    ok_sentences = n_sentences >= min_sentences
    word_bads = [w for w in badwords if " " not in w]
    phrase_bads = [w for w in badwords if " " in w]
    no_bad = F.lit(True)
    if word_bads:
        no_bad = no_bad & ~F.arrays_overlap(
            clean_tokens(text) if toks is None else toks,
            F.array(*[F.lit(w.lower()) for w in word_bads]),
        )
    for p in phrase_bads:
        no_bad = no_bad & ~low.contains(p.lower())
    flags = {
        "no_lorem_ipsum": no_lorem,
        "no_curly_brace": no_curly,
        "ok_sentence_count": ok_sentences,
        "no_bad_words": no_bad,
    }
    c4_pass = F.lit(True)
    for c in flags.values():
        c4_pass = c4_pass & c
    out = {k: F.coalesce(v, F.lit(False)) for k, v in flags.items()}
    out["c4_pass"] = F.coalesce(c4_pass, F.lit(False))
    return out


# -- full Gopher repetition rules -------------------------------------------
# The complete published repetition rule set (Rae et al. 2021, Table A1):
# duplicate line / paragraph fractions, duplicate line / paragraph
# CHARACTER fractions, top 2/3/4-gram character fractions, and duplicate
# 5..10-gram character fractions. :func:`repetition_ratios` above keeps the
# two cheap headline ratios; this is the whole table, each rule as a
# boolean verdict with integer cross-multiplication thresholds so both
# engines produce bit-identical booleans.

# (name, threshold*100) — fail when fraction EXCEEDS the threshold
GOPHER_REP_TOP_NGRAMS = ((2, 20), (3, 18), (4, 16))
GOPHER_REP_DUP_NGRAMS = ((5, 15), (6, 14), (7, 13), (8, 12), (9, 11), (10, 10))


def _dup_fold(arr: Column) -> Column:
    """Fold struct for (count, chars) of occurrences BEYOND the first of each distinct
    element — ONE fold over the sorted array (element == predecessor).
    Characters count each repeated occurrence's own length (the
    find-duplicates convention of the public Gopher implementations).

    Deliberately a single ``aggregate`` pass, NOT slice/zip_with pairs:
    ``slice`` with a Column length drops out of codegen and re-evaluates
    the (sorted) child array per element — measured ~20x slower on real
    documents. The two field extractions below share the fold via
    subexpression elimination."""
    s = F.array_sort(arr)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("cnt"),
        F.lit(0).alias("chars"),
    )

    def _step(acc, x):
        dup = acc["prev"].isNotNull() & (x == acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(dup, acc["cnt"] + 1).otherwise(acc["cnt"]).alias("cnt"),
            F.when(dup, acc["chars"] + F.length(x))
            .otherwise(acc["chars"])
            .alias("chars"),
        )

    return F.aggregate(s, acc0, _step)


def _dup_counts_of(st: Column) -> tuple[Column, Column]:
    """(count, chars) extraction from a :func:`_dup_fold` struct — split
    out so a staged pipeline can materialize the fold ONCE and extract
    both fields from the column (the tuple-returning path embeds a copy
    of the fold in each field's tree, and lambda-bearing trees are
    excluded from Spark's subexpression elimination)."""
    dup_count = F.coalesce(st["cnt"], F.lit(0)).cast("long")
    dup_chars = F.coalesce(st["chars"], F.lit(0)).cast("long")
    return dup_count, dup_chars


def _dup_beyond_first(arr: Column) -> tuple[Column, Column]:
    return _dup_counts_of(_dup_fold(arr))


def _top_fold(arr: Column) -> Column:
    """Fold struct for the max-count * its-length character coverage of the most frequent
    element (ties on count broken by the LONGER element — deterministic in
    any engine; the covered-character metric is identical either way when
    both count and length tie). 0 when the most frequent element occurs
    only once (the published rule only fails on a REPEATED top n-gram).
    One codegen fold over the sorted array — run lengths via adjacency."""
    s = F.array_sort(arr)
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best_n"),
        F.lit(0).alias("best_len"),
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = (run > acc["best_n"]) | (
            (run == acc["best_n"]) & (F.length(x) > acc["best_len"])
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best_n"]).alias("best_n"),
            F.when(better, F.length(x)).otherwise(acc["best_len"]).alias("best_len"),
        )

    return F.aggregate(s, acc0, _step)


def _top_cov_of(top: Column) -> Column:
    """Coverage extraction from a :func:`_top_fold` struct (see
    :func:`_dup_counts_of` for why fold and extraction are split)."""
    return F.coalesce(
        F.when(top["best_n"] >= 2, top["best_n"] * top["best_len"]).otherwise(
            F.lit(0)
        ),
        F.lit(0),
    ).cast("long")


def _top_coverage(arr: Column) -> Column:
    return _top_cov_of(_top_fold(arr))


def split_trimmed_units(text: Column, pattern: str) -> Column:
    """``array<string>`` of the pattern-split units, each trimmed of ALL
    whitespace with empties dropped — the line/paragraph unit semantics
    of :func:`gopher_repetition_flags`."""
    trimmed = F.transform(
        F.split(text, pattern),
        lambda l: F.regexp_replace(l, r"^\s+|\s+$", ""),
    )
    return F.filter(trimmed, lambda l: l != F.lit(""))


def gopher_repetition_flags(text: Column) -> dict[str, Column]:
    """The full published Gopher repetition rule set (Rae et al. 2021,
    Table A1), each rule a named boolean plus the ``repetition_pass``
    conjunction. All verdicts are integer cross-multiplications — no float
    division — so they reproduce bit-identically cross-engine. Pure
    codegen: per-document array sorts and folds, no UDF, no shuffle.

    Semantics (documented where the paper leaves room):

    - lines split on ``\\r?\\n``, paragraphs on blank lines
      (``(\\r?\\n){2,}``), both trimmed with empties dropped.
    - "duplicate" = occurrences beyond the first of each distinct
      element; character fractions divide by ``length(text)`` (raw).
    - top n-gram coverage = occurrences × n-gram length (spaces included),
      only when the top n-gram repeats; words are :func:`clean_tokens`.
    - duplicate n-gram characters = each repeated occurrence contributes
      its own length (overlaps between different repeated n-grams are NOT
      deduplicated — the skip-ahead variant some implementations use is
      stateful and engine-hostile; this reading is stricter, documented,
      and deterministic).

    Thresholds (fraction must NOT exceed): dup lines/paragraphs 0.30,
    their character fractions 0.20, top 2/3/4-gram chars 0.20/0.18/0.16,
    duplicate 5..10-gram chars 0.15/0.14/0.13/0.12/0.11/0.10.

    NULL/empty text passes every rule vacuously (nothing repeats in
    nothing) — gate emptiness with :func:`gopher_quality_flags`'s word
    count instead.
    """
    n_len = F.coalesce(F.length(text), F.lit(0)).cast("long")
    lines = split_trimmed_units(text, r"\r?\n")
    paras = split_trimmed_units(text, r"(\r?\n){2,}")
    n_lines = F.coalesce(F.size(lines), F.lit(0)).cast("long")
    n_paras = F.coalesce(F.size(paras), F.lit(0)).cast("long")
    dup_lines, dup_line_chars = _dup_beyond_first(lines)
    dup_paras, dup_para_chars = _dup_beyond_first(paras)

    toks = clean_tokens(text)
    top_covs = {
        n: _top_coverage(word_ngrams(toks, n)) for n, _ in GOPHER_REP_TOP_NGRAMS
    }
    dup_ng_chars = {
        n: _dup_beyond_first(word_ngrams(toks, n))[1]
        for n, _ in GOPHER_REP_DUP_NGRAMS
    }
    return _repetition_verdicts(
        n_len,
        n_lines,
        n_paras,
        dup_lines,
        dup_line_chars,
        dup_paras,
        dup_para_chars,
        top_covs,
        dup_ng_chars,
    )


def _repetition_verdicts(
    n_len: Column,
    n_lines: Column,
    n_paras: Column,
    dup_lines: Column,
    dup_line_chars: Column,
    dup_paras: Column,
    dup_para_chars: Column,
    top_covs: dict[int, Column],
    dup_ng_chars: dict[int, Column],
) -> dict[str, Column]:
    """The Table A1 thresholds applied to the measured quantities — the
    SINGLE place the integer cross-multiplication verdicts live, shared
    by the inline-column and staged-DataFrame paths so they cannot
    drift."""
    flags = {
        "ok_dup_line_frac": dup_lines * 10 <= n_lines * 3,
        "ok_dup_para_frac": dup_paras * 10 <= n_paras * 3,
        "ok_dup_line_char_frac": dup_line_chars * 10 <= n_len * 2,
        "ok_dup_para_char_frac": dup_para_chars * 10 <= n_len * 2,
    }
    for n, thr100 in GOPHER_REP_TOP_NGRAMS:
        flags[f"ok_top_{n}gram_chars"] = top_covs[n] * 100 <= n_len * thr100
    for n, thr100 in GOPHER_REP_DUP_NGRAMS:
        flags[f"ok_dup_{n}gram_chars"] = (
            dup_ng_chars[n] * 100 <= n_len * thr100
        )
    rep_pass = F.lit(True)
    for c in flags.values():
        rep_pass = rep_pass & c
    out = {k: F.coalesce(v, F.lit(False)) for k, v in flags.items()}
    # NULL text: every rule holds vacuously (0 <= 0) but the coalesced
    # comparisons above are NULL-safe already via coalesced inputs
    out["repetition_pass"] = F.coalesce(rep_pass, F.lit(False))
    return out


# -- staged (DataFrame-level) quality gates ----------------------------------
# The inline-column gate functions embed a fresh copy of the tokenization /
# line split / fold subtree in EVERY flag column, and Spark's subexpression
# elimination explicitly skips lambda-bearing trees (EquivalentExpressions
# rejects LambdaVariable), so a single-projection gate re-tokenizes each row
# ~10x. These staged forms materialize the shared arrays and fold structs
# ONCE in a producer projection and compute the verdicts from the columns;
# CollapseProject will not merge the projections back (the producer outputs
# are non-cheap and multiply referenced), so the plan keeps the staging.
# Results are bit-identical to the inline forms (asserted in
# tests/test_staged_gates.py); measured ~1.6x (quality) to ~3x (repetition)
# on a 78k-doc crawl extract. Same scan count — still zero shuffles, zero
# Python, one pass over the corpus.


def with_gopher_quality_flags(df, text_col: str = "text"):
    """:func:`gopher_quality_flags` over a DataFrame with the token and
    line arrays staged once — the form to use on a corpus-sized scan."""
    text = F.col(text_col)
    toks_c, lines_c = "__gq_toks", "__gq_lines"
    for c in (toks_c, lines_c):
        if c in df.columns:
            raise ValueError(f"column collision: input already has '{c}'")
    staged = df.select(
        "*",
        clean_tokens(text).alias(toks_c),
        # quality's line semantics: empties-after-trim dropped, elements
        # NOT trimmed (each rule re-trims) — distinct from
        # split_trimmed_units, which trims the kept elements
        F.filter(
            F.split(text, r"\r?\n"),
            lambda l: F.regexp_replace(l, r"^\s+|\s+$", "") != F.lit(""),
        ).alias(lines_c),
    )
    flags = gopher_quality_flags(
        text, toks=F.col(toks_c), lines=F.col(lines_c)
    )
    return staged.select(
        *df.columns, *[v.alias(k) for k, v in flags.items()]
    )


def with_gopher_repetition_flags(df, text_col: str = "text"):
    """:func:`gopher_repetition_flags` over a DataFrame with the unit
    arrays AND the per-rule fold structs staged — the biggest win of the
    three staged gates (the inline form re-tokenizes for each of the nine
    n-gram rules and duplicates each line/paragraph fold into its two
    extractions)."""
    text = F.col(text_col)
    tmp = ["__gr_toks", "__gr_lines", "__gr_paras", "__gr_lf", "__gr_pf"]
    tmp += [f"__gr_top{n}" for n, _ in GOPHER_REP_TOP_NGRAMS]
    tmp += [f"__gr_dng{n}" for n, _ in GOPHER_REP_DUP_NGRAMS]
    for c in tmp:
        if c in df.columns:
            raise ValueError(f"column collision: input already has '{c}'")
    s1 = df.select(
        "*",
        clean_tokens(text).alias("__gr_toks"),
        split_trimmed_units(text, r"\r?\n").alias("__gr_lines"),
        split_trimmed_units(text, r"(\r?\n){2,}").alias("__gr_paras"),
    )
    toks = F.col("__gr_toks")
    s2 = s1.select(
        "*",
        _dup_fold(F.col("__gr_lines")).alias("__gr_lf"),
        _dup_fold(F.col("__gr_paras")).alias("__gr_pf"),
        *[
            _top_fold(word_ngrams(toks, n)).alias(f"__gr_top{n}")
            for n, _ in GOPHER_REP_TOP_NGRAMS
        ],
        *[
            _dup_fold(word_ngrams(toks, n)).alias(f"__gr_dng{n}")
            for n, _ in GOPHER_REP_DUP_NGRAMS
        ],
    )
    n_len = F.coalesce(F.length(text), F.lit(0)).cast("long")
    n_lines = F.coalesce(F.size(F.col("__gr_lines")), F.lit(0)).cast("long")
    n_paras = F.coalesce(F.size(F.col("__gr_paras")), F.lit(0)).cast("long")
    dup_lines, dup_line_chars = _dup_counts_of(F.col("__gr_lf"))
    dup_paras, dup_para_chars = _dup_counts_of(F.col("__gr_pf"))
    flags = _repetition_verdicts(
        n_len,
        n_lines,
        n_paras,
        dup_lines,
        dup_line_chars,
        dup_paras,
        dup_para_chars,
        {n: _top_cov_of(F.col(f"__gr_top{n}")) for n, _ in GOPHER_REP_TOP_NGRAMS},
        {
            n: _dup_counts_of(F.col(f"__gr_dng{n}"))[1]
            for n, _ in GOPHER_REP_DUP_NGRAMS
        },
    )
    return s2.select(*df.columns, *[v.alias(k) for k, v in flags.items()])


def with_c4_quality_flags(
    df,
    text_col: str = "text",
    min_sentences: int = C4_MIN_SENTENCES,
    badwords: tuple = (),
):
    """:func:`c4_quality_flags` over a DataFrame with the lowered page,
    the line-cleaned page, and (when word badwords are given) the token
    array staged once."""
    text = F.col(text_col)
    tmp = ["__c4_low", "__c4_cleaned", "__c4_toks"]
    for c in tmp:
        if c in df.columns:
            raise ValueError(f"column collision: input already has '{c}'")
    word_bads = [w for w in badwords if " " not in w]
    staged_cols = [
        F.lower(F.coalesce(text, F.lit(""))).alias("__c4_low"),
        c4_clean_text(text).alias("__c4_cleaned"),
    ]
    toks = None
    if word_bads:
        staged_cols.append(clean_tokens(text).alias("__c4_toks"))
        toks = F.col("__c4_toks")
    staged = df.select("*", *staged_cols)
    flags = c4_quality_flags(
        text,
        min_sentences,
        badwords,
        low=F.col("__c4_low"),
        cleaned=F.col("__c4_cleaned"),
        toks=toks,
    )
    return staged.select(
        *df.columns, *[v.alias(k) for k, v in flags.items()]
    )


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Write a trained merge list in the standard ``merges.txt`` format
    (the GPT-2/HF tokenizers convention: ``#version`` header, one
    space-separated pair per line, priority order) — so :func:`train_bpe`
    output drops into any tokenizer library, and their files load here.

    The format is only well-defined for symbols free of whitespace —
    which is exactly what the GPT-2 byte alphabet guarantees (space is
    ``Ġ``). Char-level merges (``train_bpe(byte_level=False)``) can
    contain literal-space symbols the format cannot represent; those
    raise here rather than writing an ambiguous file."""
    for a, b in merges:
        if any(ch.isspace() for ch in a + b) or not a or not b:
            raise ValueError(
                f"merge pair {(a, b)!r} not representable in merges.txt "
                "(train with byte_level=True for interchange files)"
            )
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    """Read a ``merges.txt`` file (``#`` header lines skipped) into the
    ordered pair list :func:`make_bpe_counter` consumes."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(f"malformed merges line: {line!r}")
            merges.append((parts[0], parts[1]))
    return merges


def bpe_vocab(
    merges: list[tuple[str, str]], byte_level: bool = False
) -> list[str]:
    """The token vocabulary a merge list induces: the base alphabet (the
    256-symbol GPT-2 byte alphabet when ``byte_level``, else every symbol
    appearing in the merges) followed by each merge's joined token in
    priority order — the id assignment convention of the reference
    encoders."""
    if byte_level:
        alphabet = [c for _, c in sorted(
            (b, ch) for b, ch in _byte_to_unicode().items()
        )]
    else:
        seen: dict[str, None] = {}
        for a, b in merges:
            for sym in (a, b):
                for ch in sym:
                    seen.setdefault(ch, None)
        alphabet = sorted(seen)
    return alphabet + [a + b for a, b in merges]


def char_entropy(text: Column) -> Column:
    """Shannon entropy of the character distribution (bits/char) — the
    RedPajama-v2-style randomness signal (near 0 = one repeated char =
    boilerplate/padding; high = diverse text). Pure codegen, no UDF, no
    explode: sort the char array, find run BOUNDARIES (positions whose
    char differs from the next), difference adjacent boundaries into run
    lengths, fold -p·log2(p) over the runs — the same sorted-adjacency
    array discipline as the Gopher repetition folds. Empty/NULL-safe
    (entropy 0). Summation runs in sorted-char order, so the double fold
    is deterministic and cross-engine comparable at fixed rounding."""
    # EVERY reuse below goes through a lambda-bound variable: a non-trivial
    # expression referenced inside a higher-order-function lambda is
    # RE-EVALUATED per element (an O(n²)-per-row trap) — so the sorted
    # array binds via transform-over-one-element, and the boundary array
    # binds again before the run-length zip
    raw = F.array_sort(F.split(text, ""))

    def _ent(chars):
        n = F.size(chars)
        bounds = F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == n)
            | (F.element_at(chars, i) != F.element_at(chars, i + 1)),
        )

        def _from_bounds(b):
            nd = n.cast("double")
            prev = F.concat(
                F.array(F.lit(0)),
                F.slice(b, F.lit(1), F.greatest(F.size(b) - 1, F.lit(0))),
            )
            runs = F.zip_with(b, prev, lambda hi, lo: hi - lo)
            return -F.aggregate(
                runs,
                F.lit(0.0),
                lambda acc, r: acc
                + (r.cast("double") / nd) * F.log2(r.cast("double") / nd),
            )

        return F.element_at(F.transform(F.array(bounds), _from_bounds), 1)

    ent = F.element_at(F.transform(F.array(raw), _ent), 1)
    return F.when(F.length(text) > 0, ent).otherwise(F.lit(0.0))


def make_compression_ratio(spark):
    """Arrow-batched deflate-compressibility signal: zlib-compressed size
    over raw utf-8 size (level 6). Low ratio = highly repetitive text —
    the published crawl-quality heuristic complementary to the Gopher
    repetition rules (catches long-range redundancy n-gram rules miss).
    Python-side by necessity (no JVM deflate expression), but Arrow-batched
    with bounded per-row work; empty documents ratio 0."""
    import pandas as pd
    import zlib

    from pyspark.sql.functions import pandas_udf

    def ratio(texts):
        def one(t) -> float:
            if not t:
                return 0.0
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    ratio.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf("double")(ratio)
