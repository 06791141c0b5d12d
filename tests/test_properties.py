"""Property-based tests (hypothesis) over the pure-Python kernels — no
SparkSession, so hundreds of examples run in milliseconds. Complements the
example-based suites the way the reference's contract tests complement its
e2e flow (SURVEY §5)."""

import fnmatch

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
    _parse_pnm_header,
    decode_image,
)
from sample_dms_kinesis_rds_mariadb_spark.spec import (
    SelectionRule,
    like_match,
    select_tables,
)

# -- SQL-LIKE selection rules ------------------------------------------------

_ident = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=0x7F),
    min_size=0,
    max_size=12,
)


@given(_ident, _ident)
def test_like_match_agrees_with_fnmatch_on_percent(prefix, value):
    """`p%` must behave exactly like the reference's DMS wildcard (glob
    `p*`): true iff value starts with the literal prefix."""
    assert like_match(prefix + "%", value) == fnmatch.fnmatchcase(
        value, prefix + "*"
    )


@given(_ident)
def test_like_exact_pattern_matches_only_itself(value):
    assert like_match(value, value)
    assert like_match("%", value)
    if value:
        assert not like_match(value + "x", value)


@given(_ident, _ident)
def test_underscore_matches_exactly_one_char(a, b):
    pat = a + "_" + b
    # any single char in the hole matches; empty hole doesn't
    assert like_match(pat, a + "Q" + b)
    assert like_match(pat, a + "_" + b)
    if not (a + b) or "_" not in (a + b):
        assert like_match(pat, a + b) == (len(a + b) >= len(pat))


@given(
    st.lists(st.tuples(st.just("db"), _ident), min_size=0, max_size=8, unique=True)
)
def test_select_tables_include_all_is_identity_sorted(tables):
    got = select_tables(tables, [SelectionRule("db", "%")])
    assert got == sorted(set(tables))


@given(
    st.lists(st.tuples(st.just("db"), _ident), min_size=0, max_size=8, unique=True),
    _ident,
)
def test_exclude_rule_removes_matches(tables, excl):
    rules = [SelectionRule("db", "%"), SelectionRule("db", excl + "%", "exclude")]
    got = select_tables(tables, rules)
    assert all(not t.startswith(excl) for _, t in got)
    kept = [(s, t) for s, t in sorted(set(tables)) if not t.startswith(excl)]
    assert got == kept


# -- PNM header parsing ------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=9999),
    st.integers(min_value=1, max_value=9999),
    st.sampled_from([b" ", b"\n", b"\t", b" # comment\n", b"\n# c1\n# c2\n"]),
)
@settings(max_examples=200)
def test_pnm_header_roundtrip(width, height, sep):
    content = b"P6" + sep + str(width).encode() + sep + str(height).encode() + b" 255\n"
    assert _parse_pnm_header(content) == (width, height)
    # header-only decode: cap the pixel payload (decode never reads it)
    w, h, c, fmt = decode_image(content + bytes(min(width * height * 3, 1024)))
    assert (w, h, c, fmt) == (width, height, 3, "ppm")


@given(st.binary(min_size=0, max_size=64))
def test_decode_image_never_crashes_with_fake(blob):
    """Arbitrary bytes either decode (valid magic), or fall through to the
    deterministic fake — never an unhandled exception."""
    try:
        w, h, c, fmt = decode_image(blob, fake=True)
    except ValueError:
        # malformed PNM header after a valid magic — a legitimate rejection
        assert blob[:2] in (b"P6", b"P3", b"P5", b"P2")
        return
    assert w >= 0 and h >= 0 and c >= 1
    assert fmt in ("ppm", "pgm", "bmp", "fake")
    # determinism
    assert decode_image(blob, fake=True) == (w, h, c, fmt)


# -- order-band arithmetic ---------------------------------------------------


@given(
    st.integers(min_value=0, max_value=254),
    st.integers(min_value=0, max_value=(1 << 21) - 1),
    st.integers(min_value=0, max_value=(1 << 33) - 1),
)
def test_snapshot_order_bands_never_overlap(band, partition_id, offset):
    """monotonically_increasing_id = pid*2^33 + offset; within the enforced
    caps (255 tables, <2^21 partitions) every table's ids stay inside its
    band and below 2^63. (This property caught a real corner overlap at the
    old 2^22 cap: pid=2^22-1, offset=2^33-2 landed exactly on the next
    band's first id.)"""
    from sample_dms_kinesis_rds_mariadb_spark.sources.snapshot import (
        _MAX_SCAN_PARTITIONS,
        _ORDER_BAND,
    )

    assert partition_id < _MAX_SCAN_PARTITIONS

    mono = partition_id * (1 << 33) + offset
    order = band * _ORDER_BAND + 2 + mono
    assert band * _ORDER_BAND <= order < (band + 1) * _ORDER_BAND
    assert order < (1 << 63)


# -- nearest-neighbor resize kernel ------------------------------------------


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.binary(min_size=12 * 12 * 3, max_size=12 * 12 * 3),
)
@settings(max_examples=150)
def test_resize_shape_and_value_conservation(w, h, nw, nh, raw):
    """Any binary PPM resized to any size yields a well-formed PPM of
    exactly the target dims whose every pixel exists in the source (nearest
    neighbor never invents values); identity resize preserves the buffer."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        _parse_pnm_binary,
        decode_image,
        resize_image,
    )

    src_px = raw[: w * h * 3]
    src = b"P6\n%d %d\n255\n" % (w, h) + src_px
    out = resize_image(src, nw, nh)
    assert decode_image(out) == (nw, nh, 3, "ppm")
    _, _, maxval, off = _parse_pnm_binary(out)
    body = out[off:]
    assert len(body) == nw * nh * 3 and maxval == 255
    src_pixels = {src_px[i : i + 3] for i in range(0, len(src_px), 3)}
    assert all(body[i : i + 3] in src_pixels for i in range(0, len(body), 3))

    same = resize_image(src, w, h)
    assert same[_parse_pnm_binary(same)[3] :] == src_px


# -- winnowing guarantee -----------------------------------------------------
# The MOSS theorem (Schleimer et al. 2003): any shared substring of length
# >= k + window - 1 between two documents yields at least one shared
# selected fingerprint. Property-tested on the pure-Python reference that
# the Spark implementation is example-tested equal to
# (tests/test_operators.py::test_winnowing_matches_python_reference).

from test_operators import _winnow_py  # noqa: E402

_lower = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x7A),
    min_size=0,
    max_size=40,
)
_K, _W = 5, 4


@given(
    _lower,
    _lower,
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x7A),
        min_size=_K + _W - 1,
        max_size=24,
    ),
    st.integers(0, 40),
    st.integers(0, 40),
)
@settings(max_examples=300)
def test_winnowing_guarantee_shared_substring(doc_a, doc_b, shared, cut_a, cut_b):
    a = doc_a[: cut_a % (len(doc_a) + 1)] + shared + doc_a[cut_a % (len(doc_a) + 1) :]
    b = doc_b[: cut_b % (len(doc_b) + 1)] + shared + doc_b[cut_b % (len(doc_b) + 1) :]
    for hash_fn in ("crc32", "md5_32"):
        ha = {h for _, h in _winnow_py(a, _K, _W, hash_fn=hash_fn)}
        hb = {h for _, h in _winnow_py(b, _K, _W, hash_fn=hash_fn)}
        assert ha & hb, (a, b, shared)


# -- BM25 / classifier / LM pure kernels -------------------------------------

_word = st.text(alphabet="abcdefg", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=20)


@given(
    st.dictionaries(st.integers(0, 5), _doc, min_size=1, max_size=6),
    st.lists(_word, min_size=1, max_size=4),
)
def test_bm25_nonnegative_and_zero_iff_no_match(docs_toks, query):
    from sample_dms_kinesis_rds_mariadb_spark.operators.search import (
        reference_bm25,
    )

    docs = {i: " ".join(toks) for i, toks in docs_toks.items()}
    scores = reference_bm25(docs, query)
    qset = {t.lower() for t in query}
    for i, toks in docs_toks.items():
        assert scores[i] >= 0.0
        assert (scores[i] > 0.0) == bool(qset & set(toks))


@given(
    st.dictionaries(st.integers(0, 5), _doc, min_size=2, max_size=6),
    st.lists(_word, min_size=1, max_size=3),
    st.randoms(use_true_random=False),
)
def test_bm25_is_bag_of_words(docs_toks, query, rng):
    """Scores depend only on token COUNTS: permuting any document's tokens
    changes nothing (for itself or for other documents)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.search import (
        reference_bm25,
    )

    docs = {i: " ".join(toks) for i, toks in docs_toks.items()}
    before = reference_bm25(docs, query)
    shuffled = {}
    for i, toks in docs_toks.items():
        toks = list(toks)
        rng.shuffle(toks)
        shuffled[i] = " ".join(toks)
    after = reference_bm25(shuffled, query)
    for i in docs:
        assert after[i] == pytest.approx(before[i], rel=1e-12)


@given(_doc, st.floats(-1.0, 1.0))
def test_classifier_score_bounded_by_weight_range(toks, bias):
    """Without bigrams the margin is a mean of weight entries, so it must
    lie within [min(w), max(w)] + bias (empty docs score exactly bias)."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.classify import (
        reference_score,
    )

    weights = [(-1) ** i * (i % 7) / 7.0 for i in range(64)]
    s = reference_score(" ".join(toks), weights, bias=bias, bigrams=False)
    if not toks:
        assert s == bias
    else:
        assert min(weights) + bias - 1e-9 <= s <= max(weights) + bias + 1e-9


@given(st.lists(_word, min_size=1, max_size=10))
def test_classifier_whitespace_invariance(toks):
    from sample_dms_kinesis_rds_mariadb_spark.functions.classify import (
        reference_score,
    )

    weights = [((i * 37) % 11 - 5) / 5.0 for i in range(128)]
    a = reference_score(" ".join(toks), weights)
    b = reference_score("  " + "\t\n ".join(toks) + "   ", weights)
    assert a == b


@given(_doc)
def test_lm_bits_strictly_positive_for_nonempty(toks):
    """Interpolated probabilities are < 1, so bits/token > 0 for any
    non-empty sequence; empty sequences score exactly 0."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.lm import _logprob

    model = {
        "unigrams": {"a": 5, "b": 3, "<s>": 2},
        "bigrams": {("a", "b"): 2, ("<s>", "a"): 2},
        "total": 10,
    }
    bits = _logprob(toks, model, lam=0.7)
    if toks:
        assert bits > 0.0
    else:
        assert bits == 0.0


_sizes = st.dictionaries(
    st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=6),
    st.floats(min_value=1.0, max_value=1e9, allow_nan=False),
    min_size=1,
    max_size=8,
)


@given(_sizes, st.floats(min_value=0.0, max_value=1.0))
def test_temperature_weights_properties(sizes, alpha):
    """For ANY corpus sizes and temperature: weights stay in (0, 1], the
    binding corpus keeps exactly 1.0, and expected-row ratios follow
    size^alpha (the defining temperature property)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import (
        temperature_weights,
    )

    w = temperature_weights(sizes, alpha=alpha)
    assert set(w) == set(sizes)
    assert all(0.0 < v <= 1.0 + 1e-12 for v in w.values())
    assert max(w.values()) == pytest.approx(1.0)
    names = sorted(sizes)
    a0 = names[0]
    for b in names[1:]:
        got = (sizes[a0] * w[a0]) / (sizes[b] * w[b])
        want = (sizes[a0] / sizes[b]) ** alpha
        assert got == pytest.approx(want, rel=1e-9)


@given(_sizes, st.floats(min_value=0.0, max_value=1.0))
def test_temperature_rates_properties(sizes, alpha):
    """Rates: every rate >= ~ the smallest, the LARGEST corpus sits at
    exactly 1.0, rates are >= 1 - eps for all (never under-represent),
    and expected-row ratios follow size^alpha."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import (
        temperature_rates,
    )

    r = temperature_rates(sizes, alpha=alpha)
    biggest = max(sizes, key=lambda k: (sizes[k], k))
    assert r[biggest] == pytest.approx(1.0)
    assert all(v >= 1.0 - 1e-9 for v in r.values())
    names = sorted(sizes)
    a0 = names[0]
    for b in names[1:]:
        got = (sizes[a0] * r[a0]) / (sizes[b] * r[b])
        want = (sizes[a0] / sizes[b]) ** alpha
        assert got == pytest.approx(want, rel=1e-9)
