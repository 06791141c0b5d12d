"""Unicode hygiene for crawl corpora: normalization forms and mojibake
repair — the text-cleaning pass that runs right after HTML extraction
and before tokenization/dedup (inconsistent forms split identical words
across dedup keys and vocab entries; mojibake poisons language ID and
quality scores).

Both operators are Arrow-batched ``pandas_udf``s (the documented
escape hatch: Unicode tables are a dictionary lookup, not a regexp) —
broadcast-free, one Python worker per split, vectorized over batches.

Mojibake repair targets THE dominant real-world corruption: UTF-8 bytes
decoded as Latin-1/cp1252 (``é`` → ``Ã©``, ``“`` → ``â€œ``), possibly
twice. The fix is the ftfy core move — re-encode through the wrong
codec and decode as UTF-8 — applied ONLY when it round-trips cleanly
AND strictly reduces the count of mojibake marker sequences, so clean
text (including text legitimately containing ``Ã`` as a standalone
letter) passes through untouched. Deterministic, idempotent, and
conservative by construction; asserted against hand-built corruption
pairs and a no-false-positive corpus in ``tests/test_unicode.py``.
"""

from __future__ import annotations

import re

# UTF-8 lead bytes seen through latin-1/cp1252 glasses (\u00c2-\u00c5:
# A-circumflex/tilde family; \u00e2: a-circumflex) followed by a
# continuation-looking character: latin-1 maps continuation bytes
# 0x80-0xBF to \u0080-\u00bf, cp1252 maps the 0x80-0x9F slice to its
# punctuation set instead
_CONT = "\u0080-\u00bf\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"
_MOJIBAKE_RE = re.compile(
    f"[\u00c2-\u00df][{_CONT}]"            # 2-byte leads (Latin/Cyrillic/…)
    f"|[\u00e0-\u00ef][{_CONT}][{_CONT}]"  # 3-byte leads (CJK/punctuation)
)


def _mojibake_score(text: str) -> int:
    return len(_MOJIBAKE_RE.findall(text))


def fix_mojibake_str(text: str, max_passes: int = 2) -> str:
    """Pure-Python single-string repair (the UDF's kernel, exposed for
    tests and driver-side use). Up to ``max_passes`` rounds undo
    double-encoding; each round must round-trip through cp1252 (falling
    back to latin-1 for the 5 cp1252 holes) and strictly reduce the
    mojibake score, else the input returns unchanged."""
    cur = text
    for _ in range(max_passes):
        score = _mojibake_score(cur)
        if score == 0:
            return cur
        try:
            redecoded = cur.encode("cp1252", errors="strict").decode(
                "utf-8", errors="strict"
            )
        except (UnicodeEncodeError, UnicodeDecodeError):
            try:
                redecoded = cur.encode("latin-1", errors="strict").decode(
                    "utf-8", errors="strict"
                )
            except (UnicodeEncodeError, UnicodeDecodeError):
                return cur
        if _mojibake_score(redecoded) >= score:
            return cur
        cur = redecoded
    return cur


def make_unicode_normalizer(form: str = "NFC"):
    """Arrow-batched ``pandas_udf`` applying ``unicodedata.normalize``
    with the given form (NFC/NFD/NFKC/NFKD). NULLs pass through."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def normalizer(texts):
        return texts.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    normalizer.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf("string")(normalizer)


def make_mojibake_fixer(max_passes: int = 2):
    """Arrow-batched ``pandas_udf`` wrapping :func:`fix_mojibake_str` —
    conservative repair of latin-1/cp1252-decoded UTF-8, including the
    double-encoded case. NULLs pass through."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def fixer(texts):
        return texts.map(
            lambda t: fix_mojibake_str(t, max_passes=max_passes)
            if t is not None
            else None
        )

    fixer.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf("string")(fixer)
