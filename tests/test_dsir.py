"""DSIR importance resampling vs independent Python references: hashed
distribution fitting vs a Counter with zlib.crc32, bit-exact log-weight
parity through the codegen fold, the selection direction (target-style
documents win), Gumbel-top-k determinism, and the no-UDF / TakeOrdered
plan shape."""

import random
import zlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators import dsir

FORMAL = [
    "the committee approved the annual budget report",
    "the council reviewed the policy proposal yesterday",
    "officials published the quarterly economic survey",
    "the ministry announced new regulations on trade",
    "parliament debated the revised education bill",
]
CASUAL = [
    "lol that cat video is so funny omg",
    "gonna grab pizza later wanna come",
    "haha yeah that game was wild bro",
    "omg did u see that meme lol",
    "nah im just chilling at home rn",
]


def _py_features(text: str) -> list[str]:
    import re

    norm = re.sub(r"\s+", " ", text).strip().lower()
    toks = [t for t in norm.split(" ") if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_fit(texts: list[str], dim: int) -> list[int]:
    c: Counter = Counter()
    for t in texts:
        for f in _py_features(t):
            c[zlib.crc32(f.encode("utf-8")) % dim] += 1
    return [c.get(i, 0) for i in range(dim)]


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame([(t,) for t in FORMAL], ["text"])
    rng = random.Random(5)
    mixed = [(i, rng.choice(FORMAL + CASUAL)) for i in range(60)]
    raw = spark.createDataFrame(mixed, ["doc_id", "text"])
    return target, raw, mixed


def test_fit_matches_python_counter(spark, corpora):
    target, raw, _ = corpora
    got = dsir.fit_hashed_distribution(target, "text", dim=512)
    assert got == _py_fit(FORMAL, 512)


def test_log_weight_bit_parity_and_direction(spark, corpora):
    target, raw, mixed = corpora
    p = dsir.fit_hashed_distribution(target, "text", dim=512)
    q = dsir.fit_hashed_distribution(raw, "text", dim=512)
    ratio = dsir.dsir_log_ratio(p, q)
    out = raw.select(
        "doc_id", "text", dsir.dsir_log_weight(F.col("text"), ratio).alias("lw")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure codegen, no UDF of any kind
    by_id = {r["doc_id"]: r for r in out.collect()}
    for did, text in mixed:
        assert by_id[did]["lw"] == dsir.reference_log_weight(text, ratio), did
    # direction: formal docs outweigh casual ones in aggregate (per-doc
    # weights are length-sensitive by design — the doc's n-gram count is
    # the number of ratio terms — so the guarantee is distributional)
    formal_w = [by_id[d]["lw"] for d, t in mixed if t in FORMAL]
    casual_w = [by_id[d]["lw"] for d, t in mixed if t in CASUAL]
    assert sum(formal_w) / len(formal_w) > max(casual_w)
    # empty doc scores exactly 0 (weight 1)
    empty = spark.createDataFrame([(0, "")], ["doc_id", "text"]).select(
        dsir.dsir_log_weight(F.col("text"), ratio).alias("lw")
    )
    assert empty.collect()[0]["lw"] == 0.0


def test_dsir_select_prefers_target_and_is_deterministic(spark, corpora):
    target, raw, mixed = corpora
    n_formal_raw = sum(1 for _, t in mixed if t in FORMAL)
    n = min(20, n_formal_raw)
    sel = dsir.dsir_select(raw, target, "text", n=n, id_col="doc_id", dim=512)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    rows = sel.collect()
    assert len(rows) == n
    texts = {r["doc_id"]: r["text"] for r in rows}
    frac_formal = sum(1 for t in texts.values() if t in FORMAL) / n
    assert frac_formal >= 0.8  # the log-ratio gap dwarfs the Gumbel noise
    # determinism: same seed -> same ids; different seed -> (almost surely)
    # a different Gumbel perturbation, same high formal fraction
    again = dsir.dsir_select(
        raw.repartition(7), target, "text", n=n, id_col="doc_id", dim=512
    )
    assert {r["doc_id"] for r in again.collect()} == set(texts)
    other = dsir.dsir_select(
        raw, target, "text", n=n, id_col="doc_id", dim=512, seed="other"
    )
    other_ids = {r["doc_id"] for r in other.collect()}
    assert other_ids != set(texts) or n == n_formal_raw


def test_log_ratio_validation():
    with pytest.raises(ValueError, match="dims differ"):
        dsir.dsir_log_ratio([1, 2], [1, 2, 3])
    with pytest.raises(ValueError, match="alpha"):
        dsir.dsir_log_ratio([1], [1], alpha=0.0)
