"""Approximate-sketch operators: quantile thresholds, heavy hitters,
vocabulary top-k — estimates checked against exact computations with the
sketch's own error bounds, plus plan-shape checks (no collect-driven gates,
top-k compiles to TakeOrdered)."""

from __future__ import annotations

import collections
import random

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators.sketches import (
    approx_quantiles,
    filter_above_quantile,
    heavy_hitters,
    heavy_hitters_sampled,
    top_tokens,
)


@pytest.fixture(scope="module")
def scored(spark):
    rng = random.Random(0x5EED)
    rows = [(i, rng.gauss(50.0, 10.0), f"src{i % 3}") for i in range(5000)]
    return spark.createDataFrame(rows, "doc_id long, score double, source string").cache()


def test_approx_quantile_within_rank_error(scored):
    vals = sorted(r["score"] for r in scored.collect())
    n = len(vals)
    got = approx_quantiles(scored, "score", [0.25, 0.5, 0.9], rel_err=0.01).first()[
        "quantiles"
    ]
    for p, g in zip([0.25, 0.5, 0.9], got):
        # GK guarantee: the returned value's true rank is within rel_err*n
        rank = sum(1 for v in vals if v <= g)
        assert abs(rank - p * n) <= 0.01 * n + 1, (p, g, rank)


def test_approx_quantiles_grouped(scored):
    out = approx_quantiles(scored, "score", [0.5], by=["source"])
    rows = {r["source"]: r["quantiles"][0] for r in out.collect()}
    assert set(rows) == {"src0", "src1", "src2"}
    for src, med in rows.items():
        vals = sorted(
            r["score"] for r in scored.filter(F.col("source") == src).collect()
        )
        rank = sum(1 for v in vals if v <= med)
        assert abs(rank - 0.5 * len(vals)) <= 0.01 * len(vals) + 1


def test_filter_above_quantile_keeps_top_fraction(scored):
    kept = filter_above_quantile(scored, "score", q=0.8)
    n = scored.count()
    frac = kept.count() / n
    assert 0.17 <= frac <= 0.23  # ~20% above the 80th percentile
    # the gate keeps exactly the rows >= its own threshold (consistency)
    thr = approx_quantiles(scored, "score", [0.8]).first()["quantiles"][0]
    assert kept.filter(F.col("score") < thr).count() == 0


def test_filter_above_quantile_is_lazy_no_collect(scored):
    # building the gated plan must not trigger any job: the threshold rides
    # the plan as a broadcast one-row aggregate, not a collected literal
    out = filter_above_quantile(scored, "score", q=0.5)
    plan = out._jdf.queryExecution().toString()
    assert "percentile_approx" in plan


@pytest.fixture(scope="module")
def zipf(spark):
    rng = random.Random(0xF00D)
    values = [f"v{i}" for i in range(200)]
    weights = [1.0 / (i + 1) for i in range(200)]  # zipf-ish
    rows = [(i, rng.choices(values, weights)[0]) for i in range(20000)]
    return spark.createDataFrame(rows, "rid long, v string").cache()


def test_heavy_hitters_exact_matches_counter(zipf):
    exact = collections.Counter(r["v"] for r in zipf.collect())
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["value"], r["n"]) for r in heavy_hitters(zipf, "v", k=10).collect()]
    assert got == want


def test_heavy_hitters_topk_is_take_ordered(zipf):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        heavy_hitters(zipf, "v", k=10).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_heavy_hitters_sampled_estimates_hot_keys(zipf):
    exact = collections.Counter(r["v"] for r in zipf.collect())
    est = {
        r["value"]: r["n_est"]
        for r in heavy_hitters_sampled(
            zipf, "v", key_col="rid", k=20, sample_rate=0.2
        ).collect()
    }
    # the hottest values must be found, with counts within ~3/sqrt(c*rate)
    for v, c in sorted(exact.items(), key=lambda kv: -kv[1])[:3]:
        assert v in est
        rel = abs(est[v] - c) / c
        assert rel <= 3.0 / (c * 0.2) ** 0.5, (v, c, est[v], rel)


def test_heavy_hitters_sampled_is_deterministic(zipf):
    a = heavy_hitters_sampled(zipf, "v", key_col="rid", k=5, sample_rate=0.1).collect()
    b = heavy_hitters_sampled(zipf, "v", key_col="rid", k=5, sample_rate=0.1).collect()
    assert a == b


def test_top_tokens_matches_counter(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog ate the cat food"),
        (3, "a cat and a dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = [(r["value"], r["n"]) for r in top_tokens(df, "text", k=3).collect()]
    exact = collections.Counter(
        t for _, txt in rows for t in txt.lower().split()
    )
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == want


def test_validation_errors(scored):
    with pytest.raises(ValueError):
        approx_quantiles(scored, "score", [])
    with pytest.raises(ValueError):
        approx_quantiles(scored, "score", [1.5])
    with pytest.raises(ValueError):
        heavy_hitters(scored, "source", k=0)
    with pytest.raises(ValueError):
        heavy_hitters_sampled(scored, "source", key_col="doc_id", sample_rate=0.0)


def test_cms_estimate_upper_bounds_and_equals_exact_when_wide(zipf):
    """CMS guarantees estimate >= true count always; with width >> distinct
    items, collisions vanish and every estimate is EXACT."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.sketches import (
        cms_build,
        cms_query,
    )

    exact = {
        r["v"]: r["n"]
        for r in zipf.groupBy("v").agg(F.count("*").alias("n")).collect()
    }
    items = zipf.select("v").distinct()
    # narrow sketch: upper bound only
    sk = cms_build(zipf, "v", depth=4, width=64)
    est = {
        r["value"]: r["estimate"]
        for r in cms_query(sk, items, "v", depth=4, width=64).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # wide sketch: exact
    skw = cms_build(zipf, "v", depth=4, width=65536)
    estw = {
        r["value"]: r["estimate"]
        for r in cms_query(skw, items, "v", depth=4, width=65536).collect()
    }
    assert estw == exact
    # unseen item estimates stay small (bounded by collision mass)
    ghost = zipf.sparkSession.createDataFrame([("nope",)], "v string")
    g = cms_query(skw, ghost, "v", depth=4, width=65536).collect()[0]
    assert g["estimate"] <= 2


def test_cms_merge_is_exactly_the_union_sketch(zipf):
    """Cell-wise: sketch(A) + sketch(B) == sketch(A ∪ B) with NO loss —
    the property that makes per-day sketches a sound rollup substrate."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.sketches import (
        cms_build,
        cms_merge,
    )

    a = zipf.filter(F.col("rid") % 2 == 0)
    b = zipf.filter(F.col("rid") % 2 == 1)
    merged = cms_merge(cms_build(a, "v", 4, 512).unionAll(cms_build(b, "v", 4, 512)))
    direct = cms_build(zipf, "v", 4, 512)
    as_rows = lambda df: sorted(map(tuple, df.select("r", "c", "cnt").collect()))
    assert as_rows(merged) == as_rows(direct)


def test_cms_grouped_build_and_rollup(zipf):
    from sample_dms_kinesis_rds_mariadb_spark.operators.sketches import (
        cms_build,
        cms_merge,
        cms_query,
    )

    grouped = cms_build(
        zipf.withColumn("day", (F.col("rid") % 3).cast("string")),
        "v",
        depth=3,
        width=1024,
        by=["day"],
    )
    assert grouped.groupBy("day").count().count() == 3
    total = cms_merge(grouped, by=[])
    direct = cms_build(zipf, "v", depth=3, width=1024)
    as_rows = lambda df: sorted(map(tuple, df.select("r", "c", "cnt").collect()))
    assert as_rows(total) == as_rows(direct)
    # rollup query equals direct-build query
    items = zipf.select("v").distinct().limit(5)
    q1 = {r["value"]: r["estimate"] for r in cms_query(total, items, "v", 3, 1024).collect()}
    q2 = {r["value"]: r["estimate"] for r in cms_query(direct, items, "v", 3, 1024).collect()}
    assert q1 == q2


def test_cms_query_broadcasts_items_not_sketch(zipf):
    from sample_dms_kinesis_rds_mariadb_spark.operators.sketches import (
        cms_build,
        cms_query,
    )

    sk = cms_build(zipf, "v", depth=3, width=256)
    plan = cms_query(sk, zipf.select("v").distinct(), "v", 3, 256)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
