"""BM25 search: score parity vs an independent Python reference, top-k
semantics, and the narrow scoring-plan shape (TakeOrdered, no shuffle)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators import search

DOCS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "a quick survey of fox populations in brown forests",
    3: "dogs and cats living together",
    4: "the stock market fell sharply on quick trading",
    5: "brown bread recipes with a quick rise",
    6: "completely unrelated text about spark plans",
    7: "fox fox fox fox fox",
    8: "",
}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], ["doc_id", "text"]
    ).cache()


def test_bm25_scores_match_python_reference(spark, docs_df):
    for query in ("quick brown fox", "dog", "QUICK  Quick fox", "absent terms"):
        got = {
            r["doc_id"]: r["bm25"]
            for r in search.bm25_scores(docs_df, "text", query).collect()
        }
        want = search.reference_bm25(DOCS, query)
        assert set(got) == set(want)
        for i in DOCS:
            assert got[i] == pytest.approx(want[i], rel=1e-12, abs=1e-300), (
                query,
                i,
            )


def test_bm25_search_topk(spark, docs_df):
    top = search.bm25_search(docs_df, "doc_id", "text", "quick brown fox", k=3)
    rows = top.collect()
    want = search.reference_bm25(DOCS, "quick brown fox")
    order = sorted(
        (i for i in DOCS if want[i] > 0), key=lambda i: (-want[i], i)
    )[:3]
    assert [r["doc_id"] for r in rows] == order
    # zero-scoring docs never appear, even with a generous k
    fox_want = search.reference_bm25(DOCS, "fox")
    all_hits = search.bm25_search(docs_df, "doc_id", "text", "fox", k=100).collect()
    assert sorted(r["doc_id"] for r in all_hits) == sorted(
        i for i in DOCS if fox_want[i] > 0
    )


def test_bm25_no_matching_terms_returns_empty(spark, docs_df):
    assert search.bm25_search(docs_df, "doc_id", "text", "zzz qqq", k=5).count() == 0
    assert search.bm25_search(docs_df, "doc_id", "text", [], k=5).count() == 0


def test_bm25_scoring_plan_is_narrow_takeordered(spark, docs_df):
    top = search.bm25_search(docs_df, "doc_id", "text", "quick fox", k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        top.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_query_term_normalization():
    assert search._query_terms("  Quick   QUICK brown ") == ["quick", "brown"]
    assert search._query_terms(["A", "b", "a", ""]) == ["a", "b"]


def test_bm25_batch_matches_single_query_path(spark, docs_df):
    """One-pass batch retrieval must agree with the per-query operator (and
    so with the Python reference) for every query: same ids, same order,
    scores equal to float tolerance (groupBy sum order is unordered)."""
    queries = {
        "q1": "quick brown fox",
        "q2": "dog",
        "q3": "fox fox",          # duplicate terms collapse
        "q4": "zzz nothing",      # no hits
    }
    out = search.bm25_batch_search(docs_df, "doc_id", "text", queries, k=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["bm25"]))
    for qid in got:
        got[qid].sort()
    for qid, q in queries.items():
        want_rows = search.bm25_search(docs_df, "doc_id", "text", q, k=4).collect()
        want = [(i + 1, r["doc_id"]) for i, r in enumerate(want_rows)]
        have = [(rk, d) for rk, d, _ in got.get(qid, [])]
        assert have == want, qid
        for (_, _, score), wr in zip(got.get(qid, []), want_rows):
            assert score == pytest.approx(wr["bm25"], rel=1e-9)
    assert "q4" not in got


def test_bm25_batch_empty_queries(spark, docs_df):
    out = search.bm25_batch_search(docs_df, "doc_id", "text", {}, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "bm25", "rank"]


def test_bm25_batch_plan_broadcasts_query_table(spark, docs_df):
    out = search.bm25_batch_search(
        docs_df, "doc_id", "text", {"a": "quick fox", "b": "dog"}, k=3
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
