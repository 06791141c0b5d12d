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


# ---------------------------------------------------------------------------
# InvertedIndex: build-once postings, partition-pruned probes


def test_inverted_index_matches_bm25_search(spark, docs_df, tmp_path):
    """An index probe must rank exactly like the scan operator and score
    equal to float tolerance (the per-doc sum is unordered in both)."""
    idx = search.InvertedIndex(spark, str(tmp_path / "ix"), id_col="doc_id")
    idx.build(docs_df, "text")
    for query in ("quick brown fox", "dog", "fox fox", "zzz nothing"):
        want = search.bm25_search(docs_df, "doc_id", "text", query, k=5).collect()
        got = idx.search(query, k=5).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], query
        for g, w in zip(got, want):
            assert g["bm25"] == pytest.approx(w["bm25"], rel=1e-9)


def test_inverted_index_append_equals_one_shot(spark, docs_df, tmp_path):
    """Incremental arrival == one-shot build: append the corpus in three
    batches, probe, and compare against an index built in one pass. Also
    re-opens the index from disk (stats round-trip through _index.json)."""
    items = sorted(DOCS.items())
    batches = [items[:3], items[3:6], items[6:]]
    inc = search.InvertedIndex(spark, str(tmp_path / "inc"), id_col="doc_id")
    for batch in batches:
        inc.append(spark.createDataFrame(batch, ["doc_id", "text"]), "text")
    one = search.InvertedIndex(spark, str(tmp_path / "one"), id_col="doc_id")
    one.build(docs_df, "text")
    # fresh handle over the incremental path: stats must recover from disk
    reopened = search.InvertedIndex(spark, str(tmp_path / "inc"))
    assert reopened._n_docs == one._n_docs
    assert reopened._total_tokens == one._total_tokens
    for query in ("quick brown fox", "dog"):
        a = reopened.search(query, k=5).collect()
        b = one.search(query, k=5).collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
        for x, y in zip(a, b):
            assert x["bm25"] == pytest.approx(y["bm25"], rel=1e-12)


def test_inverted_index_probe_prunes_partitions(spark, docs_df, tmp_path):
    """The probe plan must push the term-bucket filter into PartitionFilters
    (directory pruning — the reason the index beats a corpus scan) and never
    touch Python."""
    idx = search.InvertedIndex(spark, str(tmp_path / "ix"), id_col="doc_id")
    idx.build(docs_df, "text")
    out = idx.search("quick fox", k=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "term_bucket" in plan.split("PartitionFilters", 1)[1][:300]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the bucket restriction is behavioral, not just cosmetic: plant a
    # decoy posting for 'quick' in a bucket the probe never names — it
    # must stay invisible (inputFiles() can't show this; it lists the
    # relation pre-pruning)
    decoy_bucket = (idx._bucket_of("quick") + 1) % idx.n_buckets
    spark.createDataFrame(
        [(999, 5, "quick", 50)], "doc_id long, dl int, term string, tf long"
    ).withColumn("term_bucket", F.lit(decoy_bucket)).write.mode(
        "append"
    ).partitionBy("term_bucket").parquet(idx.postings_path)
    assert 999 not in {r["doc_id"] for r in idx.search("quick fox", k=10).collect()}


def test_inverted_index_empty_and_absent_cases(spark, docs_df, tmp_path):
    idx = search.InvertedIndex(spark, str(tmp_path / "ix"), id_col="doc_id")
    idx.build(docs_df, "text")
    assert idx.search("zzzz qqqq", k=3).count() == 0   # no matching terms
    assert idx.search("", k=3).count() == 0            # empty query
    fresh = search.InvertedIndex(spark, str(tmp_path / "empty"))
    assert fresh.search("quick", k=3).count() == 0     # empty index


def test_inverted_index_compact_preserves_results(spark, docs_df, tmp_path):
    """Compaction folds append-accumulated posting files to ~one per bucket
    without changing any probe result."""
    import os

    idx = search.InvertedIndex(spark, str(tmp_path / "ix"), id_col="doc_id", n_buckets=8)
    items = sorted(DOCS.items())
    for i in range(0, len(items), 2):
        idx.append(
            spark.createDataFrame(items[i : i + 2], ["doc_id", "text"]), "text"
        )

    def _n_files():
        return sum(
            1
            for _r, _d, fs in os.walk(idx.postings_path)
            for f in fs
            if f.endswith(".parquet")
        )

    before_files = _n_files()
    before = idx.search("quick brown fox", k=5).collect()
    assert idx.compact(min_files=1000) == 0          # below threshold: no-op
    removed = idx.compact(min_files=1)
    assert removed > 0 and _n_files() == before_files - removed
    after = idx.search("quick brown fox", k=5).collect()
    assert [(r["doc_id"], r["bm25"]) for r in after] == [
        (r["doc_id"], r["bm25"]) for r in before
    ]


def test_null_text_scores_zero_and_index_parity(spark, tmp_path):
    """NULL-text rows: bm25_scores gives the documented 0.0 (not a
    sum-poisoning NULL), and the inverted index's avgdl admits the same
    rows F.avg does in corpus_stats, keeping index scores IDENTICAL to
    bm25_search on corpora that contain NULL text."""
    rows = [
        (1, "the quick brown fox jumps over lazy dogs"),
        (2, None),
        (3, "quick queries need quick answers the answer is quick"),
        (4, "unrelated prose about gardening tomatoes in clay"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    scored = {
        r["doc_id"]: r["bm25"]
        for r in search.bm25_scores(df, "text", "quick answer").collect()
    }
    assert scored[2] == 0.0 and scored[4] == 0.0
    assert scored[3] > scored[1] > 0.0

    ix = search.InvertedIndex(spark, str(tmp_path / "ix"))
    ix.build(df, "text")
    got = [(r["doc_id"], r["bm25"]) for r in ix.search("quick answer", k=4).collect()]
    want = [
        (r["doc_id"], r["bm25"])
        for r in search.bm25_search(df, "doc_id", "text", "quick answer", k=4).collect()
    ]
    assert got == want  # exact, incl. the avgdl denominator


def test_inverted_index_empty_result_keeps_id_type(spark, tmp_path):
    df = spark.createDataFrame(
        [(10, "alpha beta"), (20, "beta gamma")], "doc_id long, text string"
    )
    ix = search.InvertedIndex(spark, str(tmp_path / "ix2"))
    ix.build(df, "text")
    empty = ix.search("", k=3)
    hit = ix.search("beta", k=3)
    assert empty.schema["doc_id"].dataType == hit.schema["doc_id"].dataType
    assert empty.unionByName(hit).count() == 2  # unions cleanly


def test_inverted_index_all_null_text_corpus_searches_empty(spark, tmp_path):
    """An index built over docs that ALL have NULL/empty text has n_docs > 0
    but zero postings files — search must return the empty frame, not crash
    on schema inference over the fileless postings dir."""
    # "" tokenizes to an empty (non-NULL) array: it counts as a text doc
    # yet yields zero postings — the fileless-dir case must survive even
    # when _n_text_docs > 0
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "")], "doc_id long, text string"
    )
    ix = search.InvertedIndex(spark, str(tmp_path / "nulls"))
    ix.build(df, "text")
    assert ix._n_docs == 3
    assert ix.search("anything", k=3).count() == 0
    only_null = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
    ix2 = search.InvertedIndex(spark, str(tmp_path / "nulls2"))
    ix2.build(only_null, "text")
    assert ix2._n_text_docs == 0
    assert ix2.search("anything", k=3).count() == 0


def test_inverted_index_compact_survives_stale_dirs(spark, docs_df, tmp_path):
    """A crashed prior compact can strand postings.old / postings.compact;
    the next compact must clear them and complete the swap."""
    import os

    idx = search.InvertedIndex(spark, str(tmp_path / "ix"), id_col="doc_id", n_buckets=8)
    items = sorted(DOCS.items())
    for i in range(0, len(items), 2):
        idx.append(
            spark.createDataFrame(items[i : i + 2], ["doc_id", "text"]), "text"
        )
    before = idx.search("quick brown fox", k=5).collect()
    # strand non-empty leftovers of a crashed compact
    for leftover in (idx.postings_path + ".old", idx.postings_path + ".compact"):
        os.makedirs(os.path.join(leftover, "term_bucket=0"), exist_ok=True)
        with open(os.path.join(leftover, "term_bucket=0", "junk.parquet"), "w") as f:
            f.write("not parquet")
    assert idx.compact(min_files=1) > 0
    assert not os.path.exists(idx.postings_path + ".old")
    assert not os.path.exists(idx.postings_path + ".compact")
    after = idx.search("quick brown fox", k=5).collect()
    assert [(r["doc_id"], r["bm25"]) for r in after] == [
        (r["doc_id"], r["bm25"]) for r in before
    ]
