"""Chunking / packing / redaction: exact parity with Python references,
pack-invariant checks, and plan hygiene (chunking must stay JVM-only)."""

from __future__ import annotations

import contextlib
import io
import random

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators.chunking import (
    chunk_by_tokens,
    pack_sequences,
    pii_counts,
    redact_pii,
)


def _python_chunks(text: str, max_tokens: int, overlap: int) -> list[list[str]]:
    toks = text.lower().split()
    if not toks:
        return []
    step = max_tokens - overlap
    out = []
    s = 0
    while True:
        out.append(toks[s : s + max_tokens])
        if s + max_tokens >= len(toks):
            break
        s += step
        if s >= len(toks) - overlap and overlap:
            break
    return out


@pytest.mark.parametrize("max_tokens,overlap", [(4, 0), (4, 1), (3, 2), (10, 0)])
def test_chunks_match_python_reference(spark, max_tokens, overlap):
    texts = [
        "one two three four five six seven eight nine ten",
        "a b c",
        "single",
        "",
        "exactly four tokens here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got: dict[int, list[str]] = {}
    rows = chunk_by_tokens(df, "doc_id", "text", max_tokens, overlap).collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"], r["n_tokens"]))
    for i, t in enumerate(texts):
        want = [
            (j, " ".join(c), len(c))
            for j, c in enumerate(_python_chunks(t, max_tokens, overlap))
        ]
        assert sorted(got.get(i, [])) == want, (i, t, got.get(i), want)


def test_chunking_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chunk_by_tokens(df, "doc_id", "text", 2).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan  # narrow map, no shuffle
    # no Python-worker operators (the scan of a local-rows DataFrame shows
    # "applySchemaToPythonRDD", which is the test input, not the operator)
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert node not in plan, node


def test_chunk_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_by_tokens(df, "doc_id", "text", 0)
    with pytest.raises(ValueError):
        chunk_by_tokens(df, "doc_id", "text", 4, overlap=4)


def test_pack_sequences_invariants(spark):
    rng = random.Random(0xBEEF)
    rows = [(i, rng.randint(1, 900)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", max_len=1024, n_buckets=16).cache()
    res = out.collect()
    # every document packed exactly once
    assert sorted(r["doc_id"] for r in res) == [i for i, _ in rows]
    # no pack exceeds max_len (every doc here is <= max_len)
    per_pack: dict[int, int] = {}
    for r in res:
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["n_tokens"]
    assert max(per_pack.values()) <= 1024
    # pack_total column agrees with the recomputed totals
    for r in res:
        assert r["pack_total"] == per_pack[r["pack_id"]]
    # packing efficiency: greedy on ~450-avg docs should fill packs well
    fill = sum(per_pack.values()) / (len(per_pack) * 1024)
    assert fill > 0.5, fill


def test_pack_oversized_doc_gets_own_pack(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 5000), (3, 60)], "doc_id long, n_tokens long"
    )
    res = pack_sequences(df, "doc_id", "n_tokens", max_len=100, n_buckets=1).collect()
    packs = {r["doc_id"]: r["pack_id"] for r in res}
    assert packs[2] not in (packs[1], packs[3])


def test_pack_deterministic(spark):
    rows = [(i, (i * 37) % 500 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = sorted(
        (r["doc_id"], r["pack_id"])
        for r in pack_sequences(df, "doc_id", "n_tokens", 512, n_buckets=8).collect()
    )
    b = sorted(
        (r["doc_id"], r["pack_id"])
        for r in pack_sequences(df, "doc_id", "n_tokens", 512, n_buckets=8).collect()
    )
    assert a == b


def test_redact_pii(spark):
    rows = [
        (1, "mail me at jane.doe+x@example.co.uk today"),
        (2, "server 192.168.1.254 and 8.8.8.8 are up; version 1.2.3.4.5 is not an ip"),
        (3, "call +1 (555) 123-4567 or 555-123-4567"),
        (4, "ssn 123-45-6789 leaked"),
        (5, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r["red"] for r in df.select("id", redact_pii(F.col("text")).alias("red")).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert "<IP>" in got[2] and "192.168" not in got[2]
    assert "<PHONE>" in got[3] and "4567" not in got[3]
    assert got[4] == "ssn <SSN> leaked"
    assert got[5] == rows[4][1]


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [(1, "a@b.com c@d.org 10.0.0.1 123-45-6789")], "id int, text string"
    )
    cnt = pii_counts(F.col("text"))
    row = df.select(*[c.alias(k) for k, c in cnt.items()]).first()
    assert row["email"] == 2
    assert row["ipv4"] == 1
    assert row["ssn"] == 1


# -- decontamination + repetition signals ------------------------------------


def test_decontaminate_drops_benchmark_overlaps(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        contamination_pairs,
        decontaminate,
    )

    bench_q = (
        "what is the capital of france and when was it founded by the romans"
    )  # 14 tokens -> two 13-grams
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 13-gram verbatim inside a longer doc
            (1, "quiz answers here " + bench_q + " plus trailing words"),
            (2, "a completely clean document about growing tomatoes in clay soil at altitude"),
            # shares shorter fragments only (< 13-gram overlap)
            (3, "what is the capital of france people often ask in trivia night"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(900, bench_q)], "doc_id long, text string")

    pairs = contamination_pairs(corpus, bench, "doc_id", "text", n=13)
    hits = {(r["corpus_id"], r["bench_id"]) for r in pairs.collect()}
    assert hits == {(1, 900)}

    clean = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, "doc_id", "text", n=13).collect()
    )
    assert clean == [2, 3]


def test_contamination_plan_broadcasts_benchmark(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        contamination_pairs,
    )

    corpus = spark.createDataFrame(
        [(i, "word " * 20) for i in range(10)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(1, "word " * 20)], "doc_id long, text string")
    plan = _plan_of_df(contamination_pairs(corpus, bench, "doc_id", "text"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def _plan_of_df(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_repetition_ratios(spark):
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        repetition_ratios,
    )

    docs = spark.createDataFrame(
        [
            (1, "same line\nsame line\nsame line\nother line"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, ""),
            (4, "go go go go go go"),
        ],
        "doc_id long, text string",
    )
    r = repetition_ratios(F.col("text"))
    rows = {
        row["doc_id"]: row
        for row in docs.select(
            "doc_id", *[c.alias(k) for k, c in r.items()]
        ).collect()
    }
    assert rows[1]["dup_line_frac"] == pytest.approx(0.5)  # 2 of 4 repeat
    assert rows[2]["dup_line_frac"] == 0.0
    assert rows[2]["dup_trigram_frac"] == 0.0
    assert rows[3]["dup_line_frac"] == 0.0 and rows[3]["dup_trigram_frac"] == 0.0
    # "go go go go go go": 4 trigrams, 1 distinct -> 0.75
    assert rows[4]["dup_trigram_frac"] == pytest.approx(0.75)


# -- training-shard export ----------------------------------------------------


def test_write_training_shards_roundtrip(spark, tmp_path):
    from sample_dms_kinesis_rds_mariadb_spark.operators.export import (
        verify_shards,
        write_training_shards,
    )

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.concat(F.lit("doc "), F.col("doc_id"))
    )
    path = str(tmp_path / "shards")
    manifest = write_training_shards(df, path, "doc_id", n_shards=8)
    assert manifest["total_rows"] == 1000
    assert len(manifest["shard_rows"]) == 8
    # md5-uniform: no shard wildly over/under-filled
    assert all(60 <= n <= 190 for n in manifest["shard_rows"].values())
    assert verify_shards(spark, path)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.select("doc_id").distinct().count() == 1000


def test_shard_assignment_is_stable_across_exports(spark, tmp_path):
    from sample_dms_kinesis_rds_mariadb_spark.operators.export import shard_column

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = {r["k"]: r["shard"] for r in shard_column(df, "k", 16).collect()}
    b = {r["k"]: r["shard"] for r in shard_column(df, "k", 16).collect()}
    assert a == b
    # membership is a function of the key alone: a subset gets same shards
    sub = {r["k"]: r["shard"] for r in shard_column(df.filter("k < 100"), "k", 16).collect()}
    assert sub == {k: v for k, v in a.items() if k < 100}


def test_verify_shards_detects_tampering(spark, tmp_path):
    import glob
    import os

    from sample_dms_kinesis_rds_mariadb_spark.operators.export import (
        verify_shards,
        write_training_shards,
    )

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "shards-tamper")
    write_training_shards(df, path, "doc_id", n_shards=4)
    victim = glob.glob(os.path.join(path, "shard=*", "*.parquet"))[0]
    os.remove(victim)
    with pytest.raises(ValueError, match="diverge"):
        verify_shards(spark, path)


def test_training_shards_empty_input(spark, tmp_path):
    """An all-filtered-out corpus is a valid (empty) export: manifest with
    total_rows=0, verify passes — not a parquet schema-inference crash."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.export import (
        verify_shards,
        write_training_shards,
    )

    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    path = str(tmp_path / "shards-empty")
    manifest = write_training_shards(empty, path, "doc_id", n_shards=4)
    assert manifest["total_rows"] == 0 and manifest["shard_rows"] == {}
    assert verify_shards(spark, path)


def test_shuffled_export_order_reproducible_and_decorrelated(spark, tmp_path):
    """shuffle_seed: same membership + manifest, seed-reproducible
    within-shard order, different seeds give different epoch orders."""
    import os

    from sample_dms_kinesis_rds_mariadb_spark.operators.export import (
        verify_shards,
        write_training_shards,
    )

    df = spark.range(0, 400).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.concat(F.lit("doc "), F.col("doc_id"))
    )

    def export(seed, sub):
        path = str(tmp_path / sub)
        m = write_training_shards(df, path, "doc_id", n_shards=4, shuffle_seed=seed)
        order = {}
        for d in sorted(os.listdir(path)):
            if d.startswith("shard="):
                k = int(d.split("=")[1])
                order[k] = [
                    r["doc_id"]
                    for r in spark.read.parquet(os.path.join(path, d)).collect()
                ]
        return m, order, path

    m1, o1, p1 = export(7, "a")
    m2, o2, _ = export(7, "b")
    m3, o3, _ = export(8, "c")
    m0, o0, _ = export(None, "d")
    # membership and manifest counts are seed-independent
    assert m1["shard_rows"] == m2["shard_rows"] == m3["shard_rows"] == m0["shard_rows"]
    assert {k: sorted(v) for k, v in o1.items()} == {k: sorted(v) for k, v in o0.items()}
    # same seed => byte-stable order; different seed => different order;
    # any seed => decorrelated from the key order
    assert o1 == o2
    assert o1 != o3
    assert all(o1[k] != sorted(o1[k]) for k in o1 if len(o1[k]) > 10)
    assert all(o0[k] == sorted(o0[k]) for k in o0)
    assert verify_shards(spark, p1)


def test_write_range_layout_disjoint_file_ranges(spark, tmp_path):
    """Zone-map layout: every output file must cover a disjoint sort-key
    range (checked from the parquet footers themselves), and a range
    predicate must return exactly the right rows."""
    import os

    import pyarrow.parquet as pq

    from sample_dms_kinesis_rds_mariadb_spark.operators.export import (
        write_range_layout,
    )

    df = spark.range(0, 10000).withColumn("payload", F.col("id") * 2)
    # write decorrelated from id order to prove the layout does the sorting
    path = str(tmp_path / "ranged")
    write_range_layout(df.orderBy(F.md5(F.col("id").cast("string"))), path, "id", n_files=8)

    ranges = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".parquet"):
            meta = pq.ParquetFile(os.path.join(path, f)).metadata
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                col = next(
                    meta.row_group(rg).column(i)
                    for i in range(meta.num_columns)
                    if meta.row_group(rg).column(i).path_in_schema == "id"
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 8
    ranges.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b  # disjoint: footer stats prune whole files
    assert ranges[0][0] == 0 and ranges[-1][1] == 9999

    back = spark.read.parquet(path).filter("id BETWEEN 2500 AND 2599")
    assert back.count() == 100


def test_contamination_scores_exact_fractions(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        contamination_scores,
    )

    def py_grams(text: str, n: int) -> set[str]:
        import re

        toks = re.sub(r"\s+", " ", text).strip().lower().split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench_q = (
        "what is the capital of france and when was it founded by the romans"
    )
    corpus_rows = [
        (1, "quiz answers here " + bench_q + " plus trailing words"),
        (2, "a completely clean document about tomatoes grown in clay soil "
            "in a greenhouse at altitude with irrigation and some patience"),
        (3, bench_q),          # verbatim benchmark doc -> score 1.0
        (4, "too short"),      # < n tokens -> 0 grams, score 0.0
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame([(900, bench_q)], "doc_id long, text string")

    n = 13
    bench_grams = py_grams(bench_q, n)
    expected = {}
    for doc_id, text in corpus_rows:
        g = py_grams(text, n)
        matched = len(g & bench_grams)
        expected[doc_id] = (len(g), matched, matched / len(g) if g else 0.0)

    got = {
        r["doc_id"]: (r["n_grams"], r["n_matched"], r["score"])
        for r in contamination_scores(corpus, bench, "doc_id", "text", n=n).collect()
    }
    assert set(got) == set(expected)          # every corpus row present 1:1
    for doc_id, (ng, nm, sc) in expected.items():
        assert got[doc_id][0] == ng, doc_id
        assert got[doc_id][1] == nm, doc_id
        assert got[doc_id][2] == pytest.approx(sc), doc_id
    assert got[3][2] == 1.0                  # verbatim benchmark doc
    assert got[2][2] == 0.0                  # clean doc
    assert 0.0 < got[1][2] < 1.0             # partial inclusion is graded
    assert got[4] == (0, 0, 0.0)             # sub-n-token doc


def test_remove_repeated_spans_matches_python_reference(spark):
    """ExactSubstr-style span removal: exact parity vs an independent
    Python implementation, incl. overlap merging, untouched docs, and a
    doc made entirely of a repeated span."""
    from collections import defaultdict

    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        remove_repeated_spans,
        repeated_span_positions,
    )

    span = 4
    shared = "alpha beta gamma delta epsilon"  # 5 tokens -> two 4-gram starts
    rows = [
        (1, "intro words " + shared + " closing remarks here"),
        (2, "other doc leading text " + shared + " and a tail"),
        (3, "a completely unrelated document about nothing shared"),
        (4, shared),  # entirely covered
    ]

    def py_tokens(text):
        import re

        return re.sub(r"\s+", " ", text).strip().lower().split(" ")

    gram_docs = defaultdict(set)
    for i, t in rows:
        toks = py_tokens(t)
        for p in range(len(toks) - span + 1):
            gram_docs[" ".join(toks[p : p + span])].add(i)
    dup = {g for g, ids in gram_docs.items() if len(ids) >= 2}
    expected = {}
    exp_positions = defaultdict(set)
    for i, t in rows:
        toks = py_tokens(t)
        covered = set()
        for p in range(len(toks) - span + 1):
            if " ".join(toks[p : p + span]) in dup:
                covered.update(range(p, p + span))
                exp_positions[i].add(p)
        expected[i] = " ".join(
            tok for j, tok in enumerate(toks) if j not in covered
        )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_pos = defaultdict(set)
    for r in repeated_span_positions(df, "doc_id", "text", span=span).collect():
        got_pos[r["doc_id"]].add(r["pos"])
    assert got_pos == exp_positions

    got = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(df, "doc_id", "text", span=span).collect()
    }
    assert got == expected
    assert got[3] == " ".join(py_tokens(rows[2][1]))  # untouched
    assert got[4] == ""                               # fully removed


def test_repeated_span_df_cap_and_validation(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        remove_repeated_spans,
        repeated_span_positions,
    )

    rows = [(i, "the same exact line everywhere") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # df-cap: a span in all 5 docs is dropped when max_span_df < 5
    capped = repeated_span_positions(
        df, "doc_id", "text", span=3, max_span_df=4
    )
    assert capped.count() == 0
    uncapped = remove_repeated_spans(
        df, "doc_id", "text", span=3, max_span_df=None, out_col="clean"
    )
    assert all(r["clean"] == "" for r in uncapped.collect())
    with pytest.raises(ValueError, match="span"):
        repeated_span_positions(df, "doc_id", "text", span=0)


def test_remove_repeated_spans_randomized_parity(spark):
    """Randomized corpus (small alphabet forces organic cross-doc span
    collisions) vs the independent Python reference — one Spark job."""
    import random
    from collections import defaultdict

    rng = random.Random(0xC0FFEE)
    vocab = [f"w{i}" for i in range(12)]
    span = 5
    rows = []
    for d in range(40):
        n = rng.randint(3, 30)  # some docs shorter than the span
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant one guaranteed repeat across two docs
    planted = " ".join(vocab[:span])
    rows[5] = (5, rows[5][1] + " " + planted)
    rows[17] = (17, planted + " " + rows[17][1])

    gram_docs = defaultdict(set)
    for i, t in rows:
        toks = t.split(" ")
        for p in range(len(toks) - span + 1):
            gram_docs[" ".join(toks[p : p + span])].add(i)
    dup = {g for g, ids in gram_docs.items() if len(ids) >= 2}
    expected = {}
    for i, t in rows:
        toks = t.split(" ")
        covered = set()
        for p in range(len(toks) - span + 1):
            if " ".join(toks[p : p + span]) in dup:
                covered.update(range(p, p + span))
        expected[i] = " ".join(
            tok for j, tok in enumerate(toks) if j not in covered
        )

    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        remove_repeated_spans,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(df, "doc_id", "text", span=span).collect()
    }
    assert got == expected
    assert any(got[i] != t for i, t in rows)  # something was actually removed


def test_contamination_scores_null_text_counts_zero_grams(spark):
    """NULL-text rows must still appear 1:1 with n_grams = 0 (not NULL —
    ANSI size(NULL) would leak through), n_matched = 0, score 0.0, matching
    the DuckDB oracle's COALESCE(n_grams, 0)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        contamination_scores,
    )

    corpus = spark.createDataFrame(
        [(1, "one two three four"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "one two three")], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_matched"], r["score"])
        for r in contamination_scores(corpus, bench, "doc_id", "text", n=3).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[2] == (0, 0, 0.0)
    assert got[3] == (0, 0, 0.0)
    assert got[1][0] == 2 and got[1][1] == 1


def test_decontaminate_bloom_equals_exact(spark):
    """decontaminate_bloom is row-identical to decontaminate: the Bloom
    pass can only over-flag (no false negatives), and the exact verify on
    the flagged slice removes every false positive — tested across
    min_shared thresholds, NULL text, and a deliberately terrible
    fpp=0.5 filter that floods the verify stage with false positives."""
    import random

    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        decontaminate,
        decontaminate_bloom,
    )

    rng = random.Random(13)
    words = [f"w{i}" for i in range(120)]
    bench_rows = [
        (900 + i, " ".join(rng.choice(words) for _ in range(30)))
        for i in range(6)
    ]
    corpus_rows = []
    for i in range(60):
        body = " ".join(rng.choice(words) for _ in range(40))
        if i % 7 == 0:  # splice in a verbatim benchmark span
            b = bench_rows[i % len(bench_rows)][1]
            body = body + " " + b
        corpus_rows.append((i, body))
    corpus_rows += [(1000, None), (1001, "too short")]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")

    for min_shared, fpp, n in ((1, 0.01, 13), (3, 0.01, 5), (1, 0.5, 13)):
        exact = sorted(
            r["doc_id"]
            for r in decontaminate(
                corpus, bench, "doc_id", "text", n=n, min_shared=min_shared
            ).collect()
        )
        bloom = sorted(
            r["doc_id"]
            for r in decontaminate_bloom(
                corpus, bench, "doc_id", "text",
                n=n, min_shared=min_shared, fpp=fpp,
            ).collect()
        )
        assert bloom == exact, (min_shared, fpp, n)
    # fixture sanity: something was actually dropped
    assert len(exact) < len(corpus_rows)


def test_decontaminate_bloom_empty_benchmark_is_identity(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        decontaminate_bloom,
    )

    corpus = spark.createDataFrame(
        [(1, "some words here repeated often enough")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, None)], "doc_id long, text string")
    assert decontaminate_bloom(corpus, bench, "doc_id", "text").count() == 1


def test_gopher_quality_flags_match_python_reference(spark):
    """Every Gopher rule verdict must match an independent Python
    implementation of the published rule set (Rae et al. 2021, App. A),
    over documents engineered to trip each rule individually."""
    import re

    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        GOPHER_REQUIRED_WORDS,
        gopher_quality_flags,
        py_clean_tokens,
    )
    from pyspark.sql import functions as F

    def ref(text):
        toks = py_clean_tokens(text) if text is not None else []
        n_words = len(toks)
        n_chars = sum(len(t) for t in toks)
        t = text or ""
        ok_wc = 50 <= n_words <= 100_000
        ok_mwl = n_words > 0 and 3 * n_words <= n_chars <= 10 * n_words
        # per-class ("either the hash symbol or the ellipsis"): each
        # symbol class independently <= 10% of words
        n_hash = t.count("#")
        n_ell = t.count("...") + t.count("\u2026")
        ok_sym = (
            n_words > 0
            and n_hash * 10 <= n_words
            and n_ell * 10 <= n_words
        )
        lines = [l for l in re.split(r"\r?\n", t) if l.strip()]
        bullets = sum(
            1 for l in lines
            if re.match(r"^(\u2022|\u2023|\u25aa|\u25cf|\*|-)", l.strip())
        )
        ells = sum(
            1 for l in lines if re.search(r"(\.\.\.|\u2026)$", l.strip())
        )
        ok_bul = len(lines) == 0 or bullets * 10 <= len(lines) * 9
        ok_ell = len(lines) == 0 or ells * 10 <= len(lines) * 3
        alpha = sum(1 for x in toks if re.search(r"[a-zA-Z]", x))
        ok_alpha = n_words > 0 and alpha * 10 >= n_words * 8
        ok_req = len(set(toks) & set(GOPHER_REQUIRED_WORDS)) >= 2
        flags = (ok_wc, ok_mwl, ok_sym, ok_bul, ok_ell, ok_alpha, ok_req)
        return flags + (all(flags),)

    good = (
        "the quick brown fox jumps over that lazy dog and runs with great "
        "energy to have fun in fields of green grass where sunlight warms "
        "every blade and the gentle wind carries seeds to distant meadows "
        "beyond the old stone wall that farmers built many years ago here "
        "while birds sing from tall branches above them all day long"
    )
    cases = [
        good,                                        # passes everything
        "too few words here",                        # word count
        good.replace("the", "a a a a a a"),          # mean word len low-ish
        good + " " + "#" * 40,                       # symbol ratio (hashes)
        "\n".join("- " + l for l in good.split(" ")),  # bullet lines
        "\n".join(l + "..." for l in good.split(" ")), # ellipsis lines
        good + " " + " ".join(["123"] * 60),         # alpha-word fraction
        good.replace("the", "cat").replace("that", "dog")
            .replace("and", "fox").replace("to", "run")
            .replace("with", "big").replace("of", "sky"), # required words
        "",                                          # empty
        None,                                        # NULL
        good + "\u2026 done \u2022 yes",           # unicode glyphs
        "\r\n".join(l + "..." for l in good.split(" ")),  # CRLF + ellipsis lines
        "\n".join("\t- " + l for l in good.split(" ")),   # tab-indented bullets
        good + "\r\n\t \r\nmore words here",           # blank CRLF/tab lines
        # 0.07 hash + 0.07 ellipsis ratios: passes the per-class rule but
        # would fail a pooled 0.1 threshold — pins the published semantics
        good + " " + "# " * 4 + "... " * 4,
        good + " " + "# " * 7,                       # hashes alone > 0.1
        good + " " + "... " * 7,                     # ellipses alone > 0.1
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, text string"
    )
    flags = gopher_quality_flags(F.col("text"))
    cols = [
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
        "ok_required_words", "gopher_pass",
    ]
    got = {
        r["i"]: tuple(r[c] for c in cols)
        for r in df.select("i", *[flags[c].alias(c) for c in cols]).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == ref(c), (i, repr(c)[:60], got[i], ref(c))
    assert got[0][-1] is True          # the good doc passes outright
    assert sum(g[-1] for g in got.values()) < len(cases)  # others trip
    # pin the per-class (not pooled) symbol-ratio semantics: 0.06 hash +
    # 0.06 ellipsis passes, but either class alone above 0.1 fails
    assert got[len(cases) - 3][2] is True
    assert got[len(cases) - 2][2] is False
    assert got[len(cases) - 1][2] is False


def test_c4_rules_match_python_reference(spark):
    """Every C4 line/page verdict must match an independent Python
    implementation of the published rules (Raffel et al. 2020, §2.2),
    over documents engineered to trip each rule individually."""
    import re

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        C4_POLICY_SUBSTRINGS,
        c4_clean_text,
        c4_quality_flags,
    )

    def ref_kept(text):
        out = []
        for l in re.split(r"\r?\n", text or ""):
            l = re.sub(r"^\s+|\s+$", "", l)
            low = l.lower()
            if not l:
                continue
            if not re.search(r'[.!?"]$', l) or re.search(r"\.\.\.$", l):
                continue
            if len([w for w in re.split(r"\s+", l) if w]) < 5:
                continue
            if "javascript" in low:
                continue
            if any(p in low for p in C4_POLICY_SUBSTRINGS):
                continue
            out.append(l)
        return out

    def ref_flags(text):
        t = text or ""
        kept = ref_kept(text)
        no_lorem = "lorem ipsum" not in t.lower()
        no_curly = "{" not in t
        n_sent = sum(len(re.findall(r"[.!?]", l)) for l in kept)
        ok_sent = n_sent >= 5
        return (no_lorem, no_curly, ok_sent,
                no_lorem and no_curly and ok_sent)

    good = "\n".join(
        "This line has enough words and ends properly%s" % p
        for p in (".", "!", "?", '."', ".")
    )
    cases = [
        good,                                        # passes everything
        good + "\nshort line.",                      # <5-word line dropped
        good + "\nThis line has no terminal punctuation at all",
        good + "\nThis trailing line ends in an ellipsis so it goes...",
        good + "\nEnable JavaScript to view the comments powered here.",
        good + "\nPlease read our privacy policy before continuing on.",
        good.replace("properly.", "properly") ,      # fewer sentences
        good + "\nlorem ipsum dolor sit amet and so on it goes.",
        good + "\nconst x = { a: 1 }; is code in the page.",
        "",                                          # empty
        None,                                        # NULL
        good.replace("\n", "\r\n"),                  # CRLF
        "   \t \n" + good + "\n  \t",                # blank/whitespace lines
        'He said "this quoted line has enough words to stay."\n' + good,
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, text string"
    )
    fl = c4_quality_flags(F.col("text"))
    cols = ["no_lorem_ipsum", "no_curly_brace", "ok_sentence_count", "c4_pass"]
    got = {
        r["i"]: (tuple(r[c] for c in cols), r["clean"])
        for r in df.select(
            "i",
            F.coalesce(c4_clean_text(F.col("text")), F.lit("")).alias("clean"),
            *[fl[c].alias(c) for c in cols],
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i][0] == ref_flags(c), (i, repr(c)[:60], got[i][0], ref_flags(c))
        assert got[i][1] == "\n".join(ref_kept(c)), (i, repr(c)[:60])
    assert got[0][0][-1] is True
    assert sum(g[0][-1] for g in got.values()) < len(cases)

    # badwords: single words match token-wise, phrases substring-wise
    bw = ("badword", "two part")
    fl_bw = c4_quality_flags(F.col("text"), badwords=bw)
    df2 = spark.createDataFrame(
        [
            (0, good),
            (1, good + "\nThis line mentions badword in it clearly."),
            (2, good + "\nThis one has a two part phrase inside it."),
            (3, good + "\nBadWording as a longer token does not match."),
        ],
        "i long, text string",
    )
    got2 = {
        r["i"]: r["nb"]
        for r in df2.select(
            "i", fl_bw["no_bad_words"].alias("nb")
        ).collect()
    }
    assert got2 == {0: True, 1: False, 2: False, 3: True}


def test_gopher_repetition_flags_match_python_reference(spark):
    """Every rule of the FULL Gopher repetition table (Rae et al. 2021,
    Table A1) must match an independent Python implementation, over
    documents engineered to trip each rule individually."""
    import re
    from collections import Counter

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        gopher_repetition_flags,
        py_clean_tokens,
    )

    def units(t, pattern):
        return [
            u for u in (re.sub(r"^\s+|\s+$", "", x) for x in re.split(pattern, t))
            if u
        ]

    def dup_beyond_first(xs):
        c = Counter(xs)
        return (
            sum(v - 1 for v in c.values() if v > 1),
            sum((v - 1) * len(k) for k, v in c.items() if v > 1),
        )

    def top_cov(grams):
        c = Counter(grams)
        if not c:
            return 0
        mc = max(c.values())
        if mc < 2:
            return 0
        return mc * max(len(g) for g, v in c.items() if v == mc)

    def ref(text):
        t = text or ""
        n_len = len(t)
        lines = units(t, r"\r?\n")
        paras = units(t, r"(?:\r?\n){2,}")
        dl, dlc = dup_beyond_first(lines)
        dp, dpc = dup_beyond_first(paras)
        toks = py_clean_tokens(t)

        def grams(n):
            return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

        out = [
            dl * 10 <= len(lines) * 3,
            dp * 10 <= len(paras) * 3,
            dlc * 10 <= n_len * 2,
            dpc * 10 <= n_len * 2,
        ]
        for n, thr in ((2, 20), (3, 18), (4, 16)):
            out.append(top_cov(grams(n)) * 100 <= n_len * thr)
        for n, thr in ((5, 15), (6, 14), (7, 13), (8, 12), (9, 11), (10, 10)):
            _c, dch = dup_beyond_first(grams(n))
            out.append(dch * 100 <= n_len * thr)
        return tuple(out) + (all(out),)

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four"
    )
    rep10 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    cases = [
        base,                                         # clean: passes all
        "\n".join([base, "dup line here", "dup line here", "dup line here"]),
        "\n\n".join([base, "dup para", "dup para", "dup para"]),
        # one huge duplicated line among many short ones: char frac trips
        "\n".join(["a."] * 30 + [base, base]),
        "\n\n".join(["b."] * 30 + [base, base]),
        base + " " + "tick tock " * 30,               # top 2-gram coverage
        base + " " + "one two three " * 20,           # top 3-gram
        base + " " + "a b c d " * 20,                 # top 4-gram
        base + " " + " ".join([rep10] * 6),           # dup 5..10-gram chars
        "",                                           # empty: vacuous pass
        None,                                         # NULL: vacuous pass
        base.replace(" ", "\r\n") + "\r\n" + base.replace(" ", "\r\n"),  # CRLF dup lines
        "   \n\t\n" + base,                           # whitespace-only units
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, text string"
    )
    fl = gopher_repetition_flags(F.col("text"))
    cols = [
        "ok_dup_line_frac", "ok_dup_para_frac", "ok_dup_line_char_frac",
        "ok_dup_para_char_frac", "ok_top_2gram_chars", "ok_top_3gram_chars",
        "ok_top_4gram_chars", "ok_dup_5gram_chars", "ok_dup_6gram_chars",
        "ok_dup_7gram_chars", "ok_dup_8gram_chars", "ok_dup_9gram_chars",
        "ok_dup_10gram_chars", "repetition_pass",
    ]
    got = {
        r["i"]: tuple(r[c] for c in cols)
        for r in df.select("i", *[fl[c].alias(c) for c in cols]).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == ref(c), (i, repr(c)[:60], got[i], ref(c))
    assert got[0][-1] is True
    assert sum(g[-1] for g in got.values()) < len(cases)
    # each engineered trip case fails at least its targeted family
    assert got[1][0] is False      # dup line fraction
    assert got[2][1] is False      # dup paragraph fraction
    assert got[5][4] is False      # top 2-gram chars
    assert got[8][7] is False      # dup 5-gram chars
