"""Product quantization vs independent numpy references: encode must pick
the truly-nearest codebook entry per subspace (brute force over the
books), ADC distances must equal scoring the RECONSTRUCTION exactly (the
defining PQ identity), recall through the coarse→rerank path, and the
no-UDF / pruned-scan / TakeOrdered plan shape."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators import pq as pqm
from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import (
    brute_force_topk,
)


def _corpus(spark, n=120, dim=8, seed=0, n_clusters=6):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, (n_clusters, dim))
    vecs = centers[rng.integers(0, n_clusters, n)] + rng.normal(0, 0.4, (n, dim))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>"),
        vecs,
    )


@pytest.fixture(scope="module")
def pq_setup(spark):
    df, vecs = _corpus(spark)
    books = pqm.train_pq(df, m=4, k=8, seed=7)
    return df, vecs, books


def test_train_pq_shapes_and_dim_check(spark, pq_setup):
    df, vecs, books = pq_setup
    assert len(books) == 4
    assert all(len(b) == 8 for b in books)
    assert all(len(c) == 2 for b in books for c in b)
    with pytest.raises(ValueError, match="divisible"):
        pqm.train_pq(df, m=3)


def test_pq_encode_matches_numpy_argmin(spark, pq_setup):
    df, vecs, books = pq_setup
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in pqm.pq_encode(df, books).collect()
    }
    for i, v in enumerate(vecs):
        want = []
        for j, book in enumerate(books):
            sub = v[j * 2 : (j + 1) * 2]
            d2 = [float(np.sum((sub - np.array(c)) ** 2)) for c in book]
            want.append(int(np.argmin(d2)))
        assert got[i] == want, f"row {i}"


def test_adc_equals_reconstruction_distance(spark, pq_setup):
    df, vecs, books = pq_setup
    codes = pqm.pq_encode(df, books)
    probe = [float(x) for x in vecs[0]]
    l2 = {
        r["vec_id"]: r["adc_dist"]
        for r in pqm.pq_adc_topk(codes, books, probe, k=120, metric="l2").collect()
    }
    cos = {
        r["vec_id"]: r["adc_cosine"]
        for r in pqm.pq_adc_topk(codes, books, probe, k=120, metric="cosine").collect()
    }
    ip = {
        r["vec_id"]: r["adc_ip"]
        for r in pqm.pq_adc_topk(codes, books, probe, k=120, metric="ip").collect()
    }
    code_by_id = {r["vec_id"]: list(r["pq_code"]) for r in codes.collect()}
    p = np.array(probe)
    for vid, code in code_by_id.items():
        recon = np.array(pqm.pq_reconstruct(code, books))
        assert l2[vid] == pytest.approx(float(np.sum((p - recon) ** 2)), rel=1e-12)
        assert ip[vid] == pytest.approx(float(p @ recon), rel=1e-12)
        want_cos = float(
            p @ recon / (math.sqrt(p @ p) * math.sqrt(recon @ recon))
        )
        assert cos[vid] == pytest.approx(want_cos, rel=1e-12)


def test_pq_compression_recall_and_rerank(spark, pq_setup):
    df, vecs, books = pq_setup
    probe = [float(x) for x in vecs[3]]
    exact_ids = {r["vec_id"] for r in brute_force_topk(df, probe, k=10).collect()}
    # coarse ADC alone: approximate — measure, expect clustered data to
    # keep most of the neighborhood
    coarse = pqm.pq_adc_topk(pqm.pq_encode(df, books), books, probe, k=10)
    coarse_ids = {r["vec_id"] for r in coarse.collect()}
    r_coarse = len(coarse_ids & exact_ids) / len(exact_ids)
    # rerank re-scores 4x candidates exactly: recall must not drop
    rerank = pqm.pq_topk_rerank(df, books, probe, k=10, coarse_factor=4)
    rerank_ids = {r["vec_id"] for r in rerank.collect()}
    r_rerank = len(rerank_ids & exact_ids) / len(exact_ids)
    assert r_coarse >= 0.5
    assert r_rerank >= r_coarse
    assert r_rerank >= 0.7
    # rerank scores are EXACT cosines: spot-check against numpy
    p = np.array(probe)
    for r in rerank.collect():
        v = vecs[r["vec_id"]]
        want = float(p @ v / (np.linalg.norm(p) * np.linalg.norm(v)))
        assert r["cosine_sim"] == pytest.approx(want, rel=1e-9)


def test_pq_medoid_codebooks_and_plan_shape(spark, pq_setup):
    df, vecs, books_ = pq_setup
    books = pqm.medoid_pq_codebooks(df, [0, 5, 9], m=4)
    # codebook entries are exactly the medoid rows' slices
    for j in range(4):
        for c, mid in enumerate([0, 5, 9]):
            assert books[j][c] == pytest.approx(
                [float(x) for x in vecs[mid][j * 2 : (j + 1) * 2]]
            )
    codes = pqm.pq_encode(df, books)
    out = pqm.pq_adc_topk(codes, books, [float(x) for x in vecs[1]], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    # r13: the encode is ONE combined Arrow kernel (all m subspace codes
    # in a single node); scoring stays codegen — no row-pickle Python
    # anywhere, exactly one Arrow node, still no cartesian
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1
    assert "CartesianProduct" not in plan
    assert out.count() == 5


def test_pq_encode_arrow_matches_literal_fold(spark):
    """The combined Arrow encode kernel must be BIT-identical to the
    per-subspace JVM fold path, including the degenerate rows the fold
    resolves through NULL-d2 ordering (NULL vector, short vector, NaN)."""
    import random

    rnd = random.Random(11)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    rows += [
        (100, None),
        (101, []),
        (102, [0.5] * 3),            # shorter than one subspace
        (103, [0.5] * 6),            # covers subspace 0 only (m=2, dsub=4)
        (104, [float("nan")] * 8),   # NaN d2 in every subspace
        (105, [0.1] * 12),           # longer than m*dsub
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = [
        [[rnd.uniform(-1, 1) for _ in range(4)] for _ in range(5)]
        for _ in range(2)
    ]
    arrow = {
        r["vec_id"]: list(r["pq_code"])
        for r in pqm.pq_encode(df, books).collect()
    }
    # force the literal fold path by hiding the active session from the
    # dispatcher
    from unittest import mock

    with mock.patch(
        "pyspark.sql.SparkSession.getActiveSession", return_value=None
    ):
        lit_df = pqm.pq_encode(df, books)
    lit = {r["vec_id"]: list(r["pq_code"]) for r in lit_df.collect()}
    assert arrow == lit


def test_pq_adc_batch_matches_per_probe_bitwise(spark, pq_setup):
    """The batch op must return EXACTLY the per-probe op's (id, score)
    list — bit-equal scores, same tie-broken order — for every metric."""
    df, vecs, books = pq_setup
    codes = pqm.pq_encode(df, books).cache()
    codes.count()
    probes = {f"p{i}": [float(x) for x in vecs[i]] for i in (0, 3, 7, 50)}
    try:
        for metric, score_col in (
            ("l2", "adc_dist"), ("ip", "adc_ip"), ("cosine", "adc_cosine")
        ):
            batch = pqm.pq_adc_batch_topk(
                codes, books, probes, k=9, metric=metric
            ).collect()
            by_probe: dict[str, list] = {}
            for r in sorted(batch, key=lambda r: (r["probe_id"], r["rank"])):
                by_probe.setdefault(r["probe_id"], []).append(
                    (r["vec_id"], r[score_col])
                )
            for qid, p in probes.items():
                single = [
                    (r["vec_id"], r[score_col])
                    for r in pqm.pq_adc_topk(
                        codes, books, p, k=9, metric=metric
                    ).collect()
                ]
                assert by_probe[qid] == single, f"{metric}/{qid}"
    finally:
        codes.unpersist()


def test_pq_adc_batch_single_scan_plan(spark, pq_setup):
    """One codes scan + one broadcast regardless of probe count: the
    whole point of the batch dual (the per-probe op costs Q compiles +
    Q jobs). Also: no Python eval, no cartesian product."""
    df, vecs, books = pq_setup
    codes = pqm.pq_encode(df, books)
    probes = {i: [float(x) for x in vecs[i]] for i in range(20)}
    out = pqm.pq_adc_batch_topk(codes, books, probes, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # EXACTLY two leaf scans regardless of probe count: the codes corpus
    # (one scan feeds all 20 probes — the whole point of the batch dual)
    # and the broadcast LUT frame. A regression to per-probe subplans
    # (20+ scans) must fail here.
    n_scans = plan.count("ExistingRDD") + plan.count("LocalTableScan")
    assert n_scans == 2, f"expected 2 leaf scans, plan has {n_scans}"
    # r13: the encode upstream is one combined Arrow kernel; the batch
    # ADC scoring itself stays codegen (no per-probe Python, no pickle)
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") <= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    rows = out.collect()
    assert len(rows) == 20 * 5
    # each probe yields exactly ranks 1..5, scores non-increasing (NB: the
    # self vector need NOT be rank 1 — ADC scores RECONSTRUCTIONS, and
    # several vectors can share a code, ties breaking to the lowest id)
    by_probe: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["probe_id"], r["rank"])):
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert len(by_probe) == 20
    for qid, rs in by_probe.items():
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5], qid
        sims = [r["adc_cosine"] for r in rs]
        assert all(a >= b for a, b in zip(sims, sims[1:])), qid


def test_pq_batch_rerank_matches_per_probe(spark, pq_setup):
    df, vecs, books = pq_setup
    probes = {f"p{i}": [float(x) for x in vecs[i]] for i in (1, 4, 11)}
    batch = pqm.pq_batch_topk_rerank(
        df, books, probes, k=6, coarse_factor=4
    ).collect()
    by_probe: dict[str, list] = {}
    for r in sorted(batch, key=lambda r: (r["probe_id"], r["rank"])):
        by_probe.setdefault(r["probe_id"], []).append(
            (r["vec_id"], r["cosine_sim"])
        )
    for qid, p in probes.items():
        single = [
            (r["vec_id"], r["cosine_sim"])
            for r in pqm.pq_topk_rerank(
                df, books, p, k=6, coarse_factor=4
            ).collect()
        ]
        assert by_probe[qid] == single, qid


def test_pq_codebook_artifact_roundtrip(spark, pq_setup, tmp_path):
    """Persisted codebooks reload bit-exactly; a reloaded book produces
    identical codes and ADC scores (build-once / probe-later contract)."""
    df, vecs, books = pq_setup
    p = str(tmp_path / "books.json")
    pqm.save_pq_codebooks(books, p, metric_note="cosine")
    loaded = pqm.load_pq_codebooks(p)
    assert loaded == books  # repr round-trip: bit-exact floats
    probe = [float(x) for x in vecs[2]]
    a = pqm.pq_adc_topk(pqm.pq_encode(df, books), books, probe, k=7).collect()
    b = pqm.pq_adc_topk(pqm.pq_encode(df, loaded), loaded, probe, k=7).collect()
    assert [(r["vec_id"], r["adc_cosine"]) for r in a] == [
        (r["vec_id"], r["adc_cosine"]) for r in b
    ]
    import json

    with open(p) as f:
        blob = json.load(f)
    blob["format"] = "something-else"
    with open(p, "w") as f:
        json.dump(blob, f)
    with pytest.raises(ValueError, match="not a PQ codebook"):
        pqm.load_pq_codebooks(p)
