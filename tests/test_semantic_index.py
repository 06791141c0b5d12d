"""SemanticDedupIndex — the embedding member of the incremental
index-store family: family-equivalence with the one-shot batch façade,
crash-replay idempotence, arrival-order precedence, pruned store
scans, and compact invariance."""

from __future__ import annotations

import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import (
    SemanticDedupIndex,
    semantic_dedup,
)

CENTROIDS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


ROWS = [
    (1, [1.0, 0.01, 0.0, 0.0]),      # list 0
    (2, [2.0, 0.02, 0.0, 0.0]),      # exact direction dup of 1
    (3, [0.02, 1.0, 0.0, 0.0]),      # list 1
    (4, [0.0, 0.5, 0.5, 0.5]),       # list 1, distinct
    (5, [1.0, 0.3, 0.3, 0.0]),       # list 0, distinct
    (6, [0.04, 2.0, 0.0, 0.0]),      # direction dup of 3
]


def test_family_equivalence_with_batch_facade(spark, tmp_path):
    """Batches arriving in id order reproduce the one-shot façade's
    lowest-id survivors."""
    df = _vecs(spark, ROWS)
    want = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            df, threshold=0.95, centroids=CENTROIDS
        ).collect()
    )
    idx = SemanticDedupIndex.build(
        _vecs(spark, []), str(tmp_path / "sem"), threshold=0.95,
        centroids=CENTROIDS,
    )
    got = []
    for lo, hi in ((0, 3), (3, 6)):
        out = idx.dedup_batch(_vecs(spark, ROWS[lo:hi]))
        got += [r["vec_id"] for r in out.collect()]
    assert sorted(got) == want == [1, 3, 4, 5]


def test_replay_idempotence_and_arrival_precedence(spark, tmp_path):
    idx = SemanticDedupIndex.build(
        _vecs(spark, ROWS[:2]), str(tmp_path / "sem"), threshold=0.95,
        centroids=CENTROIDS,
    )
    # id 0 arrives AFTER its dup id 1 is stored: arrival order wins,
    # the lower id loses
    late = _vecs(spark, [(0, [3.0, 0.03, 0.0, 0.0]), (4, ROWS[3][1])])
    out1 = sorted(r["vec_id"] for r in idx.dedup_batch(late).collect())
    assert out1 == [4]
    # crash replay: the same batch re-deduped reproduces the verdicts
    # (same-batch stored ids are excluded from the store probe)
    out2 = sorted(r["vec_id"] for r in idx.dedup_batch(late).collect())
    assert out2 == out1


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    idx = SemanticDedupIndex.build(
        _vecs(spark, ROWS), str(tmp_path / "sem"), threshold=0.95,
        centroids=CENTROIDS,
    )
    # a batch touching ONLY list 0
    batch = _vecs(spark, [(99, [5.0, 0.0, 0.0, 0.0])])
    probe = idx.probe(batch)
    assert [r["stored_id"] for r in probe.collect()] in ([1, 2], [2, 1])
    assigned = idx._assigned(batch).localCheckpoint(eager=True)
    plan = idx._probe_assigned(assigned)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ivf_list" in plan and "PartitionFilters" in plan


def test_compact_invariance_and_load(spark, tmp_path):
    path = str(tmp_path / "sem")
    idx = SemanticDedupIndex.build(
        _vecs(spark, ROWS[:2]), path, threshold=0.95, centroids=CENTROIDS,
    )
    for k in range(3):
        idx.append(_vecs(spark, [(10 + k, [0.01 * k, 1.0, 0.0, 0.0])]))
    probe_df = _vecs(spark, [(99, [0.0, 1.0, 0.0, 0.0])])
    before = sorted(r["stored_id"] for r in idx.probe(probe_df).collect())
    removed = idx.compact(min_files=2)
    assert removed > 0
    assert SemanticDedupIndex.exists(path)
    re = SemanticDedupIndex.load(spark, path)
    assert re.threshold == 0.95 and re.centroids == CENTROIDS
    after = sorted(r["stored_id"] for r in re.probe(probe_df).collect())
    assert after == before == [10, 11, 12]


def test_auto_compact_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="auto_compact_files"):
        SemanticDedupIndex(
            spark, str(tmp_path / "x"), CENTROIDS, 0.9,
            auto_compact_files=4,
        )


def test_build_fits_centroids_when_not_given(spark, tmp_path):
    df = _vecs(spark, ROWS)
    idx = SemanticDedupIndex.build(
        df, str(tmp_path / "sem"), threshold=0.95, n_lists=2,
    )
    assert len(idx.centroids) == 2
    # a self-probe of the seeded corpus finds the planted dup pairs
    pairs = {(r["new_id"], r["stored_id"])
             for r in idx.probe(df).collect()}
    assert (1, 2) in pairs and (2, 1) in pairs
    assert (3, 6) in pairs and (6, 3) in pairs


def test_streaming_duality_foreachbatch(spark, tmp_path):
    """The index as a readStream foreachBatch stage (the family's
    streaming-duality check): per-trigger dedup_batch over a file
    stream reproduces the arrival-order verdicts."""
    import json
    import os

    src = tmp_path / "src"
    src.mkdir()
    for name, lo, hi in (("a.json", 0, 3), ("b.json", 3, 6)):
        with open(src / name, "w") as f:
            for i, v in ROWS[lo:hi]:
                f.write(json.dumps({"vec_id": i, "embedding": v}) + "\n")
    idx = SemanticDedupIndex.build(
        _vecs(spark, []), str(tmp_path / "sem"), threshold=0.95,
        centroids=CENTROIDS,
    )
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )

    def _sink(batch, batch_id):
        (idx.dedup_batch(batch)
            .write.mode("append").json(out_dir))

    q = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", str(tmp_path / "ck")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = sorted(
        r["vec_id"] for r in spark.read.schema(
            "vec_id long, embedding array<double>"
        ).json(out_dir).collect()
    )
    assert got == [1, 3, 4, 5]
