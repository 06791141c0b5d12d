"""Incremental semantic deduplication, end to end (the r13 surface):

  embedding batches arriving over time
    → SemanticDedupIndex.build   (fixed centroids, vectors parquet-
                                  partitioned by IVF list)
    → dedup_batch per arrival    (pruned store probe + in-batch
                                  lowest-id + append — arrival-order
                                  precedence, crash-replay idempotent)
    → survivors                  (identical to the one-shot
                                  semantic_dedup when batches arrive
                                  in id order — oracle-gated as the
                                  `semantic_dedup_incremental` entry)

At 100 TB the operating rule is the one SemDeDup itself documents:
n_lists grows with the corpus so per-list occupancy stays bounded —
the r13 scaling harness (tools/scaling_harness.py, SCALE.md) measures
the wall-clock staying linear per 10x rows under that rule.

Run:  cd /root/repo && python examples/semantic_streaming_dedup.py
"""

from __future__ import annotations

import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from sample_dms_kinesis_rds_mariadb_spark import get_session  # noqa: E402
from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import (  # noqa: E402
    SemanticDedupIndex,
    medoid_centroids,
)
from sample_dms_kinesis_rds_mariadb_spark.plans.queries import (  # noqa: E402
    load_table,
)


def main() -> None:
    spark = get_session(cpus=8, shuffle_partitions=8)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    emb = load_table(spark, sf_dir, "embeddings")

    # fixed seed-medoid centroids: reproducible across engines and runs
    cents = medoid_centroids(emb, [3, 17, 29, 43, 59, 71, 89, 101])
    path = os.path.join(tempfile.mkdtemp(prefix="sem-idx-"), "store")
    idx = SemanticDedupIndex.build(
        emb.limit(0), path, threshold=0.4, centroids=cents
    )

    cut = emb.agg(F.max("vec_id")).collect()[0][0] // 2
    batches = [
        ("day-1", emb.filter(F.col("vec_id") <= cut)),
        ("day-2", emb.filter(F.col("vec_id") > cut)),
        ("day-2 replayed", emb.filter(F.col("vec_id") > cut)),
    ]
    for name, batch in batches:
        survivors = idx.dedup_batch(batch)
        n_in = batch.count()
        n_out = survivors.count()
        print(f"{name}: {n_in} arrived, {n_out} kept, "
              f"{n_in - n_out} semantic near-dups dropped")

    probe = idx.probe(emb.filter(F.col("vec_id") < 50))
    print(f"store probe over the first 50 ids: "
          f"{probe.count()} (new, stored) pairs over the 0.4 cosine cut")
    spark.stop()


if __name__ == "__main__":
    main()
