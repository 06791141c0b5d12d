"""Link-graph analytics for crawl curation — PageRank as a DataFrame
power iteration.

Domain/page authority is a standard crawl-quality signal (the original
use of the algorithm; modern pipelines still use harmonic/PageRank-style
centrality to pick seed lists and weight sampling). The input edge list
comes straight from the engine's own crawl front door:
``sources/warc.py`` → ``functions/html.py::html_links`` →
``functions/url.py::url_registered_domain`` gives (src_domain,
dst_domain) edges at scan speed.

Scale discipline (same as ``operators/dedup.py::connected_components``):
every iteration is ONE Spark job — the rank update, the L1 convergence
delta, and the NEXT round's dangling mass all ride a single ``observe()``
on the frame the round materializes; lineage is cut with
``localCheckpoint`` per round so plans don't grow; the per-round shuffle
joins are keyed on node ids only (ranks and degrees — never payloads).
Synchronized-update semantics with uniform dangling-mass redistribution,
so ``sum(rank) == 1`` is an exact invariant every round (asserted in
tests against an independent numpy power iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_deg) over all nodes (0 for sink/dangling nodes)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    degs = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    return nodes.join(degs, "node", "left").na.fill({"out_deg": 0})


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iterations: int = 40,
    tol: float = 1e-6,
) -> DataFrame:
    """PageRank over a directed edge list → ``(node, rank)``, ranks
    summing to 1. Parallel edges count with their multiplicity
    (pre-``distinct()`` the edges for simple-graph semantics); dangling
    nodes redistribute their mass uniformly (the standard convention).
    Stops when the L1 rank change drops below ``tol`` or after
    ``max_iterations`` synchronized rounds, whichever is first."""
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .dropna()  # a NULL endpoint is no edge (joins would drop it
        # asymmetrically otherwise, leaking a phantom node row)
        .localCheckpoint(eager=True)
    )
    deg = out_degrees(e).localCheckpoint(eager=True)
    n = deg.count()
    if n == 0:
        return deg.select("node", F.lit(0.0).alias("rank"))

    # ranks carry out_deg so each round needs no extra degree join;
    # the first dangling mass comes from the init frame's own observe
    obs0 = Observation()
    ranks = (
        deg.select(
            "node", "out_deg", F.lit(1.0 / n).alias("rank")
        )
        .observe(
            obs0,
            F.sum(
                F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(0.0)
            ).alias("dangling"),
        )
        .localCheckpoint(eager=True)
    )
    dangling = float(obs0.get["dangling"] or 0.0)

    for _ in range(max_iterations):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        obs = Observation()
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            ranks.join(contribs, "node", "left")
            .select(
                "node",
                "out_deg",
                F.col("rank").alias("_old"),
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .observe(
                obs,
                F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("delta"),
                F.sum(
                    F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(0.0)
                ).alias("dangling"),
            )
            .select("node", "out_deg", "rank")
            .localCheckpoint(eager=True)
        )
        ranks = new_ranks
        metrics = obs.get
        dangling = float(metrics["dangling"] or 0.0)
        if float(metrics["delta"]) < tol:
            break
    return ranks.select("node", "rank")
