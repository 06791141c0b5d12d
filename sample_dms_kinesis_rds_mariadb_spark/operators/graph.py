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
    seeds: DataFrame | None = None,
) -> DataFrame:
    """PageRank over a directed edge list → ``(node, rank)``, ranks
    summing to 1. Parallel edges count with their multiplicity
    (pre-``distinct()`` the edges for simple-graph semantics); dangling
    nodes redistribute their mass to the teleport distribution. Stops
    when the L1 rank change drops below ``tol`` or after
    ``max_iterations`` synchronized rounds, whichever is first.

    ``seeds`` (a one-column DataFrame of node ids) switches to
    PERSONALIZED PageRank — the teleport (and dangling) mass lands
    uniformly on the seed set instead of all nodes, the standard
    seed-expansion move for crawl curation ("rank relative to trusted
    domains"). Seeds absent from the graph are ignored; an empty
    effective seed set raises."""
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

    # teleport weight per node: uniform 1/n, or 1/|seeds∩graph| on the
    # seed set for personalized ranking (0 elsewhere)
    if seeds is not None:
        seed_col = seeds.columns[0]
        sset = seeds.select(F.col(seed_col).alias("node")).distinct()
        deg = deg.join(
            sset.withColumn("_is_seed", F.lit(True)), "node", "left"
        )
        n_seeds = deg.where(F.col("_is_seed")).count()
        if n_seeds == 0:
            raise ValueError("no seed appears in the graph")
        deg = deg.select(
            "node",
            "out_deg",
            F.when(F.col("_is_seed"), 1.0 / n_seeds)
            .otherwise(0.0)
            .alias("teleport"),
        ).localCheckpoint(eager=True)
    else:
        deg = deg.select(
            "node", "out_deg", F.lit(1.0 / n).alias("teleport")
        )

    # ranks carry out_deg so each round needs no extra degree join;
    # the first dangling mass comes from the init frame's own observe
    obs0 = Observation()
    ranks = (
        deg.select(
            "node", "out_deg", "teleport", F.col("teleport").alias("rank")
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
        # teleport + dangling mass both follow the teleport distribution
        scale = (1.0 - damping) + damping * dangling
        new_ranks = (
            ranks.join(contribs, "node", "left")
            .select(
                "node",
                "out_deg",
                "teleport",
                F.col("rank").alias("_old"),
                (
                    F.lit(scale) * F.col("teleport")
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
            .select("node", "out_deg", "teleport", "rank")
            .localCheckpoint(eager=True)
        )
        ranks = new_ranks
        metrics = obs.get
        dangling = float(metrics["dangling"] or 0.0)
        if float(metrics["delta"]) < tol:
            break
    return ranks.select("node", "rank")
