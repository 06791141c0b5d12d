"""PageRank (operators/graph.py) vs an independent numpy power
iteration, plus html_links extraction parity and the crawl link-graph
pipeline: HTML → links → registered domains → PageRank."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.html import (
    html_links,
    py_html_links,
)
from sample_dms_kinesis_rds_mariadb_spark.functions.url import (
    url_registered_domain,
)
from sample_dms_kinesis_rds_mariadb_spark.operators.graph import (
    out_degrees,
    pagerank,
)


def _numpy_pagerank(edges, damping=0.85, iters=100):
    """Independent dense power iteration with the same conventions:
    synchronized updates, uniform dangling redistribution."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {u: r[idx[u]] for u in nodes}


def _random_edges(rng, n_nodes=30, n_edges=120):
    return list(
        {
            (int(rng.integers(0, n_nodes)), int(rng.integers(0, n_nodes)))
            for _ in range(n_edges)
        }
    )


def test_pagerank_matches_numpy_power_iteration(spark):
    rng = np.random.default_rng(7)
    edges = _random_edges(rng)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, tol=0.0, max_iterations=60).collect()}
    want = _numpy_pagerank(edges, iters=60)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation


def test_pagerank_dangling_and_known_answer(spark):
    # 1 -> 2 -> 3 (3 dangling): known stationary shape — rank grows
    # along the chain; totals stay 1
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, tol=1e-12, max_iterations=200).collect()}
    want = _numpy_pagerank([(1, 2), (2, 3)], iters=200)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
    assert got[3] > got[2] > got[1]
    # parallel edges count with multiplicity
    multi = spark.createDataFrame([(1, 2), (1, 2), (1, 3)], "src long, dst long")
    got2 = {r["node"]: r["rank"] for r in pagerank(multi, tol=1e-12, max_iterations=100).collect()}
    want2 = _numpy_pagerank([(1, 2), (1, 2), (1, 3)], iters=100)
    for k in want2:
        assert abs(got2[k] - want2[k]) < 1e-9
    assert got2[2] > got2[3]


def test_pagerank_early_stop_and_validation(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, tol=1e-10).collect()}
    assert abs(got[1] - 0.5) < 1e-6 and abs(got[2] - 0.5) < 1e-6
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
    degs = {r["node"]: r["out_deg"] for r in out_degrees(
        spark.createDataFrame([(1, 2)], "src long, dst long")).collect()}
    assert degs == {1: 1, 2: 0}


def test_html_links_parity_and_pipeline(spark):
    docs = [
        '<a href="https://a.example.com/x">x</a> text '
        "<a class='k' href='http://b.example.org/y?q=1'>y</a>"
        '<A HREF="HTTPS://A.EXAMPLE.COM/z#frag">z</A>'
        "<a name=anchor>no href</a>",
        "<p>no links at all</p>",
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i long, html string"
    )
    got = {
        r["i"]: list(r["links"])
        for r in df.select("i", html_links(F.col("html")).alias("links")).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == py_html_links(d), i
    assert len(got[0]) == 3 and got[1] == []
    # pipeline: links -> registered domains -> edges -> pagerank
    links = df.select(
        F.lit("seed.example.net").alias("src"),
        F.explode(html_links(F.col("html"))).alias("href"),
    ).select("src", url_registered_domain(F.col("href")).alias("dst"))
    ranks = pagerank(links, tol=1e-10)
    vals = {r["node"]: r["rank"] for r in ranks.collect()}
    assert "example.com" in vals and "example.org" in vals
    assert vals["example.com"] > vals["example.org"]  # 2 in-links vs 1


def _numpy_ppr(edges, seeds, damping=0.85, iters=100):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    t = np.zeros(n)
    sset = [s for s in seeds if s in idx]
    for s in sset:
        t[idx[s]] = 1.0 / len(sset)
    r = t.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        dangling = r[out == 0].sum()
        r = ((1 - damping) + damping * dangling) * t + damping * contrib
    return {u: r[idx[u]] for u in nodes}


def test_personalized_pagerank_matches_numpy(spark):
    rng = np.random.default_rng(17)
    edges = _random_edges(rng, n_nodes=25, n_edges=90)
    seeds = [0, 1, 2, 99]  # 99 not in the graph: ignored
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, seeds=sdf, tol=0.0, max_iterations=60).collect()
    }
    want = _numpy_ppr(edges, seeds, iters=60)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # seeds concentrate mass: a seed outranks the global-uniform case
    # for at least the seed set on average
    base = {r["node"]: r["rank"] for r in pagerank(df, tol=0.0, max_iterations=60).collect()}
    in_graph = [s for s in seeds if s in got]
    assert sum(got[s] for s in in_graph) > sum(base[s] for s in in_graph)
    with pytest.raises(ValueError, match="no seed"):
        pagerank(df, seeds=spark.createDataFrame([(777,)], "node long"))
