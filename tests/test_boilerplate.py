"""Cross-document boilerplate line removal: exact parity vs an independent
Python reference, threshold semantics, the broadcast guard, and the
narrow-removal plan shape."""

from __future__ import annotations

import contextlib
import io
import random

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators import boilerplate as bp

FOOTER = "(c) example corp - all rights reserved"
NAV = "home | products | about"


def _docs():
    rng = random.Random(11)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    docs = {}
    for i in range(20):
        group = "a" if i < 12 else "b"
        body = [
            " ".join(rng.choices(words, k=6)) for _ in range(rng.randint(2, 5))
        ]
        lines = []
        if group == "a":
            lines.append(NAV)                      # 12/12 docs of a
        lines += body
        if group == "a" and i % 2 == 0:
            lines.append("  " + FOOTER + "  ")     # 6/12 docs, padded
        if group == "b" and i == 15:
            lines.append(NAV)                      # 1/8 docs of b: NOT bp there
        lines.append("")                           # trailing empty line kept
        docs[i] = (group, "\n".join(lines))
    docs[20] = ("a", "")                           # empty doc
    docs[21] = (None, NAV + "\nunique line\n" + NAV)  # NULL group, repeated line
    docs[22] = (None, NAV)                         # NULL group: NAV in 2/2 docs
    return docs


@pytest.fixture(scope="module")
def docs_df(spark):
    d = _docs()
    return spark.createDataFrame(
        [(i, g, t) for i, (g, t) in d.items()], "doc_id long, source string, text string"
    ).cache()


def test_removal_matches_python_reference(spark, docs_df):
    d = _docs()
    want = bp.reference_remove_boilerplate(d, min_docs=2, min_doc_frac=0.5)
    got = {
        r["doc_id"]: r["text"]
        for r in bp.remove_boilerplate_lines(
            docs_df, "text", "source", min_docs=2, min_doc_frac=0.5
        ).collect()
    }
    assert got == want
    # semantics spot-checks: NAV gone from every group-a doc, kept in b's
    assert all(NAV not in got[i] for i in range(12))
    assert NAV in got[15]
    # the footer sits at 6/13 of group a (doc 20 is an empty a-doc) —
    # UNDER the 0.5 frac, so it survives; at 6/13 threshold it goes
    assert all(FOOTER in got[i] for i in range(0, 12, 2))
    lowered = {
        r["doc_id"]: r["text"]
        for r in bp.remove_boilerplate_lines(
            docs_df, "text", "source", min_docs=2, min_doc_frac=6 / 13
        ).collect()
    }
    assert all(FOOTER not in lowered[i] for i in range(0, 12, 2))
    # NULL group is a real group: NAV appears in 2/2 NULL-group docs
    assert NAV not in got[21] and "unique line" in got[21]


def test_stats_counts_and_flags(spark, docs_df):
    stats = bp.boilerplate_line_stats(
        docs_df, "text", "source", min_docs=2, min_doc_frac=0.5
    )
    rows = {
        (r["group"], r["line_hash"]): r
        for r in stats.collect()
    }
    import hashlib

    nav_h = hashlib.md5(NAV.encode()).hexdigest()
    a_nav = rows[("a", nav_h)]
    assert a_nav["n_docs"] == 12 and a_nav["is_boilerplate"]
    b_nav = rows[("b", nav_h)]
    assert b_nav["n_docs"] == 1 and not b_nav["is_boilerplate"]
    # a doc repeating a line internally counts ONCE toward n_docs
    null_nav = rows[(None, nav_h)]
    assert null_nav["n_docs"] == 2 and null_nav["is_boilerplate"]


def test_out_col_and_passthrough(spark, docs_df):
    out = bp.remove_boilerplate_lines(
        docs_df, "text", "source", out_col="clean"
    )
    assert set(out.columns) == {"doc_id", "source", "text", "clean"}
    r = {x["doc_id"]: x for x in out.collect()}
    assert NAV in r[0]["text"] and NAV not in r[0]["clean"]


def test_broadcast_guard_fires_on_loose_thresholds(spark, docs_df):
    with pytest.raises(ValueError, match="max_lines_per_group"):
        bp.remove_boilerplate_lines(
            docs_df, "text", "source",
            min_docs=1, min_doc_frac=0.0, max_lines_per_group=3,
        )


def test_removal_plan_is_broadcast_plus_narrow_filter(spark, docs_df):
    out = bp.remove_boilerplate_lines(docs_df, "text", "source")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the doc side never shuffles: the only Exchanges feed the (tiny)
    # stats/bp aggregates, all of which sit under the broadcast side
    doc_side = plan.split("BroadcastHashJoin", 1)[0]
    assert "Exchange" not in doc_side.rsplit("Scan", 1)[-1]


def test_remove_boilerplate_group_named_group(spark):
    """A caller whose grouping column is literally named 'group' must get
    it back — the join cleanup may only drop the internal alias."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.boilerplate import (
        remove_boilerplate_lines,
    )

    rows = [
        (1, "g1", "keep me\nSHARED FOOTER"),
        (2, "g1", "other text\nSHARED FOOTER"),
        (3, "g2", "solo doc no footer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, group string, text string")
    out = remove_boilerplate_lines(df, "text", "group")
    assert "group" in out.columns
    got = {r["doc_id"]: (r["group"], r["text"]) for r in out.collect()}
    assert got[1] == ("g1", "keep me")
    assert got[2] == ("g1", "other text")
    assert got[3] == ("g2", "solo doc no footer")
