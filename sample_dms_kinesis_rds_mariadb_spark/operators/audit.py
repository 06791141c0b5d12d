"""One-pass audited filter chains: quality-gate funnels with row accounting.

A curation pipeline wants to report "N in → N after language gate → N after
quality gate → N after length gate" for every run. The naive way costs one
``count()`` job per gate — at 100 TB that is G extra scans of the corpus
(or a persist large enough to hold it). ``audited_filter`` instead attaches
ONE ``observe`` (Spark's CollectMetrics) carrying a funnel counter per gate
to the same scan that applies the filters: the metrics ride the action that
materializes the output (the write/collect the pipeline runs anyway), so
the audit is free — zero extra jobs, zero extra scans, executor-side
accumulation only.

Gate conditions are evaluated CUMULATIVELY (a row must pass every earlier
gate to be counted at a later one), so the report reads as a funnel and the
ordering of dict entries is the ordering of the gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def audited_filter(
    df: DataFrame,
    gates: dict[str, Column],
) -> tuple[DataFrame, Observation]:
    """Apply ``gates`` (name → keep-condition, in order) as one filter and
    return ``(filtered_df, observation)``.

    After the first action on ``filtered_df`` (or a frame built on it),
    ``observation.get`` holds ``{"input_rows": N, "after_<gate>": N, ...}``
    — the funnel counts from that action's single scan. NULL conditions
    count as failed (SQL filter semantics).

    The counts reflect the rows THAT ACTION processed, and Observation
    captures the FIRST action permanently — so materialize fully (the
    pipeline's write/collect/count) before reading the funnel. A
    short-circuiting first action (``first()``/``take(n)``/``limit``)
    stops after enough partitions satisfy the limit and would freeze
    partial counts.
    """
    # count(when(...)) not sum(when(...).otherwise(0)): sum is NULL over
    # zero rows, and an empty input must report a 0-funnel, not crash the
    # report (inside _funnel_aggs, shared with the streaming dual).
    # Unnamed Observation: the name must be unique per plan, and pipelines
    # legitimately compose several funnels into one action (a fixed name
    # throws DUPLICATED_METRICS_NAME at analysis time).
    obs = Observation()
    aggs, acc = _funnel_aggs(gates)
    return df.observe(obs, *aggs).filter(acc), obs


def funnel_report(observation: Observation) -> list[tuple[str, int]]:
    """The observation's metrics as ordered (stage, rows) pairs — input
    first, then each gate in declaration order."""
    got = observation.get
    return [(k, int(v)) for k, v in got.items()]


def _funnel_aggs(gates: dict[str, Column]) -> tuple[list[Column], Column]:
    if not gates:
        raise ValueError("gates must contain at least one condition")
    aggs = [F.count(F.lit(1)).alias("input_rows")]
    acc: Column | None = None
    for name, cond in gates.items():
        acc = cond if acc is None else (acc & cond)
        aggs.append(F.count(F.when(acc, 1)).alias(f"after_{name}"))
    assert acc is not None
    return aggs, acc


def observed_gates(
    df: DataFrame,
    gates: dict[str, Column],
    name: str = "gates",
) -> DataFrame:
    """The STREAMING dual of :func:`audited_filter`: same cumulative funnel
    counters, attached via a *named* observe — the form Structured
    Streaming supports. Each micro-batch's funnel arrives in that trigger's
    progress event (``query.lastProgress["observedMetrics"][name]``; read
    it with :func:`streaming_funnel`), so a long-running CDC or curation
    stream reports per-trigger drop rates with zero extra work per batch.
    Works on batch frames too (metrics then surface through a
    QueryExecutionListener rather than a return value — for batch, prefer
    ``audited_filter``)."""
    aggs, acc = _funnel_aggs(gates)
    return df.observe(name, *aggs).filter(acc)


def streaming_funnel(query, name: str = "gates") -> dict[str, int] | None:
    """The funnel of the LAST completed trigger of ``query`` (a
    StreamingQuery whose frame passed through :func:`observed_gates`), or
    None before the first trigger with data."""
    progress = query.lastProgress
    if not progress:
        return None
    metrics = progress.get("observedMetrics", {}).get(name)
    if metrics is None:
        return None
    if hasattr(metrics, "asDict"):  # Row in some API versions, dict in others
        metrics = metrics.asDict()
    return {k: int(v) for k, v in metrics.items()}
