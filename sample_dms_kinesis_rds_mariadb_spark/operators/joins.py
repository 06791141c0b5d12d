"""As-of and range (interval) joins — temporal join operators Spark lacks
natively, built Spark-first.

The reference engine's observable surface is time-ordered event streams
(reference run.py:175-188 consumes records in arrival order); as-of and
interval joins are the standard analytical companions over such streams
(enrich each event with the latest preceding state; bucket events into
incident/promotion windows). Spark has no ASOF JOIN or interval-join
operator, so these implement the semantics as compositions of built-in
DataFrame ops — never a BroadcastNestedLoopJoin, never a driver-side loop:

- ``asof_join``: union-tag + per-key window carry-forward. ONE hash shuffle
  on the key and one per-key sort; cost is O((|probe|+|build|) log) with no
  join explosion — the plan you want on 1000 executors. (The classic
  union-merge formulation of merge-as-of; e.g. pandas merge_asof semantics.)
- ``range_join``: time-bucketed equi-join. Intervals explode to the buckets
  they cover, probe rows map to exactly ONE bucket, the equi-join on
  bucket_id bounds candidate pairs to per-bucket occupancy, and the exact
  containment predicate refines — the standard binned interval-join strategy
  (what Databricks' range-join hint does under the hood), replacing the
  O(|probe|·|intervals|) nested-loop Catalyst would otherwise pick for a
  pure inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASOF_STRUCT = "asof"


def _epoch_us(col):
    """Microseconds-since-epoch for TIMESTAMP or TIMESTAMP_NTZ columns.

    ``unix_micros`` rejects NTZ; the cast to (LTZ) timestamp interprets NTZ
    in the session timezone, which cancels out everywhere this is used —
    tolerance checks compare *differences* and bucket ids only need a
    consistent linear mapping, not a particular epoch."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    build_ts: str | None = None,
    tolerance_seconds: float | None = None,
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (pandas ``merge_asof`` semantics, distributed): for each
    probe row attach one build row from the same key group —

    - ``backward`` (default): greatest ``build_ts`` <= probe ``ts``;
    - ``forward``: smallest ``build_ts`` >= probe ``ts``;
    - ``nearest``: whichever of the two is closer in time (exact tie →
      backward, matching pandas).

    Returns every probe row (left semantics) with one extra struct column
    ``asof`` holding ALL non-key build columns (including the matched build
    timestamp); NULL when no build row qualifies or the match is farther
    than ``tolerance_seconds``.

    Ties (several build rows sharing a (key, ts)): the row with the greatest
    ``tie_break`` value wins when given; otherwise which of the tied rows
    wins is unspecified — pre-aggregate the build side to unique (key, ts)
    when exact determinism matters.

    Plan shape: union the two sides tagged build/probe, ONE hash shuffle on
    the key and one per-key sort; the match is a windowed
    ``last``/``first(ignorenulls)`` carry — zero join operators, no
    explosion regardless of time-range overlap. ``nearest`` evaluates both
    frame directions over the SAME sort, so it still costs one shuffle +
    one sort. Skew is bounded by per-key row counts (see
    :func:`asof_join_epoched` for hot keys).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    bts = build_ts or ts
    build_cols = [c for c in build.columns if c not in keys]
    probe_cols = [c for c in probe.columns if c not in keys]

    payload = F.struct(
        F.col(bts).alias(f"{bts}"),
        *[F.col(c) for c in build_cols if c != bts],
    )
    tie = (
        F.col(tie_break)
        if tie_break is not None
        else F.lit(0)
    )
    # side ordering: backward/nearest sort build(0) before probe(1) at equal
    # ts (inclusive <=); forward sorts probe(0) before build(1) (inclusive >=)
    build_side = 1 if direction == "forward" else 0
    b = build.select(
        *keys,
        F.col(bts).alias("_asof_ts"),
        F.lit(build_side).alias("_asof_side"),
        tie.alias("_asof_tie"),
        payload.alias("_asof_payload"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
    )
    p = probe.select(
        *keys,
        F.col(ts).alias("_asof_ts"),
        F.lit(1 - build_side).alias("_asof_side"),
        F.lit(0).alias("_asof_tie"),
        F.lit(None).cast(b.schema["_asof_payload"].dataType).alias("_asof_payload"),
        *probe_cols,
    )
    # forward picks the FIRST qualifying build row, so the greatest tie must
    # sort first among equal-ts builds; backward picks the LAST, so ascending
    tie_order = (
        F.desc("_asof_tie") if direction == "forward" else F.asc("_asof_tie")
    )
    base = Window.partitionBy(*keys).orderBy("_asof_ts", "_asof_side", tie_order)
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    horizon = (
        F.lit(int(tolerance_seconds * 1_000_000))
        if tolerance_seconds is not None
        else None
    )
    probe_us = _epoch_us(F.col("_asof_ts"))

    def _bounded(carried, sign):
        if horizon is None:
            return carried
        return F.when(sign * (probe_us - _epoch_us(carried[bts])) <= horizon, carried)

    if direction == "backward":
        carried = _bounded(F.last("_asof_payload", ignorenulls=True).over(w_back), 1)
    elif direction == "forward":
        carried = _bounded(F.first("_asof_payload", ignorenulls=True).over(w_fwd), -1)
    else:  # nearest: backward layout; equal-ts builds belong to the backward
        # arm (distance 0, unbeatable), strictly-later builds to the forward
        # arm. Both frames share one (partition, order) → one shuffle + sort.
        # The sort's tie order is ascending (backward layout), so the forward
        # pick can't rely on frame order for ties: max_by over (-us, tie)
        # selects the smallest build ts and, among equal-ts builds, the
        # GREATEST tie_break — matching the documented tie rule.
        back = _bounded(F.last("_asof_payload", ignorenulls=True).over(w_back), 1)
        fwd = _bounded(
            F.max_by(
                "_asof_payload",
                F.when(
                    F.col("_asof_payload").isNotNull(),
                    F.struct(
                        (-probe_us).alias("neg_us"),
                        F.col("_asof_tie").alias("tie"),
                    ),
                ),
            ).over(w_fwd),
            -1,
        )
        d_back = probe_us - _epoch_us(back[bts])
        d_fwd = _epoch_us(fwd[bts]) - probe_us
        carried = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_fwd < d_back, fwd)  # tie (==) falls through to backward
            .otherwise(back)
        )
    return (
        b.unionByName(p)
        .withColumn(ASOF_STRUCT, carried)
        .filter(F.col("_asof_side") == F.lit(1 - build_side))
        .select(*keys, *probe_cols, ASOF_STRUCT)
    )


def asof_join_broadcast(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    build_ts: str | None = None,
    tolerance_seconds: float | None = None,
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join with ZERO shuffle of the probe side — for the dominant
    production shape: a huge event stream enriched against a SMALL dimension
    history (prices, configs, SCD2 snapshots). Semantics are identical to
    :func:`asof_join` (same directions, tolerance, greatest-``tie_break``
    rule; row-equality tested on randomized data).

    :func:`asof_join`'s union+window formulation is the right generalization
    — but it hash-shuffles BOTH sides on the key. When the build side is
    broadcast-sized, that means shuffling 100 TB of probe rows to enrich
    against megabytes of history. Here instead:

    1. the build side collapses to one row per key holding its SORTED
       history as an array of (ts, tie, payload) structs — one aggregation
       over the small side only (``sort_array`` of ``collect_list``);
    2. that per-key history joins the probe via **broadcast hash join** —
       the probe stays exactly where it was scanned, no exchange, no sort;
    3. the match is selected in ARRAY SPACE per probe row: ``filter`` to
       the qualifying side of the timestamp, then last element (backward:
       sort order already puts greatest ts, then greatest tie, last) or
       ``array_max`` over ``(-ts, tie)`` (forward: smallest ts, greatest
       tie) — O(history length) per row, all codegen.

    Use when per-key history fits comfortably in a row and the whole build
    side fits a broadcast (the dimension-table contract); stick with
    :func:`asof_join` / :func:`asof_join_epoched` when the build side is
    itself corpus-sized.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    bts = build_ts or ts
    build_cols = [c for c in build.columns if c not in keys]
    probe_cols = [c for c in probe.columns if c not in keys]

    payload = F.struct(
        F.col(bts).alias(f"{bts}"),
        *[F.col(c) for c in build_cols if c != bts],
    )
    tie = F.col(tie_break) if tie_break is not None else F.lit(0)
    hist = (
        build.select(
            *keys,
            F.struct(
                _epoch_us(F.col(bts)).alias("us"),
                tie.alias("tie"),
                payload.alias("payload"),
            ).alias("_h"),
        )
        .groupBy(*keys)
        # sort_array orders structs lexicographically: (us asc, tie asc) —
        # so the LAST qualifying element is greatest-ts/greatest-tie
        .agg(F.sort_array(F.collect_list("_h")).alias("_hist"))
    )
    # null-safe key equality (<=>): asof_join's Window.partitionBy groups
    # NULL keys together, so NULL-keyed probe rows must match NULL-keyed
    # build history here too — a plain equi-join would silently drop them.
    # EqualNullSafe is still an equi-join key, so the plan stays a
    # BroadcastHashJoin.
    bhist = F.broadcast(hist)
    cond = None
    for k in keys:
        eq = probe[k].eqNullSafe(hist[k])
        cond = eq if cond is None else cond & eq
    joined = probe.join(bhist, cond, "left")
    for k in keys:
        joined = joined.drop(hist[k])
    probe_us = _epoch_us(F.col(ts))
    horizon = (
        F.lit(int(tolerance_seconds * 1_000_000))
        if tolerance_seconds is not None
        else None
    )

    def _back():
        cands = F.filter(F.col("_hist"), lambda h: h["us"] <= probe_us)
        # try_element_at: an empty candidate list must yield NULL, not an
        # ANSI out-of-bounds error (Spark 4 defaults ANSI on)
        m = F.try_element_at(cands, F.lit(-1))
        if horizon is not None:
            m = F.when(probe_us - m["us"] <= horizon, m)
        return m

    def _fwd():
        cands = F.filter(F.col("_hist"), lambda h: h["us"] >= probe_us)
        # smallest ts wins; among equal ts the GREATEST tie — array_max over
        # (-us, tie, payload) struct ordering picks exactly that
        m = F.array_max(
            F.transform(
                cands,
                lambda h: F.struct(
                    (-h["us"]).alias("neg_us"),
                    h["tie"].alias("tie"),
                    h["payload"].alias("payload"),
                    h["us"].alias("us"),
                ),
            )
        )
        if horizon is not None:
            m = F.when(m["us"] - probe_us <= horizon, m)
        return m

    if direction == "backward":
        carried = _back()["payload"]
    elif direction == "forward":
        carried = _fwd()["payload"]
    else:
        back, fwd = _back(), _fwd()
        d_back = probe_us - back["us"]
        d_fwd = fwd["us"] - probe_us
        carried = (
            F.when(back.isNull(), fwd["payload"])
            .when(fwd.isNull(), back["payload"])
            .when(d_fwd < d_back, fwd["payload"])  # tie -> backward
            .otherwise(back["payload"])
        )
    return joined.withColumn(ASOF_STRUCT, carried).select(
        *keys, *probe_cols, ASOF_STRUCT
    )


def range_join(
    probe: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 300,
    on: str | list[str] | None = None,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Interval-containment join: probe rows whose ``ts`` falls in
    ``[start, end)`` of an interval row (half-open). With no ``on`` this is
    the pure range-join problem; with ``on`` (e.g. per-user maintenance
    windows) the bucket join also equi-matches the key columns, bounding
    candidates to per-(key, bucket) occupancy.

    Plan shape: time is binned into ``bucket_seconds``-wide buckets. Each
    interval row explodes to the buckets it overlaps (an interval of width W
    covers ceil(W/bucket)+1 buckets); each probe row lands in exactly one
    bucket, so the bucket equi-join produces no duplicate pairs and the
    exact predicate only has to refine, never dedupe. Candidate volume is
    bounded by per-bucket occupancy — pick ``bucket_seconds`` near the
    typical interval width so each interval explodes to O(1) bucket rows.
    Catalyst plans the bucket join as a plain shuffled/broadcast hash join,
    scaling like any equi-join; the naive formulation (join on the
    inequality alone) would be a BroadcastNestedLoopJoin, O(n·m) at 100 TB.

    Returns inner-join rows with all probe and interval columns (names must
    not collide).

    ``max_buckets_per_interval`` guards against a single open-ended or
    mistakenly-wide interval (e.g. a year-scale ``end`` with
    ``bucket_seconds=300``) exploding to ~100k+ bucket rows — past ~2^31
    elements Spark's ``sequence`` hard-fails the whole job with an opaque
    error, and long before that the explode skews one task. Offending rows
    raise with the interval width and the implied bucket count so the caller
    can widen ``bucket_seconds`` or pre-filter.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    overlap = (set(probe.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"probe/interval column collision: {sorted(overlap)}")
    width = F.lit(int(bucket_seconds) * 1_000_000)
    lo = F.floor(_epoch_us(F.col(start)) / width)
    hi = F.floor(_epoch_us(F.col(end)) / width)
    n_buckets = hi - lo + F.lit(1)
    # NULL start/end: n_buckets is NULL, the whole when-chain yields NULL,
    # sequence(lo, NULL) is NULL and explode drops the row — preserving the
    # silent-drop semantics an inner join gives NULL keys (only genuinely
    # wide intervals raise). Inverted intervals (end < start ⇒ n_buckets
    # < 1) contain no timestamp — the refine predicate can never match —
    # so they drop the same way; without this branch they would BYPASS the
    # width guard (n_buckets <= max passes for negatives) and explode via
    # Spark's implicit DESCENDING sequence(lo, hi) — |lo-hi| bucket rows
    # from one corrupt sentinel date.
    guarded_hi = F.when(
        n_buckets.isNull() | (n_buckets < F.lit(1)), F.lit(None).cast("long")
    ).when(
        n_buckets <= F.lit(int(max_buckets_per_interval)), hi
    ).otherwise(
        F.raise_error(
            F.format_string(
                "range_join: interval [%s, %s) spans %s buckets of "
                + f"{int(bucket_seconds)}s (max_buckets_per_interval="
                + f"{int(max_buckets_per_interval)}); widen bucket_seconds "
                + "or pre-filter open-ended intervals",
                F.col(start).cast("string"),
                F.col(end).cast("string"),
                n_buckets.cast("string"),
            )
        ).cast("long")
    )
    p = probe.withColumn("_rj_bucket", F.floor(_epoch_us(F.col(ts)) / width))
    iv = intervals.withColumn(
        "_rj_bucket",
        F.explode(F.sequence(lo, guarded_hi)),
    )
    joined = p.join(iv, on=["_rj_bucket", *keys], how="inner").filter(
        (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("_rj_bucket")


def asof_join_epoched(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    build_ts: str | None = None,
    tolerance_seconds: float | None = None,
    tie_break: str | None = None,
    epoch_seconds: int = 3600,
) -> DataFrame:
    """Skew-resistant as-of join: identical semantics to :func:`asof_join`,
    but the per-key window is decomposed into time epochs so a HOT KEY no
    longer serializes on one task.

    The plain formulation partitions by key alone — fine when per-key row
    counts are bounded, but a key holding 1% of a 100 TB stream puts 1 TB
    through a single task's sort. This variant runs three bounded stages:

    1. per-(key, epoch) last build payload — an aggregate (map-side partial,
       shuffle carries <= one row per key-epoch);
    2. carry the latest payload across epoch boundaries — a window over the
       key's EPOCH SUMMARIES (rows = active epochs, not events);
    3. the original union+window, now partitioned by (key, epoch) with the
       carried payload injected as a boundary seed row — a hot key spreads
       over timeline/epoch_seconds partitions.

    Choose ``epoch_seconds`` so a single key-epoch fits a task comfortably
    (e.g. an hour for second-grade feeds). Ordering uses the epoch-local
    microsecond offset, so semantics — backward as-of (greatest build ts
    <= probe ts, inclusive), tolerance horizon, tie-break — match
    :func:`asof_join` row-for-row (equality-tested on randomized skewed
    inputs).
    """
    if epoch_seconds < 1:
        raise ValueError("epoch_seconds must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    bts = build_ts or ts
    build_cols = [c for c in build.columns if c not in keys]
    probe_cols = [c for c in probe.columns if c not in keys]
    width = int(epoch_seconds) * 1_000_000

    payload = F.struct(
        F.col(bts).alias(f"{bts}"),
        *[F.col(c) for c in build_cols if c != bts],
    )
    tie = F.col(tie_break) if tie_break is not None else F.lit(0)
    b = build.select(
        *keys,
        _epoch_us(F.col(bts)).alias("_us"),
        tie.alias("_tie"),
        payload.alias("_payload"),
    ).withColumn("_epoch", F.floor(F.col("_us") / F.lit(width)))
    p = probe.select(
        *keys,
        _epoch_us(F.col(ts)).alias("_us"),
        *probe_cols,
    ).withColumn("_epoch", F.floor(F.col("_us") / F.lit(width)))

    # stage 1: last build payload per (key, epoch) — max_by on (ts, tie)
    last_in_epoch = b.groupBy(*keys, "_epoch").agg(
        F.max_by("_payload", F.struct("_us", "_tie")).alias("_epoch_last")
    )
    # stage 2: carry across epochs; the boundary value for epoch e is the
    # latest payload of any EARLIER epoch (strictly preceding rows)
    active = (
        p.select(*keys, "_epoch").union(b.select(*keys, "_epoch")).distinct()
    )
    w_epoch = (
        Window.partitionBy(*keys)
        .orderBy("_epoch")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundaries = (
        active.join(last_in_epoch, [*keys, "_epoch"], "left")
        .withColumn("_carried", F.last("_epoch_last", ignorenulls=True).over(w_epoch))
        .filter(F.col("_carried").isNotNull())
    )

    # stage 3: per-(key, epoch) ordered carry-forward with boundary seeds.
    # sides: -1 seed < 0 build < 1 probe at equal _us (inclusive <=:
    # a build row at exactly the probe ts matches, backward semantics)
    null_probe = [
        F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols
    ]
    seed = boundaries.select(
        *keys,
        "_epoch",
        (F.col("_epoch") * F.lit(width)).alias("_us"),
        F.lit(-1).alias("_side"),
        F.lit(0).alias("_tie"),
        F.col("_carried").alias("_payload"),
        *null_probe,
    )
    b3 = b.select(
        *keys, "_epoch", "_us", F.lit(0).alias("_side"), "_tie", "_payload", *null_probe
    )
    p3 = p.select(
        *keys,
        "_epoch",
        "_us",
        F.lit(1).alias("_side"),
        F.lit(0).alias("_tie"),
        F.lit(None).cast(b3.schema["_payload"].dataType).alias("_payload"),
        *probe_cols,
    )
    w = (
        Window.partitionBy(*keys, "_epoch")
        .orderBy("_us", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_payload", ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        horizon = F.lit(int(tolerance_seconds * 1_000_000))
        carried = F.when(
            F.col("_us") - _epoch_us(carried[bts]) <= horizon, carried
        )
    return (
        seed.unionByName(b3)
        .unionByName(p3)
        .withColumn(ASOF_STRUCT, carried)
        .filter(F.col("_side") == 1)
        .select(*keys, *probe_cols, ASOF_STRUCT)
    )
