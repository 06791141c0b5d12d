"""Deterministic sampling / splitting / corpus mixing for training-data
pipelines.

All operators key off a content-independent md5 of ``salt|key`` rather than
Spark's Bernoulli ``sample()``: the kept-set is a pure function of (key,
salt), so re-runs, retries, and incremental re-processing at 100 TB select
the SAME rows (no sampling drift between pipeline stages), results are
reproducible across engines (md5 is the repo's cross-engine hash — any SQL
engine or plain Python recomputes the exact kept-set), and train/heldout
splits stay disjoint by construction.

Scale shape: every operator is a stateless narrow filter — no shuffle, no
driver-side state, trivially partition-parallel, and the filter composes
with parquet scan pushdown of other predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# resolution of the sampling rate: 1e6 buckets ⇒ rates exact to 1e-6
_BUCKETS = 1_000_000


def _hash_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from md5(salt|key) — first 8 hex chars are
    32 uniform bits, far beyond the 1e6 resolution."""
    hx = F.md5(F.concat_ws("|", F.lit(salt), key.cast("string")))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % _BUCKETS


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed on ``key_col``.
    Same (key, salt) ⇒ same verdict on every run and every engine."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(_hash_bucket(F.col(key_col), salt) < int(rate * _BUCKETS))


def split_train_heldout(
    df: DataFrame, key_col: str, heldout_frac: float, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, heldout) split — the dedup-safe eval
    split: a key lands on exactly one side, decided by its hash alone, so
    re-runs and newly arrived rows never leak across the boundary."""
    if not 0.0 <= heldout_frac <= 1.0:
        raise ValueError(f"heldout_frac must be in [0,1], got {heldout_frac}")
    cut = int(heldout_frac * _BUCKETS)
    bucket = _hash_bucket(F.col(key_col), salt)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language quotas).
    ``rates`` maps stratum value → keep fraction; unlisted strata use
    ``default_rate``. One narrow filter — the rate lookup is a literal
    CASE, no join."""
    for v, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {v!r} must be in [0,1], got {r}")
    cut = F.lit(int(default_rate * _BUCKETS))
    for v, r in sorted(rates.items()):
        cut = F.when(F.col(strata_col) == v, F.lit(int(r * _BUCKETS))).otherwise(cut)
    return df.filter(_hash_bucket(F.col(key_col), salt) < cut)


def mix_corpora(
    corpora: list[tuple[DataFrame, float]],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Weighted corpus mixture: down-sample each corpus to its weight (keep
    fraction in [0,1]) with a per-corpus salt, then union by name. The
    standard pretraining-mixture shape — deterministic, so the mixture is
    stable across re-runs and resumable mid-pipeline."""
    if not corpora:
        raise ValueError("mix_corpora needs at least one corpus")
    out: DataFrame | None = None
    for i, (df, w) in enumerate(corpora):
        part = hash_sample(df, key_col, w, salt=f"{salt}#{i}")
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    return out


def temperature_weights(
    sizes: dict[str, float], alpha: float = 0.3, target_fraction: float = 1.0
) -> dict[str, float]:
    """Per-corpus keep fractions implementing temperature sampling: corpus
    ``i`` is represented proportionally to ``size_i ** alpha`` (the
    multilingual/multi-source rebalancing recipe — ``alpha=1`` keeps natural
    proportions, ``alpha=0`` equalizes corpora, ``alpha≈0.3`` is the common
    compromise that up-weights small sources without drowning large ones).

    Returns {name: keep_fraction in (0, 1]} for :func:`mix_corpora`:
    fractions are scaled so the most over-sampled corpus keeps exactly
    ``target_fraction`` of its rows (sampling can only DOWN-sample — rates
    above 1 would silently under-represent; scaling to the binding corpus
    preserves the *ratios*, which is what the temperature defines).

    Driver-side arithmetic over |corpora| numbers — compute ``sizes`` once
    (``df.count()`` or manifest metadata) and reuse.
    """
    if not sizes:
        raise ValueError("sizes must be non-empty")
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    if not 0.0 < target_fraction <= 1.0:
        raise ValueError(f"target_fraction must be in (0,1], got {target_fraction}")
    for k, v in sizes.items():
        if v <= 0:
            raise ValueError(f"size for {k!r} must be > 0, got {v}")
    total = sum(sizes.values())
    desired = {k: (v / total) ** alpha for k, v in sizes.items()}
    dtotal = sum(desired.values())
    # keep_i ∝ desired_share_i / natural_share_i; normalize so max == target
    raw = {k: (desired[k] / dtotal) / (sizes[k] / total) for k in sizes}
    peak = max(raw.values())
    return {k: target_fraction * r / peak for k, r in raw.items()}


def prethin_for_cap(
    df: DataFrame,
    key_col: str,
    group_col: str | list[str],
    n: int,
    salt: str = "cap",
    factor: float = 3.0,
    top_n: int = 100,
) -> DataFrame:
    """Map-side pre-thin of pathologically hot groups before an exact
    :func:`cap_per_group` — the two-stage recipe that keeps the cap
    window's per-task volume bounded without biasing the kept-set.

    Consults :func:`~.skew.key_skew_profile` (control-plane: ``top_n``
    rows) for groups whose count exceeds ``factor * n``, and filters each
    to the rows whose CAP-PRIORITY bucket — the same ``md5(salt|key)``
    the cap's window orders by — falls below a per-group cut sized to
    leave ``~factor * n`` expected survivors. Because the filter and the
    cap share the priority order, the result is EXACTLY the unthinned
    cap's kept-set whenever a hot group retains at least ``n`` survivors:
    the cap keeps the ``n`` smallest priority buckets, and all of them sit
    below any cut that admits ``>= n`` rows. Under-fill probability is the
    lower Poisson tail P(X < n | mean = factor*n) — ~1e-5 at the default
    factor for ``n >= 10``; raise ``factor`` for smaller caps.

    Scale shape: the profile is a map-side-combined groupBy (the hot key
    collapses to one partial per upstream partition BEFORE its shuffle);
    the thin itself is a stateless narrow filter (the per-group cut is a
    literal CASE over ``top_n`` hot groups, no join) — so the hot group
    never rides a shuffle at full size; only its ``~factor * n``
    survivors reach the cap's window task.
    """
    from sample_dms_kinesis_rds_mariadb_spark.operators.skew import (
        key_skew_profile,
    )

    if n <= 0:
        return df
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    hot = key_skew_profile(df, groups, top_n=top_n).collect()
    cuts: list[tuple[tuple, int]] = []
    for r in hot:
        if r["n"] > factor * n:
            cut = min(_BUCKETS, int(factor * n * _BUCKETS / r["n"]) + 1)
            cuts.append((tuple(r[g] for g in groups), cut))
    if not cuts:
        return df
    bucket = _hash_bucket(F.col(key_col), salt)
    cut_expr: Column = F.lit(_BUCKETS)  # non-hot groups keep everything
    for gvals, cut in sorted(cuts, key=lambda x: (str(x[0]), x[1])):
        cond = F.lit(True)
        for g, v in zip(groups, gvals):
            cond = cond & F.col(g).eqNullSafe(F.lit(v))
        cut_expr = F.when(cond, F.lit(cut)).otherwise(cut_expr)
    return df.filter(bucket < cut_expr)


def cap_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str | list[str],
    n: int,
    salt: str = "cap",
    prethin: bool = False,
    prethin_factor: float = 3.0,
    prethin_top_n: int = 100,
) -> DataFrame:
    """Keep at most ``n`` rows per group — the per-domain/per-source cap
    corpus recipes apply so one crawl host can't dominate the mixture
    (RefinedWeb-style). Which rows survive is decided by md5 hash priority
    (smallest ``md5(salt|key)`` buckets first, key as tiebreak), NOT arrival
    or file order: the verdict is a pure function of (key, salt, the group's
    membership), so re-runs reproduce the same kept-set and the choice is an
    unbiased uniform sample of the group rather than "whatever the scan saw
    first". Note the membership dependence — unlike :func:`hash_sample`, a
    cap is relative, so adding rows to an over-cap group can evict
    previously kept rows; pin the corpus snapshot when that matters.

    Scale shape: one hash shuffle on the group key and a per-group
    top-``n`` (rank over an ordered window). Per-group data goes through
    ONE task, which is the cap's semantics (a relative verdict needs the
    group together); for pathologically hot groups pass ``prethin=True``,
    which runs :func:`prethin_for_cap` first — a priority-consistent
    map-side thin of the profiled hot groups that bounds the window's
    per-task volume while reproducing the unthinned kept-set exactly
    (see its docstring for the guarantee and its Poisson under-fill
    bound, tunable via ``prethin_factor`` / ``prethin_top_n``).
    """
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    if prethin:
        df = prethin_for_cap(
            df, key_col, groups, n, salt=salt,
            factor=prethin_factor, top_n=prethin_top_n,
        )
    w = Window.partitionBy(*groups).orderBy(
        _hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .filter(F.col("_cap_rn") <= F.lit(int(n)))
        .drop("_cap_rn")
    )


def split_leakage_safe(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str,
    heldout_frac: float,
    salt: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup-aware ``split`` column: rows connected by ``pairs`` (the
    output of any dedup candidate operator — MinHash/SimHash/winnowing/
    embedding) land on the SAME side, so a heldout doc can never have a
    near-duplicate in train — the eval-contamination failure mode a plain
    key split cannot prevent.

    Mechanics: ``pairs`` collapse to connected components (hash-min label
    propagation, distributed); each row's split key becomes its component
    label (its own key when untouched by any pair), then the verdict is the
    same md5 bucket rule as :func:`split_column` — deterministic,
    cross-engine reproducible, and IDENTICAL to ``split_column`` for rows
    with no near-dups (same salt ⇒ same buckets).

    Scale shape: components run on the PAIR graph (nodes = docs appearing
    in candidate pairs — the small slice of the corpus), broadcast back
    onto the corpus as a label lookup; the corpus side stays a narrow scan
    + broadcast probe. At 100 TB the pair graph is dedup-output-sized
    (bounded by the candidate generator's bucketing), which is what makes
    the broadcast safe; for a degenerate graph touching most of the corpus,
    dedup first — splitting a corpus that is mostly one near-dup cluster is
    not a meaningful eval split anyway.

    Note the membership dependence: adding a pair can merge two components
    and move rows between sides (the price of the no-leakage guarantee).
    Pin the pair set with the corpus snapshot when stability matters.
    """
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        connected_components,
    )

    if not 0.0 <= heldout_frac <= 1.0:
        raise ValueError(f"heldout_frac must be in [0,1], got {heldout_frac}")
    comps = connected_components(pairs, id_a=id_a, id_b=id_b).select(
        F.col("node"), F.col("component").cast("string").alias("_comp")
    )
    labeled = df.join(
        F.broadcast(comps), df[key_col] == comps["node"], "left"
    ).drop("node")
    cut = int(heldout_frac * _BUCKETS)
    bucket = _hash_bucket(
        F.coalesce(F.col("_comp"), F.col(key_col).cast("string")), salt
    )
    return labeled.withColumn(
        "split",
        F.when(bucket < cut, F.lit("heldout")).otherwise(F.lit("train")),
    ).drop("_comp")


def split_column(
    df: DataFrame, key_col: str, heldout_frac: float, salt: str = "split"
) -> DataFrame:
    """Single-pass variant of :func:`split_train_heldout`: append a
    ``split`` label column ('train' / 'heldout') instead of returning two
    filtered frames. Identical verdicts (same md5 buckets, same salt) — but
    ONE scan of the corpus, where unioning the two filtered frames would
    scan it twice. Prefer this shape whenever both sides flow into the same
    downstream plan (per-split statistics, stratified exports)."""
    if not 0.0 <= heldout_frac <= 1.0:
        raise ValueError(f"heldout_frac must be in [0,1], got {heldout_frac}")
    cut = int(heldout_frac * _BUCKETS)
    bucket = _hash_bucket(F.col(key_col), salt)
    return df.withColumn(
        "split", F.when(bucket < cut, F.lit("heldout")).otherwise(F.lit("train"))
    )


def temperature_rates(
    sizes: dict[str, float],
    alpha: float = 0.3,
    max_rate: float | None = None,
) -> dict[str, float]:
    """Temperature sampling RATES that may exceed 1 — the up-sampling form
    of :func:`temperature_weights`: the LARGEST corpus keeps rate 1.0
    (every row, once) and smaller corpora get rates > 1, i.e. fractional
    EPOCH counts (the "N epochs of Wikipedia" recipe real mixtures use,
    rather than throwing away large-corpus rows to fix the ratios).

    ``max_rate`` caps repetition (over-repeating a tiny corpus degrades
    models before it balances them); capped corpora fall below their
    temperature share — deliberately visible, not silently renormalized.
    Feed the result to :func:`mix_corpora_epochs`.
    """
    if not sizes:
        raise ValueError("sizes must be non-empty")
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    if max_rate is not None and max_rate < 1.0:
        raise ValueError(f"max_rate must be >= 1, got {max_rate}")
    for k, v in sizes.items():
        if v <= 0:
            raise ValueError(f"size for {k!r} must be > 0, got {v}")
    total = sum(sizes.values())
    desired = {k: (v / total) ** alpha for k, v in sizes.items()}
    dtotal = sum(desired.values())
    raw = {k: (desired[k] / dtotal) / (sizes[k] / total) for k in sizes}
    biggest = max(sizes, key=lambda k: (sizes[k], k))
    scale = raw[biggest]
    rates = {k: r / scale for k, r in raw.items()}
    if max_rate is not None:
        rates = {k: min(r, float(max_rate)) for k, r in rates.items()}
    return rates


def replicate_fraction(
    df: DataFrame,
    key_col: str,
    times: float,
    epoch_col: str = "epoch",
    salt: str = "epoch",
) -> DataFrame:
    """``times`` deterministic copies of ``df`` — ``floor(times)`` full
    epochs plus an md5-sampled fraction of one more — with ``epoch_col``
    tagging which repetition each row belongs to (loaders shuffle epochs
    independently; dedup-by-key consumers can drop it).

    The fractional epoch uses the same stateless hash-bucket rule as
    :func:`hash_sample`, so membership is reproducible across runs and
    engines. ``times <= 1`` degenerates to a plain deterministic sample
    (one partial epoch). A narrow union of filters — no shuffle.
    """
    if times < 0:
        raise ValueError(f"times must be >= 0, got {times}")
    if epoch_col in df.columns:
        raise ValueError(f"column collision: input already has '{epoch_col}'")
    k = int(times)
    frac = times - k
    parts = [
        df.withColumn(epoch_col, F.lit(i).cast("int")) for i in range(k)
    ]
    if frac > 0:
        parts.append(
            hash_sample(df, key_col, frac, salt=f"{salt}#{k}").withColumn(
                epoch_col, F.lit(k).cast("int")
            )
        )
    if not parts:
        return df.filter(F.lit(False)).withColumn(
            epoch_col, F.lit(0).cast("int")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mix_corpora_epochs(
    corpora: list[tuple[DataFrame, float]],
    key_col: str,
    epoch_col: str = "epoch",
    salt: str = "mix",
) -> DataFrame:
    """Weighted mixture where rates may EXCEED 1: each corpus contributes
    ``rate`` epochs of itself (full copies + a deterministic fractional
    epoch via :func:`replicate_fraction`), unioned by name. The
    up-sampling dual of :func:`mix_corpora` — pair with
    :func:`temperature_rates`. Output carries ``epoch_col``; expected
    rows = Σ rate_i × |corpus_i|.
    """
    if not corpora:
        raise ValueError("mix_corpora_epochs needs at least one corpus")
    out: DataFrame | None = None
    for i, (df, rate) in enumerate(corpora):
        part = replicate_fraction(
            df, key_col, rate, epoch_col=epoch_col, salt=f"{salt}#{i}"
        )
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    return out
