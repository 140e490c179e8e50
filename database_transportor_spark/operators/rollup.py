"""Hypertable-style multi-resolution time rollups (continuous aggregates).

``time_rollup`` materializes a hierarchy of time-bucketed aggregates where
each coarser level is computed FROM the previous level, not from raw data —
the TimescaleDB/Druid continuous-aggregate pattern.  At 100 TB this is the
difference between scanning the corpus once per resolution and scanning it
once total: the minute level reads the events; the hour level reads the
minute level (~60× smaller); the day level reads the hour level.

Re-aggregation requires *decomposable* aggregates; the spec maps each
output measure to a (leaf aggregate, merge aggregate) pair:

    count  → count(*)    at leaf, sum(col)  to merge
    sum    → sum(x)      at leaf, sum(col)  to merge
    min    → min(x)      at leaf, min(col)  to merge
    max    → max(x)      at leaf, max(col)  to merge
    hll    → hll_sketch_agg at leaf, hll_union_agg to merge (binary
             DataSketches HLL; estimates via hll_estimates())

(avg is derived as sum/count at read time — never merged directly.
Distinct counts are only mergeable as sketches — "hll" carries the sketch
through the hierarchy so the day level's estimate equals the one computed
straight from raw data, which re-aggregated approximate counts cannot.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "time_rollup",
    "MERGEABLE",
    "pivot_table",
    "unpivot_table",
    "cube_agg",
    "hll_estimates",
    "refresh_rollup",
    "join_view_delta",
    "refresh_join_view",
]


def cube_agg(
    df: DataFrame,
    dims: list[str],
    measures: list,
    mode: str = "cube",
    sets: list[list[str]] | None = None,
    gid_col: str = "gid",
) -> DataFrame:
    """Multi-dimensional OLAP aggregation over ``dims`` — CUBE (every
    dim subset), ROLLUP (hierarchical prefixes), or explicit GROUPING
    SETS — with a ``grouping_id`` disambiguator column.

    ``measures`` are pre-built aggregate Columns (``F.count('*')
    .alias(...)`` etc.).  ``gid_col`` carries ``F.grouping_id()`` (first
    dim = most significant bit, matching ANSI ``GROUPING(dims...)``), so
    a NULL dim value from aggregation is distinguishable from a NULL in
    the data — without it the cube output is ambiguous.

    Scale shape: Spark plans one Expand node (each input row fans out to
    the matching grouping sets) feeding ONE hash aggregate with map-side
    partial aggregation — a single shuffle regardless of how many sets,
    never one scan per set.  At 100 TB prefer ROLLUP or explicit sets to
    a full CUBE: Expand multiplies shuffle input by the number of sets
    (2^|dims| for cube, |dims|+1 for rollup).
    """
    if mode == "cube":
        gb = df.cube(*dims)
    elif mode == "rollup":
        gb = df.rollup(*dims)
    elif mode == "sets":
        if sets is None:
            raise ValueError("cube_agg: mode='sets' requires sets=[...]")
        gb = df.groupingSets([[c for c in s] for s in sets], *dims)
    else:
        raise ValueError(f"cube_agg: unknown mode {mode!r}")
    return gb.agg(F.grouping_id().alias(gid_col), *measures)


def pivot_table(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    values: list[str],
    agg: str = "count",
    value_col: str | None = None,
    fill: int | float | None = 0,
) -> DataFrame:
    """Wide-format pivot: one row per ``group_cols``, one column per
    category in ``values`` (the ClickHouse/pandas ``pivot_table``
    reshape Spark exposes via ``groupBy().pivot()``).

    ``values`` is REQUIRED, not discovered: an explicit category list
    skips the extra distinct-collection job Spark otherwise runs, keeps
    the output schema stable across runs (a new category can't silently
    add a column mid-pipeline), and bounds the width.  ``agg`` is one of
    count/sum/min/max/avg (``value_col`` required for all but count).
    Absent (group, category) cells are ``fill`` (default 0; ``None``
    keeps NULL).

    Scale shape: compiled to conditional aggregation
    (``agg(when(pivot = v, x))`` per category) rather than Spark's
    native ``groupBy().pivot()``: the built-in plans TWO exchanges (a
    pre-aggregate on (group, pivot) then a second shuffle to pivot);
    conditional aggregation is exactly ONE hash shuffle on
    ``group_cols`` with map-side partial aggregation — the fact table
    crosses the network once, already reduced (plan-asserted in
    tests/test_plan_audit.py).
    """
    if agg not in ("count", "sum", "min", "max", "avg"):
        raise ValueError(f"pivot_table: unsupported agg {agg!r}")
    if agg != "count" and value_col is None:
        raise ValueError(f"pivot_table: agg {agg!r} requires value_col")
    exprs = []
    for v in values:
        cell = F.when(
            F.col(pivot_col) == v,
            F.lit(1) if value_col is None else F.col(value_col),
        )
        e = getattr(F, agg)(cell)
        if agg == "count":
            e = e.cast("long")  # count(when(...)) counts only matches
        elif fill is not None:
            e = F.coalesce(e, F.lit(fill))
        exprs.append(e.alias(v))
    return df.groupBy(*group_cols).agg(*exprs)


def unpivot_table(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Long-format melt: fold ``value_cols`` into (``var_name``,
    ``value_name``) rows — the inverse of :func:`pivot_table` and the
    normalizer for metrics-wide tables before grouped analysis.

    Scale shape: narrow per-row fan-out (|value_cols| rows per input
    row), zero shuffle — Spark's native ``unpivot`` (Expand node), no
    join, no Python.
    """
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )

MERGEABLE = {
    "count": (lambda c: F.count("*"), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    # Apache DataSketches HLL: the leaf aggregates raw values into a binary
    # sketch; coarser levels MERGE sketches (hll_union_agg) — this is what
    # makes approximate distinct counts roll up exactly like sums do, the
    # thing plain approx_count_distinct results can never do (distinct
    # counts are not additive).  Read estimates out with hll_estimates().
    "hll": (F.hll_sketch_agg, F.hll_union_agg),
}


def hll_estimates(df: DataFrame, sketch_cols: list[str]) -> DataFrame:
    """Materialize HLL sketch columns into long estimates (replacing the
    binary sketch) — the presentation step after a ``time_rollup`` with
    ``"hll"`` measures.  Narrow projection, zero shuffle."""
    out = df
    for c in sketch_cols:
        # round, don't truncate: a raw cast would bias every estimate
        # downward by up to 1
        out = out.withColumn(
            c, F.round(F.hll_sketch_estimate(F.col(c))).cast("long")
        )
    return out


def time_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    measures: dict[str, tuple[str, str | None]],
    levels: list[str],
) -> dict[str, DataFrame]:
    """Build the rollup hierarchy.

    ``measures``: output name → (agg, source col) with agg either a
    name in :data:`MERGEABLE` (source col ignored for count) or a
    custom ``(leaf_fn, merge_fn)`` pair with the same contract — e.g.
    :func:`~.sketches.hist_measure`'s mergeable fixed-bin histograms.
    ``levels``: window widths coarse-ward, e.g. ``["1 minute", "1 hour",
    "1 day"]`` — each must evenly nest in the next (minute boundaries align
    with hour boundaries etc.), which is what makes merge-from-previous
    exact.

    Returns {level: DataFrame} where each frame has ``bucket_start``,
    ``keys...`` and the measure columns.
    """
    def fns(name, agg):
        if isinstance(agg, str):
            if agg not in MERGEABLE:
                raise ValueError(
                    f"measure {name!r}: {agg!r} is not decomposable "
                    f"(supported: {sorted(MERGEABLE)}, or a "
                    f"(leaf_fn, merge_fn) pair)"
                )
            return MERGEABLE[agg]
        leaf, merge = agg  # custom decomposable measure
        if not (callable(leaf) and callable(merge)):
            raise ValueError(
                f"measure {name!r}: custom agg must be a "
                f"(leaf_fn, merge_fn) pair of callables"
            )
        return leaf, merge

    resolved = {
        name: (fns(name, agg), col)
        for name, (agg, col) in measures.items()
    }

    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    prev_ts = ts_col
    for level in levels:
        src = df if prev is None else prev
        bucket = F.window(F.col(prev_ts), level).getField("start")
        if prev is None:
            aggs = [
                leaf(col).alias(name)
                for name, ((leaf, _merge), col) in resolved.items()
            ]
        else:
            aggs = [
                merge(name).alias(name)
                for name, ((_leaf, merge), _col) in resolved.items()
            ]
        cur = (
            src.groupBy(bucket.alias("bucket_start"), *keys)
            .agg(*aggs)
        )
        out[level] = cur
        prev = cur
        prev_ts = "bucket_start"
    return out


def refresh_rollup(
    catalog,
    rollup_table: str,
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    measures: dict[str, tuple[str, str | None]],
    level: str,
    lookback_buckets: int = 1,
) -> DataFrame:
    """Incremental materialized-rollup maintenance — the continuous-
    aggregate REFRESH: recompute only the TAIL buckets new events can
    touch and MERGE them into the stored rollup, instead of rescanning
    all history.

    The refresh window starts ``lookback_buckets - 1`` buckets before
    the stored rollup's newest ``bucket_start`` (the open bucket always
    recomputes; raise ``lookback_buckets`` to absorb late data older
    than one bucket — events later than that are missed, the same
    contract as a streaming watermark).  The events filter is a plain
    ``ts >= start`` predicate, so it pushes into the scan: a daily
    refresh over years of history reads days, not years.  First call
    (no stored rollup) builds the whole thing.

    Returns the merged frame AFTER committing it through the catalog's
    staged swap.  Measures use the :data:`MERGEABLE` vocabulary; the
    recomputed tail buckets are exact (re-aggregated from raw events in
    the window), so replacing them wholesale by key is exact too.
    """
    fresh_src = events
    try:
        existing = catalog.read(rollup_table)
        has_existing = True
    except Exception:  # noqa: BLE001 — first build: any read failure
        existing = None
        has_existing = False
    if has_existing:
        row = existing.agg(F.max("bucket_start").alias("m")).first()
        cur_max = row["m"]
    else:
        cur_max = None
    if cur_max is not None:
        n_back = max(0, int(lookback_buckets) - 1)
        start = F.lit(cur_max) - F.expr(f"{n_back} * interval {level}")
        fresh_src = events.filter(F.col(ts_col) >= start)
    tail = time_rollup(fresh_src, ts_col, keys, measures, [level])[level]
    if cur_max is None:
        merged = tail
    else:
        from .mutations import merge_upsert

        merged = merge_upsert(existing, tail, ["bucket_start", *keys])
    catalog.write_staged(merged, rollup_table)
    catalog.commit_staged(rollup_table)
    return catalog.read(rollup_table)


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance (append-only delta propagation)
# ---------------------------------------------------------------------------


def join_view_delta(
    left_old: DataFrame | None,
    right_old: DataFrame | None,
    left_delta: DataFrame | None,
    right_delta: DataFrame | None,
    on: list[str],
    broadcast_deltas: bool = True,
) -> DataFrame | None:
    """The exact delta of an INNER equi-join view under append-only
    inputs — classic incremental view maintenance:

        Δ(A ⋈ B) = (ΔA ⋈ (B ∪ ΔB))  ∪all  (A_old ⋈ ΔB)

    (the first term covers ΔA⋈B_old and ΔA⋈ΔB; the second adds
    A_old⋈ΔB — together exactly the new join rows, under BAG semantics,
    so no dedup is needed or wanted.)

    The 100 TB point: a full recompute of A ⋈ B is a big-big shuffle of
    both corpora; the delta is two SMALL-big joins, and with
    ``broadcast_deltas`` (default) both get broadcast hints — the big
    sides are scanned once each with NO shuffle at all.  Appends only:
    updates/deletes need retraction handling (use
    :func:`~.mutations.cdc_apply` + full recompute, or a keyed
    merge view).

    ``None`` stands for an empty/absent side (first build).  Raises if
    both deltas are ``None`` (no change ⇒ no delta to compute).  Returns
    ``None`` (not a frame) when the delta is provably empty AND its
    schema is underivable — a one-sided first build where the opposite
    side has never been seen; :func:`refresh_join_view` handles that by
    bootstrapping an empty view.
    """
    if left_delta is None and right_delta is None:
        raise ValueError("join_view_delta: at least one delta is required")
    hint = F.broadcast if broadcast_deltas else (lambda d: d)
    parts = []
    if left_delta is not None:
        right_new = right_old
        if right_delta is not None:
            right_new = (
                right_delta if right_new is None
                else right_new.unionByName(right_delta)
            )
        if right_new is not None:
            parts.append(hint(left_delta).join(right_new, on, "inner"))
    if right_delta is not None and left_old is not None:
        parts.append(left_old.join(hint(right_delta), on, "inner"))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def refresh_join_view(
    catalog,
    view_table: str,
    left_table: str,
    right_table: str,
    on: list[str],
    left_batch: DataFrame | None = None,
    right_batch: DataFrame | None = None,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Maintain a stored INNER-join view incrementally: compute
    :func:`join_view_delta` against the stored base tables, APPEND the
    delta to the stored view, then append the batches to the bases.
    Returns the refreshed view frame.

    Write ordering (view first, bases second) means a crash between the
    writes leaves the view AHEAD of the bases — re-running the same
    batches would double-append.  Exactly-once refresh across failures
    needs a multi-table transaction no file catalog has; run refreshes
    through ``VersionedCatalog`` and roll both tables back to the
    pre-refresh version on failure.  The view's bytes are only ever
    appended — a refresh never rewrites history, so view reads stay
    cheap and compactable (:func:`~.maintenance.compact_table`).
    """
    left_old = catalog.read(left_table) if catalog.exists(left_table) else None
    right_old = (
        catalog.read(right_table) if catalog.exists(right_table) else None
    )
    delta = join_view_delta(left_old, right_old, left_batch, right_batch,
                            on, broadcast_deltas=broadcast_deltas)
    if delta is not None:
        catalog.write(delta, view_table, mode="append")
    if left_batch is not None:
        catalog.write(left_batch, left_table, mode="append")
    if right_batch is not None:
        catalog.write(right_batch, right_table, mode="append")
    if catalog.exists(view_table):
        return catalog.read(view_table)
    # One-sided first build: the delta was None so the view table was
    # never created.  Return an empty, correctly-schemed view from the
    # base tables that DO exist (a side never seen can't contribute
    # columns yet — the schema widens on its first batch).
    left_now = catalog.read(left_table) if catalog.exists(left_table) else None
    right_now = (
        catalog.read(right_table) if catalog.exists(right_table) else None
    )
    if left_now is not None and right_now is not None:
        return left_now.limit(0).join(right_now.limit(0), on, "inner")
    only = left_now if left_now is not None else right_now
    if only is None:
        raise ValueError(
            "refresh_join_view: no batches and no base tables — nothing "
            "to build a view from"
        )
    return only.limit(0)
