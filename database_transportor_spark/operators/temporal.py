"""Temporal join operators Spark's DataFrame API lacks natively.

- :func:`asof_join` — for each left row, attach the latest right row at or
  before its timestamp (per key).  Spark has no ASOF JOIN; the naive
  formulation (theta-join on ``r.ts <= l.ts`` + row_number) degenerates to
  a per-key cross product.  This implementation is the scalable shape:
  **union both sides, one window sort per key, carry the last right row
  forward** — cost is one shuffle on the key and one per-key sort of
  |L|+|R| rows, independent of how many right rows precede each left row.

- :func:`range_join` — equi-key + interval containment.  A raw
  ``BETWEEN`` theta-join forces Spark into BroadcastNestedLoop on big
  inputs; bucketing the time axis turns it into an equi-join on
  ``(key, bucket)`` with each interval exploded to the buckets it spans,
  then an exact containment filter.  Shuffle is keyed by (key, bucket) —
  never a cross product — at the cost of duplicate candidate rows for
  intervals spanning multiple buckets (exact filter dedupes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "asof_join_forward",
    "range_join",
    "build_scd2",
    "rolling_agg",
    "gap_fill",
    "ewma",
    "cusum",
    "rolling_distinct",
    "time_weighted_avg",
    "interval_concurrency",
    "seasonal_decompose",
]


def rolling_agg(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
    aggs: tuple[str, ...] = ("count", "sum", "avg"),
    round_digits: int = 4,
    prefix: str = "rolling_",
) -> DataFrame:
    """Trailing time-window features per row — for each event, aggregate
    ``value_col`` over that entity's events in the preceding
    ``window_sec`` seconds (inclusive of the current row and its exact
    time peers).  The feature-engineering primitive behind rate limits,
    per-user velocity signals, and sliding health metrics where every
    row needs its own trailing window (a grouped tumbling window can't
    express this).

    Implemented as a RANGE window frame over *exact integer
    microseconds* (``unix_micros``) — range frames on a float time axis
    invite cross-engine boundary drift; integer bounds are exact.
    Float aggregates (sum/avg) are rounded (default 4 decimals): a
    range frame's internal accumulation order is engine-specific and
    can differ in the last ulp.

    Scale shape: ONE shuffle on ``partition_col`` and one per-key sort,
    shared by every requested aggregate (same window spec).  State per
    key is the frame, bounded by ``window_sec`` × event rate — the same
    bound a streaming watermark would enforce.  Hot entities are the
    usual per-entity skew problem; pre-salt if one key dominates.
    """
    allowed = {"count", "sum", "avg", "min", "max"}
    bad = set(aggs) - allowed
    if bad:
        raise ValueError(f"rolling_agg: unsupported aggs {sorted(bad)}")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-int(window_sec) * 1_000_000, 0)
    )
    out = df
    for a in aggs:
        if a == "count":
            c = F.count(F.col(value_col)).over(w).cast("long")
        elif a == "sum":
            c = F.round(F.sum(value_col).over(w), round_digits)
        elif a == "avg":
            c = F.round(F.avg(value_col).over(w), round_digits)
        elif a == "min":
            c = F.min(value_col).over(w)
        else:
            c = F.max(value_col).over(w)
        out = out.withColumn(f"{prefix}{a}", c)
    return out


def build_scd2(
    feed: DataFrame,
    keys: str | list[str],
    ts_col: str,
    attr_cols: list[str] | None = None,
    collapse: bool = True,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change feed: one
    validity interval per (key, state), ``valid_from`` = the change's
    timestamp, ``valid_to`` = the NEXT change's timestamp (NULL ⇒ current
    row).  The output is exactly what :func:`asof_join` or
    :func:`range_join` probes to answer "what was this key's state at
    time t".

    ``collapse=True`` drops no-op changes first (rows whose attributes
    equal the key's previous row), so intervals describe STATE changes,
    not feed arrivals.

    Shape: one shuffle on the key; the collapse filter and the
    ``valid_to`` lead share the same (key, ts) sort, so Spark plans a
    single Exchange + sort.  Ties on (key, ts) are resolved by preferring
    the later feed row deterministically only if a tiebreak column is
    baked into ``ts_col`` — otherwise same-ts changes are collapsed by
    the lead to zero-length intervals, the SQL-standard behavior.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    attrs = attr_cols or [c for c in feed.columns if c not in ks + [ts_col]]
    w = Window.partitionBy(*ks).orderBy(F.col(ts_col).asc())
    out = feed.select(*ks, ts_col, *attrs)
    if collapse:
        state = F.struct(*[F.col(c) for c in attrs])
        out = (
            out.withColumn("__prev", F.lag(state).over(w))
            .filter(
                F.col("__prev").isNull()
                # null-safe: a NULL attribute equal to the previous NULL is
                # still a no-op change
                | ~state.eqNullSafe(F.col("__prev"))
            )
            .drop("__prev")
        )
    return (
        out.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .drop(ts_col)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    tolerance: Column | str | None = None,
    suffix: str = "_right",
    bucket: str | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, the most recent right row with
    ``right_ts <= left_ts`` sharing the key(s); no match ⇒ NULLs (left
    rows are never dropped, like a left-outer join).

    ``tolerance``: optional max staleness (e.g. ``"INTERVAL 1 HOUR"`` or a
    Column); matches older than ``left_ts - tolerance`` are discarded.

    Ties on the timestamp: a right row AT the left row's timestamp wins
    (``<=``, pandas ``merge_asof`` semantics); among right rows with the
    SAME timestamp the one with the greatest ``xxhash64`` of its payload
    wins — a deterministic tiebreak shared by the default and ``bucket``
    paths, so results never depend on shuffle order or code path.

    Right columns are appended, key/ts columns kept from the left; right
    payload columns colliding with a left name get ``suffix``.

    ``bucket``: hot-key escape hatch.  The default single window sorts all
    |L|+|R| rows of the hottest key in ONE task — fine until one key
    dominates.  Passing a duration (e.g. ``"1 day"``; requires
    timestamp-typed ``ts`` columns) splits every key's timeline into
    aligned buckets: per-(key, bucket) latest right rows are aggregated
    (tiny), carried across buckets by a per-key window over bucket
    summaries (rows = #buckets, not #events), and each bucket is seeded
    with its carry-in — so the big sort is per (key, bucket) and the
    hottest task is bounded by the densest bucket.  Results are identical
    to the default path (asserted by tests and the ``asof_bucketed``
    harness oracle): exact timestamp ties resolve by the payload-hash
    tiebreak in both paths, so bucketing never changes the answer.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    reserved = {"__ts", "__side", "__r", "__last", "__b", "__r0", "__rts", "__tb"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")

    payload = [c for c in right.columns if c not in keys and c != rts]
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload}

    # one event stream: right rows sort before left rows at equal ts is
    # WRONG for <= (right at same ts must be visible) — so right gets
    # side=0 and left side=1, and the window orders (ts, side); the carried
    # struct then includes same-ts right rows for the left row.
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(rts).alias("__rts"), *[F.col(c).alias(out_names[c]) for c in payload]
        ).alias("__r"),
    )
    # deterministic tiebreak among right rows sharing (key, ts): hash of the
    # carried payload — the SAME total order drives the window sort and the
    # bucketed path's max_by, so both paths pick the same winner on exact
    # ties.  xxhash64 rejects MapType anywhere in its input (Spark 3+), so
    # the hash covers only the hashable payload fields; rows that tie on
    # (key, ts) AND on every hashable field fall back to engine order.
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _hashable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return _hashable(dt.elementType)
        return True

    rtype = r.schema["__r"].dataType
    tb_fields = [f.name for f in rtype.fields if _hashable(f.dataType)]
    r = r.withColumn(
        "__tb",
        F.xxhash64(*[F.col(f"__r.{n}") for n in tb_fields])
        if tb_fields else F.lit(0).cast("long"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.lit(None).cast("long").alias("__tb"),
    )
    for c in left.columns:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.select(*l.columns)  # align column order for the union

    if bucket is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = l.unionByName(r).withColumn(
            "__last", F.last("__r", ignorenulls=True).over(w)
        )
    else:
        bkt = lambda c: F.window(c, bucket)["start"]  # noqa: E731
        lb = l.withColumn("__b", bkt(F.col("__ts")))
        rb = r.withColumn("__b", bkt(F.col("__ts")))
        # 1. tiny per-(key, bucket) summary of the latest right row —
        #    (ts, tiebreak) ordering matches the window sort exactly
        summary = rb.groupBy(*keys, "__b").agg(
            F.max_by("__r", F.struct(F.col("__ts"), F.col("__tb"))).alias("__r0")
        )
        # 2. bucket universe = every (key, bucket) either side touches, so
        #    left-only buckets still receive a carry-in
        universe = (
            lb.select(*keys, "__b").unionByName(rb.select(*keys, "__b")).distinct()
        )
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__b").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_in = (
            universe.join(summary, [*keys, "__b"], "left")
            .withColumn("__r0", F.last("__r0", ignorenulls=True).over(wb))
            .filter(F.col("__r0").isNotNull())
        )
        # 3. seed each bucket with its carry-in: sorts first in the bucket
        #    (ts = bucket start, side -1 loses to a real right row there)
        seeds = carry_in.select(
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left.columns if c not in keys],
            *[F.col(k) for k in keys],
            F.col("__b").alias("__ts"),
            F.lit(-1).alias("__side"),
            F.col("__r0").alias("__r"),
            F.lit(None).cast("long").alias("__tb"),
            F.col("__b"),
        ).select(*lb.columns)
        w = (
            Window.partitionBy(*keys, "__b")
            .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = (
            lb.unionByName(rb)
            .unionByName(seeds)
            .withColumn("__last", F.last("__r", ignorenulls=True).over(w))
            .drop("__b")
        )
    out = carried.filter(F.col("__side") == 1)

    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        fresh = F.col("__last.__rts") >= (F.col("__ts") - tol)
        out = out.withColumn(
            "__last", F.when(fresh, F.col("__last")).otherwise(F.lit(None))
        )

    result = out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__last.{out_names[c]}").alias(out_names[c]) for c in payload],
    )
    return result


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket: Column | str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows containing it:
    ``points.on == intervals.on AND lo <= point <= hi``.

    ``bucket``: bucket width as a SQL expression string or Column — an
    interval spanning B buckets emits B candidate rows.  Pick it near the
    typical interval length: smaller ⇒ more explode duplicates, larger ⇒
    more false candidates per bucket.  ``None`` ⇒ plain theta-join (fine
    when one side broadcasts; at scale always set a bucket).

    Numeric or timestamp axes both work (timestamps bucket via epoch
    seconds).  ``how``: "inner" or "left" (points without any containing
    interval kept with NULLs).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")

    pcol, lo, hi = F.col(point_col), F.col(lo_col), F.col(hi_col)
    if bucket is None:
        # qualified refs: a column name shared by both sides (common for
        # 'ts'-style axes) would make the unqualified predicate ambiguous
        contains = (intervals[lo_col] <= points[point_col]) & (
            points[point_col] <= intervals[hi_col]
        )
        cond = [points[k] == intervals[k] for k in keys] + [contains]
        return points.join(intervals, cond, how)

    b = F.expr(bucket) if isinstance(bucket, str) else bucket

    from pyspark.sql.types import TimestampNTZType

    def _bnum(c: Column, dtype) -> Column:
        # timestamps bucket on epoch seconds (cast → double); numerics
        # directly.  NTZ forbids the direct double cast — go through
        # TIMESTAMP first (session-tz interpretation; monotone under the
        # UTC sessions this engine standardizes on).
        if isinstance(dtype, TimestampNTZType):
            c = c.cast("timestamp")
        return F.floor(c.cast("double") / b.cast("double")).cast("long")

    p = points.withColumn(
        "__b", _bnum(pcol, points.schema[point_col].dataType)
    )
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                _bnum(lo, intervals.schema[lo_col].dataType),
                _bnum(hi, intervals.schema[hi_col].dataType),
            )
        ),
    )
    contains = (iv[lo_col] <= p[point_col]) & (p[point_col] <= iv[hi_col])
    cond = [p[k] == iv[k] for k in keys] + [p["__b"] == iv["__b"], contains]
    joined = p.join(iv, cond, "inner").drop("__b")
    # drop the duplicated key columns from the interval side
    for k in keys:
        joined = joined.drop(iv[k])
    if how == "inner":
        return joined
    # left: re-attach points that matched no interval
    matched = joined
    missing = p.drop("__b").join(
        matched.select(*[F.col(k) for k in keys], F.col(point_col)).distinct(),
        keys + [point_col],
        "left_anti",
    )
    for c in matched.columns:
        if c not in missing.columns:
            missing = missing.withColumn(c, F.lit(None).cast(matched.schema[c].dataType))
    return matched.unionByName(missing.select(*matched.columns))


def gap_fill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    step: str = "1 day",
    value_cols: list[str] | None = None,
    fill: int | float | None = 0,
) -> DataFrame:
    """Time-series gap filling (date spine): emit one row per ``step``
    between each key's first and last bucket, filling absent buckets'
    ``value_cols`` with ``fill`` (None keeps NULL).  Input must already
    be bucketed — one row per (keys, ts) — e.g. the output of
    ``time_rollup``; downstream window functions (lag/lead, moving
    averages) then see a dense, regular series.

    Scale shape: the spine is built per key from a (min, max) aggregate
    — one map-side-combined shuffle producing ONE row per key — then a
    ``sequence()`` explode fans it out to the buckets (narrow, no
    shuffle, no cross join against a global calendar frame).  The final
    left join is keyed on (keys, bucket), the same partitioning the
    aggregate just produced.  Spine size is bounded per key by the
    key's own active range, never the global min/max — a key active for
    a week doesn't get ten years of empty rows.
    """
    # Rows with a NULL bucket timestamp can't be placed on a spine: for a
    # key whose timestamps are ALL NULL, min/max aggregate to NULL and
    # sequence(NULL, NULL) explodes to nothing — silently dropping the
    # key.  Split them off and pass them through unfilled instead.
    null_ts = df.filter(F.col(ts_col).isNull())
    df = df.filter(F.col(ts_col).isNotNull())
    span = df.groupBy(*keys).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    spine = span.select(
        *keys,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"interval {step}"))
        ).alias(ts_col),
    ).alias("__spine")
    right = df.withColumn("__gf_present", F.lit(True)).alias("__src")
    # NULL-SAFE key equality: groupBy puts NULL-key rows in their own
    # spine group, and a plain equi-join would then never match them —
    # their real values would come back NULL and be overwritten by
    # ``fill`` (silent corruption).  eqNullSafe keeps NULL-key series
    # intact.
    cond = F.col(f"__spine.{ts_col}") == F.col(f"__src.{ts_col}")
    for k in keys:
        cond = cond & F.col(f"__spine.{k}").eqNullSafe(F.col(f"__src.{k}"))
    value_out = [
        c for c in df.columns if c not in (*keys, ts_col)
    ]
    out = spine.join(right, cond, "left").select(
        *[F.col(f"__spine.{k}") for k in keys],
        F.col(f"__spine.{ts_col}"),
        *[F.col(f"__src.{c}") for c in value_out],
        F.col("__src.__gf_present").alias("__gf_present"),
    )
    if fill is not None:
        # fill ONLY spine-generated absent buckets (join miss): a present
        # row whose value is genuinely NULL keeps its NULL — coalesce on
        # the value column alone would silently rewrite real NULL
        # measurements to the fill constant
        for c in value_cols or []:
            out = out.withColumn(
                c,
                F.when(F.col("__gf_present").isNull(), F.lit(fill)).otherwise(
                    F.col(c)
                ),
            )
    out = out.drop("__gf_present")
    # NULL-ts rows re-enter verbatim (no fill applied — they were never
    # absent, just unbucketable); column order matches ``out``.
    return out.unionByName(null_ts.select(*out.columns))


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
    tiebreak_col: str | None = None,
    max_points_per_key: int | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per key:
    ``ema_1 = x_1``, ``ema_i = alpha·x_i + (1−alpha)·ema_{i−1}`` in
    (ts, tiebreak) order — the smoothing no plain SQL window frame can
    express (each output depends on the previous OUTPUT, not a fixed
    frame of inputs).

    Scale shape: ONE shuffle on the key; the recurrence runs as a
    JVM-side array fold (``aggregate`` over the sorted event array —
    same shape as the funnel fold, no Python, no per-row window), then
    explodes back to one row per input.  Per-key state is the key's own
    event array — keys must fit an executor (same contract as any
    per-key sort); for million-event keys pre-aggregate to coarser
    buckets first, or set ``max_points_per_key`` to keep only each
    key's earliest N points (spillable-sort pre-filter — bounded task
    memory under arbitrary skew; later points are dropped).

    ``alpha`` values exactly representable in binary (0.5, 0.25, 0.125,
    0.75…) make the fold bit-reproducible across engines.

    NULL values carry the state: their output ema equals the previous
    element's (NULL before the first real value), and the recurrence
    resumes from that state — never a silent restart.
    

    NOTE: like the other per-key fold analytics (funnel, top_paths) this
    RESHAPES the frame — the output carries only key/ts/value/out
    columns at daily-bucket grain; columns outside the fold are
    intentionally not carried through (there is no well-defined value
    for them after bucketing).  Join the result back by (keys, ts) to
    re-attach document- or event-level attributes.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"ewma: alpha must be in (0, 1], got {alpha}")
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    if max_points_per_key is not None:
        # hot-key guard: keep only each key's EARLIEST N points via a
        # spillable row_number sort, so the per-key array (and its fold)
        # is bounded regardless of skew; later points are dropped — the
        # recurrence for the retained prefix is unchanged (it only ever
        # depends on earlier points)
        if max_points_per_key < 1:
            raise ValueError("ewma: max_points_per_key must be >= 1")
        wg = Window.partitionBy(*key_cols).orderBy(F.col(ts_col), tb)
        df = (
            df.withColumn("__rn", F.row_number().over(wg))
            .filter(F.col("__rn") <= max_points_per_key)
            .drop("__rn")
        )
    ev = F.struct(
        F.col(ts_col).alias("t"), tb.alias("b"),
        F.col(value_col).cast("double").alias("x"),
    )
    folded = (
        df.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list(ev)).alias("__evs"))
        .withColumn(
            "__emas",
            F.aggregate(
                "__evs",
                F.array().cast("array<double>"),
                # NULL handling: a NULL value CARRIES the state (its output
                # ema = the previous ema, possibly NULL at the head) — a
                # naive coalesce would silently RESTART the recurrence at
                # the next real value, discarding all accumulated smoothing
                lambda acc, e: F.concat(
                    acc,
                    F.array(
                        F.when(
                            e["x"].isNull(), F.try_element_at(acc, F.lit(-1))
                        ).otherwise(
                            F.coalesce(
                                F.lit(alpha) * e["x"]
                                + F.lit(1.0 - alpha)
                                * F.try_element_at(acc, F.lit(-1)),
                                e["x"],  # first real element: ema = x
                            )
                        )
                    ),
                ),
            ),
        )
    )
    pair = F.arrays_zip("__evs", "__emas")
    out = folded.select(
        *key_cols, F.explode(pair).alias("__p")
    ).select(
        *key_cols,
        F.col("__p.__evs.t").alias(ts_col),
        F.col("__p.__evs.x").alias(value_col),
        F.col("__p.__emas").alias(out_col),
    )
    return out


def cusum(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    threshold: int,
    target: int | None = None,
    out_col: str = "cusum",
    flag_col: str = "is_shift",
    max_points_per_key: int | None = None,
) -> DataFrame:
    """One-sided (upper) CUSUM changepoint detector per key:
    ``s_0 = 0``, ``s_i = max(0, s_{i-1} + x_i - k)`` over the key's series
    in ``ts`` order, flagging points where ``s_i > threshold`` — the
    standard cumulative-sum drift/level-shift alarm (Page 1954).  Like
    ``ewma`` the recurrence depends on the previous OUTPUT (the ``max(0,·)``
    reset), so no plain SQL window frame expresses it.

    Values are cast to BIGINT and the whole fold runs in exact integer
    arithmetic — bit-reproducible across engines (feed pre-bucketed counts
    or integer-scaled metrics, not raw doubles).  ``target`` is the
    reference level ``k``; when None it defaults to each key's integer-mean
    ``sum(x) div count(x)`` computed in the same aggregation (no extra
    shuffle, deterministic).

    Scale shape: identical to ``ewma`` — ONE shuffle on the key, JVM-side
    sorted-array fold, explode back to one row per input.  Feed
    pre-aggregated series (daily/hourly buckets), never raw events: the
    per-key array must fit an executor.  ``max_points_per_key`` is the
    hot-key guard (earliest-N spillable pre-filter, same contract as
    ``ewma``).  NULL values carry the state (output = previous cusum,
    0 at the head) rather than resetting the alarm.  ``ts_col`` must be
    non-NULL: Spark's sort_array places a NULL timestamp FIRST while SQL
    engines default to NULLS LAST, so a NULL-ts point silently diverges
    the whole series from any external recomputation — drop or impute
    NULL buckets upstream (the harness query filters them).

    Reference parity: the reference engine has no changepoint operator —
    this extends the analytics tier (SURVEY §2 extensions) alongside
    ewma/psi_drift for training-data drift monitoring.
    """
    if max_points_per_key is not None:
        if max_points_per_key < 1:
            raise ValueError("cusum: max_points_per_key must be >= 1")
        wg = Window.partitionBy(*key_cols).orderBy(F.col(ts_col))
        df = (
            df.withColumn("__rn", F.row_number().over(wg))
            .filter(F.col("__rn") <= max_points_per_key)
            .drop("__rn")
        )
    # try_cast, not cast: under ANSI (Spark 4 default) a NaN/garbage value
    # would abort the whole job; here it becomes NULL and carries the state
    # like any other NULL measurement — and it must not inflate the default
    # target's denominator either (count the CAST value, not the raw column)
    xval = F.col(value_col).try_cast("long")
    ev = F.struct(F.col(ts_col).alias("t"), xval.alias("x"))
    folded = df.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(ev)).alias("__evs"),
        F.sum(xval).alias("__tot"),
        F.count(xval).alias("__n"),
    )
    k = (
        F.lit(int(target))
        if target is not None
        # integer mean: deterministic, exact, computed in the same agg;
        # __n = 0 (no castable value) would be an ANSI div-by-zero — the
        # target is irrelevant then (every point carries NULL state)
        else F.when(F.col("__n") > 0, F.expr("__tot div __n")).otherwise(
            F.lit(0)
        )
    )
    folded = folded.withColumn(
        "__sums",
        F.aggregate(
            "__evs",
            F.array().cast("array<bigint>"),
            # NULL x carries the state (previous cusum, 0 at the head);
            # a real x advances it with the max(0, ·) reset
            lambda acc, e: F.concat(
                acc,
                F.array(
                    F.when(
                        e["x"].isNull(),
                        F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0)),
                    ).otherwise(
                        F.greatest(
                            F.lit(0).cast("bigint"),
                            F.coalesce(
                                F.try_element_at(acc, F.lit(-1)), F.lit(0)
                            )
                            + e["x"]
                            - k,
                        )
                    )
                ),
            ),
        ),
    )
    pair = F.arrays_zip("__evs", "__sums")
    return folded.select(
        *key_cols, F.explode(pair).alias("__p")
    ).select(
        *key_cols,
        F.col("__p.__evs.t").alias(ts_col),
        F.col("__p.__evs.x").alias(value_col),
        F.col("__p.__sums").alias(out_col),
        (F.col("__p.__sums") > F.lit(int(threshold)))
        .cast("int")
        .alias(flag_col),
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    window_buckets: int = 7,
    bucket: str = "day",
    group_cols: list[str] | None = None,
    out_col: str = "active",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Trailing-window distinct-entity count per time bucket — the
    WAU/MAU-style "active users in the last N days" metric, exactly.

    For every bucket ``d`` covered by the data, counts DISTINCT entities
    with ≥1 event in ``(d − window_buckets, d]``.  Output:
    ``(*group_cols, bucket_col, out_col)`` — one row per covered bucket
    (including trailing buckets whose window extends past the last event;
    filter to the observed range if undesired).  Rows with NULL ``ts``
    are EXCLUDED (no bucket is defined for them) — filter or impute
    upstream if they must count.

    Spark has no ``count_distinct`` over a window frame, and the naive
    day×day range self-join is O(days²) per entity.  The scalable shape:
    collapse to DISTINCT (entity, bucket) FIRST (events-per-entity-per-day
    never reach the fan-out), then explode each such pair onto the
    ``window_buckets`` buckets it covers (bounded, constant fan-out), then
    ONE count-distinct aggregation keyed by bucket.  Total intermediate
    rows = distinct(entity, bucket) × window — linear in the data with a
    small constant, shuffle-keyed on the covered bucket.

    ``bucket`` must be a unit ``date_trunc``/``sequence`` both accept
    ("day", "hour", "week"...).
    """
    if window_buckets < 1:
        raise ValueError("rolling_distinct: window_buckets must be >= 1")
    gcols = list(group_cols or [])
    if bucket_col in gcols or bucket_col in {"__e", "__b"}:
        raise ValueError(
            f"rolling_distinct: bucket_col {bucket_col!r} collides with a "
            "group column; rename via bucket_col="
        )
    step = f"interval 1 {bucket}"
    b = F.date_trunc(bucket, F.col(ts_col))
    pairs = (
        df.filter(F.col(ts_col).isNotNull())  # explicit, not via explode
        .select(*gcols, F.col(entity_col).alias("__e"), b.alias("__b"))
        .distinct()
    )
    covered = pairs.select(
        *gcols,
        "__e",
        F.explode(
            F.expr(
                f"sequence(__b, __b + {step} * {window_buckets - 1}, {step})"
            )
        ).alias(bucket_col),
    )
    return covered.groupBy(*gcols, bucket_col).agg(
        F.count_distinct("__e").alias(out_col)
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    out_col: str = "twap_micro",
) -> DataFrame:
    """Time-weighted average over an irregular series (TWAP): per key,
    ``Σ v_i·Δt_i / Σ Δt_i`` where ``Δt_i`` is the time each value was in
    force (until the NEXT observation) — the correct mean for sensor /
    price / gauge data sampled at uneven intervals, where a plain ``avg``
    over-weights bursts.

    Output: ``(*key_cols, n_points, t_first, t_last, dt_total_micros,
    out_col)`` with ``out_col`` the micro-scaled integer TWAP
    (``value ≈ out_col / 1e6``).  Exact-integer contract: values are
    captured as ``round(v·1e6)`` BIGINTs, Δt as integer microseconds, the
    dot product in DECIMAL(38,0) (v·Δt overflows BIGINT at month-scale
    gaps), the final ratio by integer division — bit-reproducible on any
    engine (same policy as the money math in ``corpus.py``).  The last
    observation has no successor and carries no weight (standard
    half-open convention); single-point keys yield NULL (no time span).
    NULL values or timestamps: the row is dropped from the integral —
    filter or impute upstream if they must count.

    Scale shape: one window shuffle on the key (the ``lead``), then an
    ordinary partial-aggregatable groupBy on the same key — Spark reuses
    the partitioning, so ONE exchange total.
    """
    micros = F.unix_micros(F.col(ts_col))
    v6 = F.expr(
        f"CAST(round(`{value_col}` * 1000000) AS BIGINT)"
    )
    # (__t, __v6) order: same-microsecond points would otherwise get an
    # engine-dependent lead order — and the one with dt=0 drops out of the
    # integral, so the tie MUST break identically everywhere
    w = Window.partitionBy(*key_cols).orderBy("__t", "__v6")
    pts = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .withColumn("__t", micros)
        .withColumn("__v6", v6)
        .withColumn("__dt", F.lead("__t").over(w) - F.col("__t"))
    )
    agg = pts.groupBy(*key_cols).agg(
        F.count("*").alias("n_points"),
        F.min(F.col(ts_col)).alias("t_first"),
        F.max(F.col(ts_col)).alias("t_last"),
        F.sum("__dt").alias("dt_total_micros"),
        F.sum(
            F.col("__v6").cast("decimal(38,0)") * F.col("__dt")
        ).alias("__num"),
    )
    return agg.withColumn(
        out_col,
        F.when(
            F.col("dt_total_micros") > 0,
            F.expr("CAST(__num div dt_total_micros AS BIGINT)"),
        ),
    ).drop("__num")


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "concurrent",
) -> DataFrame:
    """Sweep-line concurrency: for every instant the interval population
    changes, how many intervals are open — peak concurrent sessions,
    simultaneous calls, overlapping jobs.  Intervals are half-open
    ``[start, end)``: a session ending exactly when another starts does
    NOT overlap it.

    Output: one row per distinct change point ``(*group_cols, ts,
    out_col)`` where ``out_col`` is the open-interval count AT ``ts``
    (after all of that instant's starts and ends take effect).  Peak =
    ``max(out_col)`` per group.  Rows with NULL start are dropped; a NULL
    end means still-open (counts from start onward — the live-session
    case).

    Scale shape: explode each interval into a +1 (start) and −1 (end)
    delta — 2 rows per interval, constant fan-out — then ONE window
    shuffle for the running sum.  The default RANGE frame includes all
    peers of a timestamp, so every delta at the same instant sees the
    same final total (no tiebreak ordering needed — the half-open
    semantics fall out of summing starts and ends together), and the
    distinct() collapses peers to one row.  No interval×interval join
    anywhere — the naive overlap self-join is quadratic in the overlap
    degree; this is linear.
    """
    gcols = list(group_cols or [])
    base = df.filter(F.col(start_col).isNotNull())
    starts = base.select(
        *gcols, F.col(start_col).alias("ts"), F.lit(1).alias("__d")
    )
    ends = base.filter(F.col(end_col).isNotNull()).select(
        *gcols, F.col(end_col).alias("ts"), F.lit(-1).alias("__d")
    )
    deltas = starts.unionByName(ends)
    # default frame = RANGE UNBOUNDED PRECEDING..CURRENT ROW: includes ALL
    # rows at the same ts, so each instant carries its settled total
    w = Window.partitionBy(*gcols).orderBy("ts")
    return (
        deltas.withColumn(out_col, F.sum("__d").over(w).cast("long"))
        .drop("__d")
        .distinct()
    )


def seasonal_decompose(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    period: int,
    round_to: int = 6,
) -> DataFrame:
    """Classic additive seasonal decomposition per key:
    ``value = trend + seasonal + residual``.

    Expects a REGULAR series (one row per key per bucket — run
    :func:`gap_fill` first if the series has holes; the phase index is
    the row's rank in its key's timeline, so a missing bucket shifts
    every later phase).

    - **trend**: centered moving average of width ``period`` (the
      textbook 2×P weighted MA when ``period`` is even — mean of the
      two half-offset P-row averages); NULL at the edges where the full
      window doesn't exist, exactly like statsmodels.
    - **seasonal**: per-phase mean of the detrended series
      (phase = row_rank mod period), centered so phases sum to zero.
    - **residual**: the rest; NULL wherever trend is NULL.

    Scale shape: one shuffle on the key for the ordered windows, one
    (key, phase)-keyed aggregate of the detrended values (map-side
    combinable, ≤ ``period`` rows per key), one broadcastable join
    back.  All column math — no Python, no collect.
    """
    if period < 2:
        raise ValueError(f"seasonal_decompose: period must be >= 2, got {period}")
    half = period // 2
    wk = Window.partitionBy(*keys).orderBy(ts_col)
    x = F.col(value_col).cast("double")
    df2 = df.withColumn("__rn", F.row_number().over(wk) - 1)
    if period % 2:
        wma = wk.rowsBetween(-half, half)
        full = F.count(x).over(wma) == period
        trend = F.when(full, F.avg(x).over(wma))
    else:
        w1 = wk.rowsBetween(-half, half - 1)
        w2 = wk.rowsBetween(-half + 1, half)
        full = (F.count(x).over(w1) == period) & (
            F.count(x).over(w2) == period
        )
        trend = F.when(full, (F.avg(x).over(w1) + F.avg(x).over(w2)) / 2)
    df2 = df2.withColumn("__trend", trend)
    df2 = df2.withColumn("__phase", F.pmod(F.col("__rn"), F.lit(period)))
    seas = (
        df2.groupBy(*keys, "__phase")
        .agg(F.avg(x - F.col("__trend")).alias("__s_raw"))
    )
    wp = Window.partitionBy(*keys)
    seas = seas.withColumn(
        "__seasonal", F.col("__s_raw") - F.avg("__s_raw").over(wp)
    ).select(*keys, "__phase", "__seasonal")
    out = df2.join(seas, [*keys, "__phase"], "left")
    return (
        out.withColumn("trend", F.round("__trend", round_to))
        .withColumn("seasonal", F.round("__seasonal", round_to))
        .withColumn(
            "residual",
            F.round(x - F.col("__trend") - F.col("__seasonal"), round_to),
        )
        .drop("__rn", "__trend", "__phase", "__seasonal")
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    tolerance: Column | str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Forward as-of join: for every left row, the EARLIEST right row
    with ``right_ts >= left_ts`` sharing the key(s) — pandas
    ``merge_asof(direction="forward")``; no match ⇒ NULLs.

    Implemented by time negation over :func:`asof_join` (forward on t is
    backward on −t), so it inherits the whole backward contract: the
    single-sort scale shape, ``>=`` tie visibility, and the
    deterministic payload-hash tiebreak among right rows sharing
    (key, ts).  Timestamps negate via ``unix_micros``; numeric axes
    negate directly.  ``tolerance`` bounds how far AHEAD the match may
    be (string intervals are converted to microseconds on timestamp
    axes).  The hot-key ``bucket`` escape hatch is backward-only — the
    negated axis loses calendar alignment; pre-split hot keys upstream
    if needed.
    """
    from pyspark.sql.types import TimestampType, TimestampNTZType

    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    if "__negts" in left.columns or "__negts" in right.columns:
        raise ValueError("asof_join_forward reserves column name '__negts'")
    is_ts = isinstance(
        left.schema[left_ts].dataType, (TimestampType, TimestampNTZType)
    )

    def neg(c: Column) -> Column:
        return (-F.unix_micros(c)) if is_ts else (-c)

    tol = tolerance
    if tolerance is not None and is_ts:
        t = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        tol = F.unix_micros(F.timestamp_micros(F.lit(0)) + t)
    l2 = left.withColumn("__negts", neg(F.col(left_ts)))
    r2 = right.withColumn("__negts", neg(F.col(rts)))
    out = asof_join(l2, r2, keys, "__negts", "__negts",
                    tolerance=tol, suffix=suffix)
    return out.drop("__negts")
