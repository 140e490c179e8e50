"""Event-sequence analytics: funnel progression and cohort retention.

Batch analytics over an event stream table — the query shapes event
engines ship natively (ClickHouse ``windowFunnel``/``retention``) but
Spark has no built-in for.

Scale shapes
------------
- :func:`funnel` is ONE shuffle: events are pruned to the funnel's stage
  types at the scan (predicate pushdown), grouped per user, and each
  user's (small) sorted event array is folded JVM-side with
  ``F.aggregate`` — no per-stage join cascade, no Python in the loop.
  The per-user array is bounded by that user's stage-typed events; a
  pathological hot user is the same hot-key problem every per-entity
  analysis has (salt upstream if one user is a measurable share of the
  corpus).
- :func:`cohort_retention` is two aggregations and one equi-join on the
  user key, all co-partitioned; counts are exact (no sketches), and the
  final matrix is tiny (cohorts × offsets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel", "cohort_retention", "sessionize", "transition_matrix", "growth_accounting", "top_paths", "attribute_conversions"]


def transition_matrix(
    df: DataFrame,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """First-order event-transition matrix: for each ordered pair of
    consecutive events per entity, count ``from_type → to_type``
    occurrences and the conditional probability
    ``P(to | from) = n / Σ_to n`` — the Markov-chain view of user
    behavior (next-event prediction baselines, anomaly detection on
    improbable transitions, UX flow maps).

    ``tiebreak_col`` pins the order of same-timestamp events (without
    it, ``lead`` over a tied sort is nondeterministic — pass the event
    id).  Entities' last events have no successor and are excluded.

    Scale shape: one shuffle on ``entity_col`` for the ``lead`` window,
    then a ``groupBy`` on the (tiny, |types|²-sized) pair space with
    map-side combine; the probability normalization is a window over
    ``from_type`` on that already-aggregated frame — negligible.  The
    division is exact-integer / exact-integer (both engines produce the
    identically-rounded IEEE double), rounded anyway for safety.
    """
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    pairs = (
        df.select(
            F.col(entity_col),
            F.col(type_col).alias("from_type"),
            F.lead(F.col(type_col)).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    wf = Window.partitionBy("from_type")
    return counts.withColumn(
        "prob",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(wf),
            round_digits,
        ),
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a session id to EVERY event (the per-event complement of a
    session-window aggregate): a new session starts when the gap since
    the user's previous event exceeds ``gap``.

    Appends ``session_idx`` (0-based per user, chronological) and
    ``session_id`` (``"<user>:<idx>"``, globally unique).  One shuffle on
    the user key; the lag and the running sum share a single (user, ts)
    sort.  Equal-timestamp events order by timestamp alone — they always
    land in the same session (gap 0 ≤ any positive gap), so the
    assignment is deterministic even with duplicate timestamps.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap_expr = F.expr(f"INTERVAL {gap}") if "INTERVAL" not in gap.upper() else F.expr(gap)
    is_new = (
        F.col(ts_col) > F.lag(ts_col).over(w) + gap_expr
    )
    return (
        events.withColumn(
            "__new", F.when(F.lag(ts_col).over(w).isNull() | is_new, 1).otherwise(0)
        )
        .withColumn(
            "session_idx",
            (F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ) - 1).cast("long"),
        )
        .withColumn(
            "session_id",
            F.concat_ws(":", F.col(user_col).cast("string"), F.col("session_idx")),
        )
        .drop("__new")
    )


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    horizon: str | None = None,
    max_events_per_entity: int | None = None,
) -> DataFrame:
    """Earliest-completion funnel: per user, the earliest time each stage
    was reached IN ORDER — stage *i* counts only strictly after stage
    *i-1*'s matched time, and (with ``horizon``, e.g. ``"INTERVAL 1
    DAY"``) no later than ``t1 + horizon``.

    Returns one row per user having at least stage 1:
    ``(user, t1..tK, stages_completed)``.

    Greedy semantics (industry-standard ``windowFunnel`` caveat): the
    EARLIEST stage-1 event anchors the chain; a later stage-1 occurrence
    that would complete more stages within the horizon is not considered.

    ``max_events_per_entity`` is the hot-entity guard: a bot/test user
    holding a measurable share of the corpus would otherwise concentrate
    its whole event array into one aggregation buffer.  With the cap set,
    each entity keeps only its EARLIEST ``max_events_per_entity``
    stage-typed events (time order, type as tiebreak) via a spillable
    window sort — bounded task memory regardless of skew.  Semantics for
    entities under the cap are identical (the greedy funnel anchors at
    the earliest events anyway); a capped entity that would only have
    completed a stage after the cap reports fewer stages — the standard
    bounded-state trade every streaming funnel makes.
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    k = len(stages)
    tcols = [f"t{i + 1}" for i in range(k)]

    ev = events.filter(F.col(type_col).isin(list(stages))).select(
        F.col(user_col), F.col(ts_col).alias("__ts"), F.col(type_col).alias("__tp")
    )
    if max_events_per_entity is not None:
        if max_events_per_entity < 1:
            raise ValueError("funnel: max_events_per_entity must be >= 1")
        wg = Window.partitionBy(user_col).orderBy("__ts", "__tp")
        ev = (
            ev.withColumn("__rn", F.row_number().over(wg))
            .filter(F.col("__rn") <= max_events_per_entity)
            .drop("__rn")
        )
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct("__ts", "__tp"))).alias("__evs")
    )

    ts_type = events.schema[ts_col].dataType
    zero = F.struct(
        *[F.lit(None).cast(ts_type).alias(t) for t in tcols]
    )

    def step(acc: Column, e: Column) -> Column:
        fields = []
        in_horizon = (
            (e["__ts"] <= acc["t1"] + F.expr(horizon))
            if horizon is not None
            else F.lit(True)
        )
        for i, t in enumerate(tcols):
            cur = acc[t]
            if i == 0:
                hit = cur.isNull() & (e["__tp"] == stages[0])
            else:
                hit = (
                    cur.isNull()
                    & acc[tcols[i - 1]].isNotNull()
                    & (e["__tp"] == stages[i])
                    & (e["__ts"] > acc[tcols[i - 1]])
                    & in_horizon
                )
            fields.append(F.when(hit, e["__ts"]).otherwise(cur).alias(t))
        return F.struct(*fields)

    folded = per_user.select(
        user_col, F.aggregate("__evs", zero, step).alias("__f")
    )
    out = folded.select(
        user_col,
        *[F.col(f"__f.{t}").alias(t) for t in tcols],
        sum(
            [F.when(F.col(f"__f.{t}").isNotNull(), 1).otherwise(0) for t in tcols],
            F.lit(0),
        ).cast("long").alias("stages_completed"),
    )
    return out.filter(F.col("t1").isNotNull())


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the ``period`` of
    their FIRST event; for each (cohort, offset) the EXACT count of
    cohort users active ``offset`` periods later.

    Returns ``(cohort, offset, n_active)`` with offset 0 = the cohort
    period itself (n_active there = cohort size).
    """
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day, week, or month")
    per_days = {"day": 1, "week": 7}.get(period)

    first = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("__cohort")
    )
    active = (
        events.select(
            F.col(user_col), F.date_trunc(period, F.col(ts_col)).alias("__p")
        ).distinct()
    )
    joined = active.join(first, user_col)
    if period == "month":
        off = (
            (F.year("__p") - F.year("__cohort")) * 12
            + (F.month("__p") - F.month("__cohort"))
        ).cast("long")
    else:
        off = (
            F.datediff(F.to_date("__p"), F.to_date("__cohort")) / per_days
        ).cast("long")
    return (
        joined.select(F.col("__cohort").alias("cohort"), off.alias("offset"), user_col)
        .groupBy("cohort", "offset")
        .agg(F.count_distinct(F.col(user_col)).cast("long").alias("n_active"))
    )


def growth_accounting(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Per-period growth accounting over an event stream: for each time
    bucket, how many entities were active, how many were NEW (first ever
    seen in that bucket), how many were returning, and the cumulative
    distinct-entity count — the DAU/WAU "growth ledger" every product
    analytics stack reports.  Cumulative distinct users is NOT the sum of
    per-period actives (entities repeat); it IS the running sum of
    first-seen counts, which is how this computes it exactly without a
    giant distinct-over-growing-window.

    Output: ``(period, n_active, n_new, n_returning, cum_entities)``.
    Periods with activity but no new entities report ``n_new = 0``.

    Scale shape: two aggregations over the events — ``min(ts) per
    entity`` (one shuffle on the entity key, map-side combined) and
    ``count_distinct(entity) per period`` (one shuffle on the period) —
    then all remaining work (first-seen rollup, join, running sum) runs
    on period-count-sized frames; the running-sum window over an
    unpartitioned ORDER BY is bounded by the number of periods, not the
    corpus.
    """
    period = F.date_trunc(bucket, F.col(ts_col))
    active = df.groupBy(period.alias("period")).agg(
        F.count_distinct(F.col(entity_col)).alias("n_active")
    )
    first_seen = df.groupBy(entity_col).agg(F.min(ts_col).alias("__first"))
    new = first_seen.groupBy(
        F.date_trunc(bucket, F.col("__first")).alias("period")
    ).agg(F.count("*").alias("n_new"))
    merged = (
        active.join(new, "period", "left")
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0)).cast("long"))
        .withColumn("n_returning", (F.col("n_active") - F.col("n_new")).cast("long"))
    )
    w = Window.orderBy("period").rowsBetween(Window.unboundedPreceding, 0)
    return merged.withColumn(
        "cum_entities", F.sum("n_new").over(w).cast("long")
    ).select("period", "n_active", "n_new", "n_returning", "cum_entities")


def top_paths(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    max_len: int = 5,
    k: int = 20,
    tiebreak_col: str | None = None,
    sep: str = ">",
) -> DataFrame:
    """Path mining: the ``k`` most common event-type journeys, where a
    journey is each entity's first ``max_len`` events in time order
    joined with ``sep`` ("view>click>purchase").  The product-analytics
    view :func:`transition_matrix` can't give — transitions are
    memoryless, paths are not.

    Returns ``(path, n_users, rank)`` with a deterministic (count desc,
    path asc) order.

    Scale shape: ONE shuffle on the entity key — a row_number window
    (spillable sort) keeps only each entity's first ``max_len`` events
    BEFORE any array is built, so per-entity state is bounded at
    ``max_len`` by construction even for a pathological hot entity; the
    journey is then a tiny ``sort_array``/``collect_list`` per entity,
    the path frequency table a map-side-combined count whose cardinality
    is the number of distinct journeys, and the final top-k a
    TakeOrdered."""
    from pyspark.sql import Window

    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    ev = F.struct(
        F.col(ts_col).alias("t"), tb.alias("b"), F.col(type_col).alias("e")
    )
    # Hot-entity guard, by construction: only each entity's first
    # ``max_len`` events (by the same (t, b, e) order sort_array uses)
    # can appear in its path, so pre-filtering with a row_number window
    # — a SPILLABLE sort, unlike a collect_list buffer — bounds the
    # per-entity array at max_len regardless of how hot one entity is,
    # with bit-identical output to the slice-after-collect shape.
    wg = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), tb, F.col(type_col)
    )
    paths = (
        events.withColumn("__rn", F.row_number().over(wg))
        .filter(F.col("__rn") <= max_len)
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list(ev)).alias("__evs"))
        .select(
            F.array_join(
                F.transform(F.col("__evs"), lambda s: s["e"]),
                sep,
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count("*").alias("n_users"))
    top = counts.orderBy(F.col("n_users").desc(), F.col("path").asc()).limit(k)
    w = Window.orderBy(F.col("n_users").desc(), F.col("path").asc())
    return top.withColumn("rank", F.row_number().over(w))


def attribute_conversions(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    touch_types: list[str],
    conversion_type: str,
    value_col: str | None = None,
    model: str = "last",
    lookback_sec: int = 7 * 86400,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Marketing attribution: for every conversion event, credit the
    first or last touch event (``model``) of the same entity within the
    trailing ``lookback_sec`` window.  Returns one row per conversion:
    ``(user, conversion_ts, attributed_type, touch_ts, n_touches
    [, value])`` — conversions with no in-window touch report NULLs
    (directly measurable unattributed share).

    Scale shape: one RANGE window over exact integer microseconds per
    entity (the :func:`~database_transportor_spark.operators.temporal.
    rolling_agg` pattern) — the touch candidates are min/max'd INSIDE
    the frame as (ts, tiebreak, type) structs, so there is no
    touches-to-conversions join at all, no fan-out, one shuffle on the
    entity key.
    """
    if model not in ("first", "last"):
        raise ValueError(f"attribute_conversions: model must be first|last, got {model!r}")
    from pyspark.sql import Window

    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    is_touch = F.col(type_col).isin(list(touch_types))
    touch = F.when(
        is_touch,
        F.struct(F.col(ts_col).alias("t"), tb.alias("b"),
                 F.col(type_col).alias("e")),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-int(lookback_sec) * 1_000_000, 0)
    )
    pick = F.min(touch).over(w) if model == "first" else F.max(touch).over(w)
    scored = (
        events.withColumn("__touch", pick)
        .withColumn("__n_touches", F.count(touch).over(w).cast("long"))
        .filter(F.col(type_col) == conversion_type)
    )
    out = scored.select(
        F.col(user_col),
        F.col(ts_col).alias("conversion_ts"),
        F.col(f"__touch.e").alias("attributed_type"),
        F.col(f"__touch.t").alias("touch_ts"),
        F.col("__n_touches").alias("n_touches"),
        *([F.col(value_col).alias("value")] if value_col else []),
    )
    return out
