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

(avg is derived as sum/count at read time — never merged directly.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_rollup", "MERGEABLE"]

MERGEABLE = {
    "count": (lambda c: F.count("*"), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def time_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    measures: dict[str, tuple[str, str | None]],
    levels: list[str],
) -> dict[str, DataFrame]:
    """Build the rollup hierarchy.

    ``measures``: output name → (agg, source col) with agg in
    :data:`MERGEABLE` (source col ignored for count).
    ``levels``: window widths coarse-ward, e.g. ``["1 minute", "1 hour",
    "1 day"]`` — each must evenly nest in the next (minute boundaries align
    with hour boundaries etc.), which is what makes merge-from-previous
    exact.

    Returns {level: DataFrame} where each frame has ``bucket_start``,
    ``keys...`` and the measure columns.
    """
    for name, (agg, _col) in measures.items():
        if agg not in MERGEABLE:
            raise ValueError(
                f"measure {name!r}: {agg!r} is not decomposable "
                f"(supported: {sorted(MERGEABLE)})"
            )

    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    prev_ts = ts_col
    for level in levels:
        src = df if prev is None else prev
        bucket = F.window(F.col(prev_ts), level).getField("start")
        if prev is None:
            aggs = [
                MERGEABLE[agg][0](col).alias(name)
                for name, (agg, col) in measures.items()
            ]
        else:
            aggs = [
                MERGEABLE[agg][1](name).alias(name)
                for name, (agg, _col) in measures.items()
            ]
        cur = (
            src.groupBy(bucket.alias("bucket_start"), *keys)
            .agg(*aggs)
        )
        out[level] = cur
        prev = cur
        prev_ts = "bucket_start"
    return out
