"""Sketch / approximate aggregates — and their exact counterparts.

At 100 TB, exact ``count(distinct)`` and exact percentiles force a full
shuffle of the measured column; sketches answer the same questions with
bounded memory and a single map-side-combinable aggregation:

- :func:`approx_distinct` — HyperLogLog++ (``approx_count_distinct``),
  mergeable, relative error ``rsd``.
- :func:`approx_quantiles` — Greenwald-Khanna (``percentile_approx``),
  rank error ``1/accuracy``.
- :func:`grouped_median` / :func:`grouped_percentiles` — the exact
  versions (Spark ``percentile``), used as the oracle-checkable baseline
  and as the right choice when the group count is small.

All are built-in JVM aggregates — no Python, map-side partial merge, one
shuffle keyed by the group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "approx_distinct",
    "approx_quantiles",
    "grouped_median",
    "grouped_percentiles",
]


def approx_distinct(
    df: DataFrame, keys: list[str], col: str, rsd: float = 0.02,
    out_col: str = "approx_distinct",
) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias(out_col)
    )


def approx_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    probs = F.array(*[F.lit(p) for p in probabilities])
    return df.groupBy(*keys).agg(
        F.percentile_approx(col, probs, F.lit(accuracy)).alias("quantiles")
    )


def grouped_percentiles(
    df: DataFrame, keys: list[str], col: str, probabilities: list[float]
) -> DataFrame:
    """Exact interpolated percentiles per group (one sort-based aggregate)."""
    probs = F.array(*[F.lit(p) for p in probabilities])
    return df.groupBy(*keys).agg(F.percentile(col, probs).alias("percentiles"))


def grouped_median(
    df: DataFrame, keys: list[str], col: str, out_col: str = "median"
) -> DataFrame:
    return df.groupBy(*keys).agg(F.median(col).alias(out_col))
