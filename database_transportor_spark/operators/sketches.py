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
    "heavy_hitters",
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


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 10,
    exact: bool = True,
    support: float = 0.01,
) -> DataFrame:
    """Top-``k`` most frequent values of ``value_col`` (optionally per
    group), with deterministic (count desc, value asc) ordering.

    ``exact=True``: groupBy-count then rank — the count aggregation gets
    map-side combine (shuffle carries one row per distinct value per
    partition), and the rank window runs over the already-aggregated
    frequency table, which is |distinct| rows, not |input| rows.  For a
    global top-k (no groups) the final select is a TakeOrdered — no
    global sort materialization.

    ``exact=False``: pre-filter with ``DataFrame.freqItems`` (the
    Karp-Papadimitriou-Shenker one-pass heavy-hitters sketch, JVM-side)
    at ``support``, then count only the surviving candidate values —
    the two-pass "sketch to shortlist, count to verify" pattern that
    avoids shuffling the full distinct-value table when the value domain
    is huge (URLs, user agents) but the true heavy hitters are few.
    Only values above the support threshold are reliable; the second
    pass makes the reported counts exact.
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    src = df
    if not exact:
        if gcols:
            raise ValueError(
                "heavy_hitters: sketch mode (exact=False) is global-only; "
                "use exact=True for grouped top-k"
            )
        cand = df.freqItems([value_col], support).collect()[0][0]
        src = df.filter(F.col(value_col).isin(list(cand)))
    counts = src.groupBy(*gcols, value_col).agg(F.count("*").alias("n"))
    if gcols:
        w = Window.partitionBy(*gcols).orderBy(
            F.col("n").desc(), F.col(value_col).asc()
        )
        return (
            counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    # TakeOrdered pulls the k winners; the rank window then runs on a
    # k-row frame (single tiny partition), never the full value domain
    top = counts.orderBy(F.col("n").desc(), F.col(value_col).asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col(value_col).asc())
    return top.withColumn("rank", F.row_number().over(w))
