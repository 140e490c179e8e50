"""Data-layout operators: multi-dimensional clustering for scan pruning.

``zorder_key`` computes a Z-order (Morton) curve key over several numeric
columns; ``zorder_sort`` range-partitions and locally sorts by that key.
Writing a 100 TB table in Z-order means each output file covers a small
hyper-rectangle of the key space, so per-file min/max statistics prune
scans that filter on ANY prefix-free subset of the clustered columns —
the effect a single-column sort only gives the leading column.

Scale shape: the per-column (min, max) bounds are one tiny aggregate
(collected — bounded control-plane, 2 scalars per column); bucketing and
bit interleaving are pure integer expressions (narrow, codegen'd,
engine-portable); the only shuffle is the final range partition, which
any layout rewrite pays by definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_sort"]


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Integer bucket in [0, 2^bits) via min/max scaling — plain IEEE
    arithmetic (identical in any engine); a constant column collapses
    to bucket 0."""
    n = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        * F.lit(float(n))
        / F.lit(float(hi) - float(lo))
    )
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(n)).cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    out_col: str = "zkey",
) -> DataFrame:
    """Add the Morton key column: each of ``cols`` is min/max-bucketed to
    ``bits`` bits, then the bit planes are interleaved (column i
    contributes bit b to output position ``b*len(cols)+i``).  NULLs
    bucket to 0 (sort first — the usual stats-pruning convention).

    ``bits * len(cols)`` must fit a signed long (≤ 62).
    """
    if not cols:
        raise ValueError("zorder_key: need at least one column")
    if bits * len(cols) > 62:
        raise ValueError(
            f"zorder_key: {bits} bits x {len(cols)} cols exceeds a long"
        )
    if out_col in df.columns:
        # silently overwriting (and, in zorder_sort, later DROPPING) a
        # user column of the same name would commit a rewrite missing
        # that column's data
        raise ValueError(
            f"zorder_key: column {out_col!r} already exists; pass out_col"
        )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]  # bounded: 2 scalars per column

    buckets = []
    for c in cols:
        lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
        lo = float(lo) if lo is not None else 0.0
        hi = float(hi) if hi is not None else 0.0
        buckets.append(F.coalesce(_bucket(F.col(c), lo, hi, bits), F.lit(0)))

    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, bk in enumerate(buckets):
            pos = b * len(cols) + i
            key = key + F.shiftleft(
                F.shiftright(bk, b).bitwiseAND(F.lit(1)), pos
            )
    return df.withColumn(out_col, key)


def zorder_sort(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster the frame along the Z-curve: range-partition on the key
    (so files cover disjoint key ranges) and sort within partitions.
    Pair with ``Catalog.write`` to materialize a scan-prunable layout.
    """
    key = "__zorder_key"
    while key in df.columns:  # never collide with user data
        key += "_"
    keyed = zorder_key(df, cols, bits, out_col=key)
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(parts, key)
        .sortWithinPartitions(key)
        .drop(key)
    )
