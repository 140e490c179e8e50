"""Table maintenance: small-file compaction and ANALYZE-style profiling.

Operational companions to the transport engine:

- :func:`compact_table` — streaming/incremental sinks (``merge_sink``,
  ``do_incremental_transport``) accrete small files; scan cost at 100 TB
  is dominated by file count once files shrink below a row group.
  Compaction rewrites the table into ~``target_file_bytes`` files through
  the same staged swap every other write uses, so readers never see a
  half-compacted table.
- :func:`profile_table` — one aggregation pass computing per-column
  null counts, distinct counts (HLL++ by default, exact on demand), and
  min/max — the stats a human checks after a migration and a scheduler
  feeds into sizing decisions.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["compact_table", "profile_table"]


def compact_table(
    catalog,
    table: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Rewrite ``table`` into ``ceil(current_bytes / target_file_bytes)``
    files (min 1) via the catalog's staged swap; returns the file count
    written.  Sizing reads the local filesystem (fixture/bench layout) —
    a non-local path (``s3://``, ``hdfs://``...) raises rather than
    silently sizing to one file; on object stores pre-repartition
    explicitly or extend with the Hadoop FileSystem API.
    """
    path = catalog.path(table)
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme not in ("", "file"):
        raise ValueError(
            f"compact_table: cannot size {path!r} — only local paths are "
            "supported; pre-repartition explicitly for scheme "
            f"{scheme!r} or extend sizing via the Hadoop FileSystem API"
        )
    local = path.split("://", 1)[1] if scheme == "file" else path
    if os.path.isfile(local):
        # single-file table (e.g. an external DuckDB COPY) — os.walk
        # yields nothing for a file path, which would undersize to n=1
        total = os.path.getsize(local)
    else:
        total = 0
        for dirpath, _, files in os.walk(local):
            for f in files:
                if not f.startswith(("_", ".")):
                    total += os.path.getsize(os.path.join(dirpath, f))
    n = max(1, math.ceil(total / target_file_bytes))
    df = catalog.read(table)
    # coalesce when shrinking (no shuffle); repartition only if growing
    current = df.rdd.getNumPartitions()
    out = df.coalesce(n) if n <= current else df.repartition(n)
    catalog.write_staged(out, table)
    catalog.commit_staged(table)
    return n


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column stats in ONE aggregation pass over the table:
    ``(column, dtype, n_rows, n_nulls, n_distinct, min_value, max_value)``
    — min/max rendered as strings so the report has a uniform schema.

    ``exact_distinct=False`` (default) uses HLL++ (``rsd`` relative
    error) — the 100 TB mode: one scan, no shuffle-per-column.  ``True``
    switches to exact ``count_distinct`` (Spark plans one expand +
    shuffle) for audit-grade numbers on bounded tables.
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count("*").cast("long").alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        nd = (
            F.count_distinct(col)
            if exact_distinct
            else F.approx_count_distinct(col, rsd)
        )
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias(f"__nu{i}"),
            nd.cast("long").alias(f"__nd{i}"),
            F.min(col).cast("string").alias(f"__mi{i}"),
            F.max(col).cast("string").alias(f"__ma{i}"),
        ]
    one = df.agg(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.lit(dtypes[c]).alias("dtype"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__nu{i}").alias("n_nulls"),
                        F.col(f"__nd{i}").alias("n_distinct"),
                        F.col(f"__mi{i}").alias("min_value"),
                        F.col(f"__ma{i}").alias("max_value"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("r")
    ).select("r.*")
