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

__all__ = ["compact_table", "profile_table", "column_histogram", "expire_rows", "corr_matrix", "null_patterns", "file_stats", "pruning_report"]


def compact_table(
    catalog,
    table: str,
    target_file_bytes: int = 128 << 20,
    zorder_cols: list[str] | None = None,
    zorder_bits: int = 10,
) -> int:
    """Rewrite ``table`` into ``ceil(current_bytes / target_file_bytes)``
    files (min 1) via the catalog's staged swap; returns the file count
    written.  Sizing reads the local filesystem (fixture/bench layout) —
    a non-local path (``s3://``, ``hdfs://``...) raises rather than
    silently sizing to one file; on object stores pre-repartition
    explicitly or extend with the Hadoop FileSystem API.

    ``zorder_cols`` additionally clusters the rewrite along the Morton
    curve of those columns (``operators/layout.py:zorder_sort``): files
    then cover disjoint key ranges and per-file min/max stats prune
    scans filtering on ANY of the clustered columns — compaction and
    layout optimization in the same single rewrite.
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
    if zorder_cols:
        from .layout import zorder_sort

        out = zorder_sort(df, zorder_cols, bits=zorder_bits, num_partitions=n)
    else:
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


def column_histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column:
    ``(bucket, n, bucket_lo, bucket_hi)`` with Postgres ``width_bucket``
    semantics — bucket 0 holds values below ``lo``, bucket ``bins+1``
    values at/above ``hi``, NULLs are excluded.  The distribution report
    a human wants next to :func:`profile_table`'s min/max.

    Bounds: pass ``lo``/``hi`` for a one-pass plan (the 100 TB mode — at
    scale you know the domain or take it from table stats); omitted
    bounds cost one extra min/max aggregation over the column.

    Shape: one ``groupBy(bucket)`` — a hash shuffle of at most
    ``bins + 2`` groups, map-side combined.
    """
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
        if row["lo"] is None or row["hi"] is None:
            raise ValueError(
                f"column_histogram: {value_col!r} is empty or all-NULL — "
                "no bounds to infer (pass lo/hi explicitly)"
            )
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if not hi > lo:
        raise ValueError(f"column_histogram: need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / bins
    bucket = F.width_bucket(v, F.lit(float(lo)), F.lit(float(hi)), F.lit(bins))
    return (
        df.filter(v.isNotNull())
        .groupBy(bucket.cast("long").alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn(
            "bucket_lo",
            F.round(F.lit(lo) + (F.col("bucket") - 1) * F.lit(width), 6),
        )
        .withColumn(
            "bucket_hi", F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6)
        )
    )


def expire_rows(
    catalog,
    table: str,
    condition: str,
) -> int:
    """Retention/TTL enforcement: atomically rewrite ``table`` WITHOUT
    the rows matching ``condition`` (a SQL boolean expression, e.g.
    ``"ts < timestamp'2025-01-01'"`` or ``"is_deleted"``) through the
    same staged swap every other write uses — readers never observe a
    half-expired table.  Returns the number of rows removed (one count
    on the small expired side; the surviving side is never counted).

    Scale shape: a pushdown-eligible anti-filter scan plus the rewrite
    any retention pass must pay; no shuffle beyond the write layout.
    """
    df = catalog.read(table)
    expired = df.filter(condition)
    n = expired.count()
    if n == 0:
        return 0
    # NULL-condition rows must be KEPT, matching the expired side's
    # three-valued logic (filter(cond) skips NULLs) — a bare NOT(cond)
    # would silently drop them
    catalog.write_staged(
        df.filter(f"NOT coalesce(({condition}), false)"), table
    )
    catalog.commit_staged(table)
    return n


def corr_matrix(
    df: DataFrame,
    cols: list[str],
    round_digits: int = 6,
) -> DataFrame:
    """All pairwise Pearson correlations of ``cols`` in ONE aggregation
    pass: ``(col_a, col_b, n, r)`` for every a < b pair — the numeric-
    relationship profile next to :func:`profile_table`'s univariate
    stats, at one table scan for ANY number of columns (k columns =
    k + k(k+1)/2 sum expressions in a single agg, never a scan per
    pair like repeated ``df.stat.corr`` calls).

    Sums run in DECIMAL(38,0) over integer-cast inputs — exact and
    order-independent, so r is bit-stable across partitionings and
    engines (float sums would drift with accumulation order).  Rows
    with a NULL in either column of a pair are excluded pairwise.
    Integer-valued inputs only (cents-ize money first); the correlation
    of scaled columns equals the unscaled correlation.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least two columns")
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    aggs = []
    names = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            both = F.col(a).isNotNull() & F.col(b).isNotNull()
            pa = F.when(both, d(a))
            pb = F.when(both, d(b))
            tag = f"{i}_{cols.index(b)}"
            aggs += [
                F.count(F.when(both, 1)).cast("long").alias(f"__n{tag}"),
                F.sum(pa).alias(f"__sx{tag}"),
                F.sum(pb).alias(f"__sy{tag}"),
                F.sum(pa * pa).alias(f"__sxx{tag}"),
                F.sum(pb * pb).alias(f"__syy{tag}"),
                F.sum(pa * pb).alias(f"__sxy{tag}"),
            ]
            names.append((a, b, tag))
    one = df.agg(*aggs)

    def r_expr(tag):
        n = F.col(f"__n{tag}").cast("double")
        sx = F.col(f"__sx{tag}").cast("double")
        sy = F.col(f"__sy{tag}").cast("double")
        sxx = F.col(f"__sxx{tag}").cast("double")
        syy = F.col(f"__syy{tag}").cast("double")
        sxy = F.col(f"__sxy{tag}").cast("double")
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        return F.round(F.when(den != 0, num / den), round_digits)

    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.col(f"__n{t}").alias("n"),
                        r_expr(t).alias("r"),
                    )
                    for a, b, t in names
                ]
            )
        ).alias("p")
    ).select("p.*")


def null_patterns(df, cols=None):
    """Missingness-pattern census: one row per observed NULL-combination
    with exact counts — the multi-column companion to
    :func:`profile_table`'s per-column null counts (two columns can each
    be 10% NULL jointly or disjointly; imputation strategy depends on
    which).

    Output: ``(pattern, n_rows, share_ppm)`` where ``pattern`` is the
    comma-joined names of the NULL columns in ``cols`` order ('' = a
    complete row) and ``share_ppm`` is the exact integer row share in
    parts-per-million.

    Scale shape: ONE conditional-aggregation scan — the pattern string is
    computed per row (``concat_ws`` skips NULL parts on every major
    engine) and hash-aggregated with map-side combine; the share divides
    through a windowed total over the pattern-count-sized aggregate
    (≤2^|cols| rows, single tiny task), never a second scan of the data.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    names = list(df.columns if cols is None else cols)
    if not names:
        raise ValueError("null_patterns: need at least one column")
    pattern = F.concat_ws(
        ",", *[F.when(F.col(c).isNull(), F.lit(c)) for c in names]
    )
    agg = df.groupBy(pattern.alias("pattern")).agg(
        F.count("*").alias("n_rows")
    )
    return (
        agg.withColumn(
            "__total", F.sum("n_rows").over(Window.partitionBy())
        )
        .withColumn("share_ppm", F.expr("n_rows * 1000000 div __total"))
        .drop("__total")
    )


def file_stats(df, cols):
    """Per-file zone-map view of a file-backed DataFrame: one row per
    underlying file with row count plus min/max/null-count for each of
    ``cols`` — exactly the statistics a format-level reader (parquet
    footers, Delta/Iceberg manifests) uses for data skipping, computed
    here engine-side via Spark's hidden ``_metadata.file_path`` column
    so the report works for ANY file source Spark can read.

    One scan, one map-side-combinable aggregate keyed by file.  Columns:
    ``file`` (full path — basenames are NOT unique: one task writing a
    partitioned layout reuses its task UUID across partition dirs),
    ``n_rows``, and ``<c>_min / <c>_max / <c>_nulls`` per column.
    """
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
        ]
    return (
        df.select("*", F.col("_metadata.file_path").alias("__fp"))
        .groupBy(F.col("__fp").alias("file"))
        .agg(*aggs)
    )


def pruning_report(df, col, lo, hi):
    """Data-skipping effectiveness for the range predicate
    ``col BETWEEN lo AND hi``: how many files a min/max-pruning reader
    would skip outright.  One row: ``files_total``, ``files_skippable``,
    ``rows_total``, ``rows_skippable`` (rows inside skippable files).

    A file is skippable iff its [min, max] envelope misses the query
    range entirely (NULL-only files are skippable for a range
    predicate).  This quantifies what a layout rewrite buys BEFORE
    committing to it — run it on the current table, then on a
    ``zorder_sort`` rewrite, and compare: clustered layouts turn range
    scans from full-corpus reads into a handful of files, which at
    100 TB is the difference between seconds and hours.
    """
    stats = file_stats(df, [col])
    skippable = (
        F.col(f"{col}_max").isNull()
        | (F.col(f"{col}_max") < lo)
        | (F.col(f"{col}_min") > hi)
    )
    return stats.agg(
        F.count("*").alias("files_total"),
        F.sum(skippable.cast("long")).alias("files_skippable"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(F.when(skippable, F.col("n_rows")).otherwise(0)).alias(
            "rows_skippable"
        ),
    )
