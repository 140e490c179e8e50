"""Event-stream operators: tumbling-window aggregation and per-key top-N.

Batch and Structured Streaming share the same aggregation expression; the
streaming variant adds a watermark for late data and runs with any source/
trigger (tests use ``availableNow`` over the parquet fixture, production
would use Kafka/files).  State size is bounded by the watermark horizon —
the knob that matters at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["tumbling_agg", "stream_tumbling_agg", "topn_per_key"]


def _window_aggs() -> list:
    return [
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling-window aggregate (batch).  ``window_start`` is the epoch-
    aligned window open — identical to ``date_trunc`` for aligned widths,
    which keeps the DuckDB oracle expressible."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("__w"), F.col(key_col)
        )
        .agg(*_window_aggs())
        .select(
            F.col("__w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def stream_tumbling_agg(
    spark: SparkSession,
    source_dir: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    sink_table: str = "stream_window_agg",
) -> DataFrame:
    """Structured Streaming variant, run to completion with ``availableNow``
    and a memory sink; returns the resulting batch DataFrame.

    The watermark bounds aggregation state (late events beyond it are
    dropped); ``complete`` output mode re-emits finalized windows, which the
    memory sink snapshots.  With a terminating trigger the result equals
    the batch :func:`tumbling_agg` over the same input — letting the DuckDB
    oracle check a genuinely streamed execution.
    """
    import os

    from pyspark.sql.types import LongType

    batch_df = spark.read.parquet(source_dir)
    # FileStreamSource requires a directory; a single-file fixture path is
    # split into (dir, glob) so the same code serves both layouts.
    reader = spark.readStream.schema(batch_df.schema).option("maxFilesPerTrigger", 1)
    if source_dir.endswith(".parquet") and os.path.isfile(source_dir):
        reader = reader.option("pathGlobFilter", os.path.basename(source_dir))
        stream = reader.parquet(os.path.dirname(source_dir))
    else:
        stream = reader.parquet(source_dir)
    if isinstance(stream.schema[ts_col].dataType, LongType):
        # fixture adapter: nanosecond-timestamp parquet read as long
        # (spark.sql.legacy.parquet.nanosAsLong) → microsecond timestamp
        stream = stream.withColumn(
            ts_col, F.timestamp_micros((F.col(ts_col) / 1000).cast("long"))
        )
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("__w"), F.col(key_col))
        .agg(*_window_aggs())
        .select(
            F.col("__w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def topn_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Top-N rows per key (deterministic tiebreak on ``id_col``) — the
    rank-within-partition shape (one shuffle on the key)."""
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).desc(), F.col(id_col))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
    )
