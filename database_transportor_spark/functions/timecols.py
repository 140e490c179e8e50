"""Event-time column normalization across fixture encodings.

The events fixture has shipped with three physical encodings of its
timestamp column, and library code must accept all of them:

- ``TIMESTAMP(NANOS)`` parquet, readable only as BIGINT nanoseconds under
  ``spark.sql.legacy.parquet.nanosAsLong`` (Spark's vectorized reader has
  no nanos vector type);
- ``TIMESTAMP(MICROS)`` with ``isAdjustedToUTC=false`` — Spark reads this
  as ``TIMESTAMP_NTZ``;
- a session-zoned ``TIMESTAMP``.

Everything downstream wants exactly one type: streaming watermarks REQUIRE
``TimestampType`` (``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` otherwise), and
epoch-second bucketing (``range_join``) casts through double, which NTZ
forbids.  :func:`normalize_event_time` maps all three encodings onto
``TimestampType``.

Epoch semantics: the fixture's naive wall times equal their UTC instants,
and these sessions run with a UTC session timezone, so the NTZ→TIMESTAMP
cast is both wall-time- and epoch-preserving (and the DuckDB oracle, which
reads the same parquet as a naive TIMESTAMP, stays value-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

__all__ = ["normalize_event_time"]


def normalize_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Return ``df`` with ``ts_col`` as a session-zoned ``TimestampType``.

    Accepts BIGINT epoch-nanoseconds (legacy ``nanosAsLong`` reads),
    ``TIMESTAMP_NTZ`` (micros parquet without UTC adjustment), or an
    already-normalized ``TIMESTAMP``.  Works on batch and streaming
    DataFrames alike (pure projection).
    """
    dt = df.schema[ts_col].dataType
    if isinstance(dt, TimestampType):
        return df
    if isinstance(dt, LongType):
        # integer division: double math rounds the microsecond up for large
        # nanos values and diverges from DuckDB's truncation
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    raise TypeError(
        f"column {ts_col!r} has unsupported event-time type {dt}; expected"
        " TIMESTAMP, TIMESTAMP_NTZ, or BIGINT epoch-nanoseconds"
    )
