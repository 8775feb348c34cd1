"""Type-agnostic event-time access for the ``events`` feed.

The driver regenerates ``events.parquet`` between rounds and has shipped the
``ts`` column under two different encodings so far:

- parquet TIMESTAMP(NANOS) — which Spark (with
  ``spark.sql.legacy.parquet.nanosAsLong=true``, set in session.py and
  testdata.py) surfaces as **long nanoseconds**;
- parquet ``timestamp[us]`` — which Spark surfaces as **TIMESTAMP_NTZ**
  (or TIMESTAMP, depending on ``parquet.inferTimestampNTZ``).

Every event-time consumer (batch sessionization, streaming rollup/dedup,
stateful sessionize) must therefore dispatch on the column's *actual*
dtype instead of baking in one encoding.  These two helpers are the single
place that dispatch lives; with the session pinned to UTC (session.py) the
microsecond values are identical across encodings, and identical to the
DuckDB oracle's ``epoch_us(ts)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column

_TS_TYPES = (T.TimestampType, T.TimestampNTZType)


def _dtype(schema: T.StructType, col: str) -> T.DataType:
    try:
        return schema[col].dataType
    except KeyError as e:  # pragma: no cover - defensive
        raise KeyError(f"event-time column {col!r} not in schema {schema.simpleString()}") from e


def event_time_us(schema: T.StructType, col: str = "ts") -> Column:
    """Column of long microseconds-since-epoch, whatever ``col``'s dtype.

    timestamp / timestamp_ntz -> ``unix_micros`` (NTZ is interpreted in the
    session timezone, which the engine pins to UTC); long -> legacy
    nanos-as-long, integer-divided to µs.
    """
    dt = _dtype(schema, col)
    if isinstance(dt, _TS_TYPES):
        return F.unix_micros(F.col(col).cast("timestamp"))
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return F.expr(f"`{col}` div 1000")
    raise TypeError(f"unsupported event-time dtype {dt.simpleString()} for column {col!r}")


def event_ts(schema: T.StructType, col: str = "ts") -> Column:
    """Column of TimestampType (for watermarks / windowed aggs), whatever
    ``col``'s dtype."""
    dt = _dtype(schema, col)
    if isinstance(dt, _TS_TYPES):
        return F.col(col).cast("timestamp")
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return F.timestamp_micros(F.expr(f"`{col}` div 1000"))
    raise TypeError(f"unsupported event-time dtype {dt.simpleString()} for column {col!r}")
