"""Datetime decomposition + time-series fills.

Reference parity:
* DateEncoder extracts YEAR/MONTH/WEEKDAY/HOUR/MINUTE/SECOND per
  timestamp column (/root/reference/pipelines/preprocessing/
  timeseries/DateEncoder.py:30-48). pandas weekday is Mon=0..Sun=6;
  Spark's F.weekday matches that convention (F.dayofweek is Sun=1).
* TimeSeriesImputer ffill/bfill (TimeSeriesImputer.py:36-43) becomes
  F.last/F.first(ignorenulls) over an ordered window — distributed,
  partitioned by entity key so no single-node sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def decompose(col: Column | str, prefix: str | None = None) -> list[Column]:
    c = F.col(col) if isinstance(col, str) else col
    p = prefix or (col if isinstance(col, str) else "ts")
    return [
        F.year(c).alias(f"{p}_YEAR"),
        F.month(c).alias(f"{p}_MONTH"),
        F.weekday(c).alias(f"{p}_WKDAY"),  # Mon=0, pandas parity
        F.hour(c).alias(f"{p}_HOUR"),
        F.minute(c).alias(f"{p}_MINUTE"),
        F.second(c).alias(f"{p}_SECOND"),
    ]


def ffill(df: DataFrame, value_col: str, order_col: str, key_col: str | None = None) -> DataFrame:
    """Forward-fill nulls with the last non-null value in order.

    Partitioned by key_col when given — each entity fills independently
    and the window never needs a global sort. Without a key the window
    is single-partition: correct but driver-bottlenecked; only for small
    frames (documented scale hazard).
    """
    w = (W.partitionBy(key_col) if key_col else W.partitionBy()).orderBy(order_col)
    filled = F.last(value_col, ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    return df.withColumn(value_col, filled)


def bfill(df: DataFrame, value_col: str, order_col: str, key_col: str | None = None) -> DataFrame:
    w = (W.partitionBy(key_col) if key_col else W.partitionBy()).orderBy(order_col)
    filled = F.first(value_col, ignorenulls=True).over(
        w.rowsBetween(0, W.unboundedFollowing)
    )
    return df.withColumn(value_col, filled)
