"""Timestamp-to-numeric helpers shared by the ordered operators.

The testdata's ``events.ts`` is parquet ``timestamp[us]`` with
``isAdjustedToUTC=false``, which Spark 4 surfaces as TIMESTAMP_NTZ
(``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults true).
``unix_micros`` only accepts TIMESTAMP, so every ordered operator that
needs an epoch number must go through this helper: NTZ values are cast
to TIMESTAMP first (interpreted in the session timezone — a monotone
mapping, so ordering and range-frame widths are preserved; in UTC
deployments it is the identity on the wall-clock values).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: Column, dtype: str) -> Column:
    """Epoch-microseconds expression for a TIMESTAMP or TIMESTAMP_NTZ column."""
    if dtype == "timestamp_ntz":
        return F.unix_micros(col.cast("timestamp"))
    return F.unix_micros(col)


def is_timestamp(dtype: str) -> bool:
    return dtype.startswith("timestamp")
