"""Partition-width guard shared by CPU-heavy single-pass kernels.

Small parquet inputs arrive as 1-3 partitions; a compute-bound stage
(per-row hashing, a 16-column explode fan-out) would then use 3 of 32
cores. ``fan_out`` repartitions ONLY when the input is narrower than the
cluster — on a real multi-executor scan of large data it is a no-op, so
the shuffle is paid exactly when it buys parallelism. Call it on the
narrowest possible projection so the exchange carries few columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
