"""Source factories (reference S1/S2, utils/utils.py:9-22,25-32).

The reference monkey-patches ``pd.read_csv``; we expose explicit
factories — every read returns an ExplainableDataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..core.frame import ExplainableDataFrame


def read_csv(spark: SparkSession, path: str, name: str | None = None, **options) -> ExplainableDataFrame:
    opts = {"header": "true", "inferSchema": "true"}
    opts.update(options)
    df = spark.read.options(**opts).csv(path)
    return ExplainableDataFrame(df, name=name or _stem(path))


def read_parquet(spark: SparkSession, path: str, name: str | None = None) -> ExplainableDataFrame:
    return ExplainableDataFrame(read_parquet_df(spark, path), name=name or _stem(path))


def read_parquet_df(spark: SparkSession, path: str):
    """Plain-DataFrame parquet read that repairs TIMESTAMP(NANOS) columns.

    Spark has no nanosecond timestamp type; with
    spark.sql.legacy.parquet.nanosAsLong=true nanos columns surface as
    long. The conf is runtime-settable, so we set it here — the caller's
    SparkSession need not be ours (the driver harness builds its own).
    Truncation uses integer division (``div 1000``) so it matches
    DuckDB's TIMESTAMP truncation exactly; double division drifts by
    1 µs on ~12% of epoch-nanos values (53-bit mantissa).
    """
    from pyspark.sql import functions as F

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # immutable-conf environments: the session factory already set it
    df = spark.read.parquet(path)
    try:
        import pyarrow.parquet as pq

        first = path if path.endswith(".parquet") else None
        if first is not None and os.path.exists(first):
            schema = pq.read_schema(first)
            for field in schema:
                if str(field.type) == "timestamp[ns]" and field.name in df.columns:
                    df = df.withColumn(
                        field.name,
                        F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
                    )
    except Exception:
        pass  # non-local or exotic layouts: serve the raw read
    return df


def read_json(spark: SparkSession, path: str, name: str | None = None, **options) -> ExplainableDataFrame:
    """JSON / JSONL (Spark's json source is line-delimited by default —
    the text-corpus interchange format). Pass an explicit ``schema``
    option for stability at scale: inference runs a full extra pass
    over the files and types drift with the sampled lines."""
    return ExplainableDataFrame(spark.read.options(**options).json(path), name=name or _stem(path))


def read_orc(spark: SparkSession, path: str, name: str | None = None) -> ExplainableDataFrame:
    return ExplainableDataFrame(spark.read.orc(path), name=name or _stem(path))


def to_explainable(df: DataFrame, name: str = "df") -> ExplainableDataFrame:
    """Reference S2: cast a plain DataFrame to explainable."""
    return ExplainableDataFrame(df, name=name)


def load_table(spark: SparkSession, sf_dir: str, table: str) -> ExplainableDataFrame:
    """Convenience for the driver's TPC-H-ish test tables (TESTDATA.md)."""
    return read_parquet(spark, os.path.join(sf_dir, f"{table}.parquet"), name=table)


def _stem(path: str) -> str:
    base = os.path.basename(path.rstrip("/"))
    return base.split(".")[0] or "df"
