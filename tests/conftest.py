import os

import duckdb
import pytest

from pd_explain_spark import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark("pd_explain_spark_tests")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


@pytest.fixture(scope="session")
def customer(spark, sf_dir):
    return load_table(spark, sf_dir, "customer")


@pytest.fixture(scope="session")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


@pytest.fixture(scope="session")
def part(spark, sf_dir):
    return load_table(spark, sf_dir, "part")


def assert_df_equal(spark_df, duck_rel, sort_cols=None, tol=1e-9):
    """Differential check: Spark result == DuckDB oracle (order-insensitive)."""
    import pandas as pd

    left = spark_df.toPandas() if hasattr(spark_df, "toPandas") else spark_df.df.toPandas()
    right = duck_rel.df() if hasattr(duck_rel, "df") else duck_rel
    left = left.reindex(sorted(left.columns), axis=1)
    right = right.reindex(sorted(right.columns), axis=1)
    assert list(left.columns) == list(right.columns), (
        f"column mismatch: {list(left.columns)} vs {list(right.columns)}"
    )
    sort_cols = sort_cols or list(left.columns)
    left = left.sort_values(sort_cols, ignore_index=True)
    right = right.sort_values(sort_cols, ignore_index=True)
    assert len(left) == len(right), f"row count {len(left)} vs {len(right)}"
    for c in left.columns:
        lc, rc = left[c], right[c]
        if pd.api.types.is_float_dtype(lc) or pd.api.types.is_float_dtype(rc):
            pd.testing.assert_series_equal(
                lc.astype(float), rc.astype(float), check_names=False,
                rtol=1e-6, atol=tol, check_exact=False,
            )
        else:
            assert lc.astype(str).tolist() == rc.astype(str).tolist(), f"mismatch in {c}"
