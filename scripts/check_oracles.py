"""Local simulation of the driver's t2 correctness gate:
runs each __spark_entry__.queries() entry and its oracle_sql() on the
same sf dir, compares row-count + schema (column names) + an
order-insensitive value hash. Usage:
    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from pd_explain_spark import get_spark


def value_hash(pdf) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # driver parity: the driver's _canon runs pandas sort_values over all
    # columns before hashing, which raises on unhashable cell values
    # (lists/arrays) — the r7 hashed_embeddings_docs red row passed HERE
    # because itertuples+str never sorts. Reproduce the driver's failure
    # mode locally so an unhashable output shape can never reach a round.
    pdf.sort_values(sorted(pdf.columns))
    rows = []
    for tup in pdf.itertuples(index=False):
        rows.append("|".join(_norm(v) for v in tup))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _norm(v) -> str:
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows, cols={sorted(sdf.columns)} ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(ddf)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(sdf)}/{len(ddf)} cols_match={ok_cols} "
            f"hash_match={ok_hash} ({time.time()-t0:.1f}s)"
        )
        if not ok_cols:
            print(f"     spark cols: {sorted(sdf.columns)}")
            print(f"     duck  cols: {sorted(ddf.columns)}")
        elif not ok_hash and ok_rows:
            merged = _diff_sample(sdf, ddf)
            if merged is not None:
                print(merged)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


def _diff_sample(sdf, ddf):
    try:
        s = sdf.reindex(sorted(sdf.columns), axis=1)
        d = ddf.reindex(sorted(ddf.columns), axis=1)
        key = list(s.columns)
        s = s.sort_values(key, ignore_index=True)
        d = d.sort_values(key, ignore_index=True)
        neq = (s.astype(str) != d.astype(str)).any(axis=1)
        if neq.any():
            i = neq.idxmax()
            return f"     first diff row {i}:\n     spark: {s.iloc[i].to_dict()}\n     duck:  {d.iloc[i].to_dict()}"
    except Exception as e:
        return f"     (diff failed: {e})"
    return None


if __name__ == "__main__":
    sys.exit(main())
