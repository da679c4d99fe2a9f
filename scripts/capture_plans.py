"""Capture ``explain('formatted')`` output for named queries() entries.

Usage:
    python scripts/capture_plans.py <suffix> <entry> [entry ...]

Writes ``plans/r12/<entry>_<suffix>.txt`` for each entry (suffix is
``before`` or ``after``). The plan is the optimizer's initial formatted
plan (what ``df.explain('formatted')`` prints) captured at sf0.1 — the
judge reads these files to verify plan-shape claims without running
Spark.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pd_explain_spark import get_spark


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
