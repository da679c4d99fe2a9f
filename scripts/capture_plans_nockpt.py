"""Capture ``explain('formatted')`` for entries whose result frame is
checkpoint-terminated (``_finalize_release`` / ``checkpoint_df``): the
standard capture then shows only a `Scan ExistingRDD` stub. This
variant monkeypatches the checkpoint sites to identity FOR THE CAPTURE
ONLY, so the dumped plan is the full pre-checkpoint query tree the
engine actually optimizes. Never used in the timed/benched path.

Usage:
    PLANS_ROUND=r13 python scripts/capture_plans_nockpt.py <suffix> <entry> [entry ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pd_explain_spark import get_spark
import pd_explain_spark.functions.dedup as _dedup
import pd_explain_spark.session as _session


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    # plan-capture-only: keep the full lazy tree visible
    _dedup._finalize_release = lambda out, cached: out
    _session.checkpoint_df = lambda df, *a, **k: df
    spark = get_spark("capture_plans_nockpt")
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
