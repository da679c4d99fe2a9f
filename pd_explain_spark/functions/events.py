"""Product-analytics operators over event streams: ordered funnels and
cohort retention.

The reference engine explains single query results; these are the two
standard MULTI-step questions an events table gets asked (did users
progress view -> click -> purchase? do cohorts come back?), expressed
as keyed joins and grouped aggregates so they hold at fleet-scale event
volumes. No reference counterpart — extends the events/time-series
family (rolling/resample/sessionize/windowed aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["event_funnel", "cohort_retention"]


def event_funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    scale: int = 1_000_000,
) -> DataFrame:
    """Ordered conversion funnel: a user completes step i when an event
    of type ``steps[i]`` happens STRICTLY AFTER their earliest
    completion of step i-1 (the first-touch convention: each stage
    anchors on the earliest qualifying timestamp, so the funnel is
    deterministic and order-respecting, not a mere per-type count).
    Returns one row per step: (step_order, step, n_users,
    conversion_micro — users at step / users at step 0 in integer
    micro-units, NULL when step 0 is empty).

    Scale shape: stage i is one user-keyed min-aggregate over events
    pre-filtered to that step's type (filter pushes to the scan), then
    one user-keyed join against the previous stage's (user, ts) table
    — S-1 equi-joins total, each side bounded by the user count, never
    an all-events shuffle. The final count is one aggregate over the
    left-joined per-user stage table."""
    if len(steps) < 2:
        raise ValueError("event_funnel: need >= 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"event_funnel: steps must be distinct, got {steps}")
    ev = df.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(F.col(user_col).alias("__u"), F.col(type_col).alias("__t"),
             F.col(ts_col).alias("__ts"))
    stage = (
        ev.filter(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__t0"))
    )
    users = stage
    for i, s in enumerate(steps[1:], start=1):
        nxt = (
            ev.filter(F.col("__t") == s)
            .join(stage.select("__u", F.col(f"__t{i - 1}")), "__u")
            .filter(F.col("__ts") > F.col(f"__t{i - 1}"))
            .groupBy("__u")
            .agg(F.min("__ts").alias(f"__t{i}"))
        )
        users = users.join(nxt, "__u", "left")
        stage = nxt.select("__u", f"__t{i}")
    counts = users.agg(
        *[F.count(F.col(f"__t{i}")).cast("bigint").alias(f"n{i}")
          for i in range(len(steps))]
    )
    rows = F.array(*[
        F.struct(
            F.lit(i).cast("int").alias("step_order"),
            F.lit(s).alias("step"),
            F.col(f"n{i}").alias("n_users"),
        )
        for i, s in enumerate(steps)
    ])
    base = F.col("n0").cast("double")
    return (
        counts.select(F.explode(rows).alias("r"), base.alias("__b"))
        .select(
            F.col("r.step_order"),
            F.col("r.step"),
            F.col("r.n_users"),
            F.when(
                F.col("__b") > 0,
                F.floor(
                    F.col("r.n_users").cast("double") / F.col("__b")
                    * F.lit(float(scale)) + F.lit(0.5)
                ).cast("bigint"),
            ).alias("conversion_micro"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    scale: int = 1_000_000,
) -> DataFrame:
    """Day-cohort retention: cohort = the calendar day of a user's FIRST
    event; for every (cohort, day offset) pair with activity, the
    distinct returning users and the retention ratio vs the cohort's
    size (offset 0 — every user is active on their first day by
    construction). Returns (cohort_day 'yyyy-MM-dd', day_offset,
    n_users, retention_micro).

    Scale shape: one user-keyed min-aggregate (the cohort table,
    bounded by user count), one distinct over (user, day) — the only
    event-volume shuffle, map-side combinable — then a user-keyed join
    against the cohort table and a (cohort, offset) count. The offsets
    spine grows with TIME, not event volume."""
    ev = df.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        F.to_date(F.col(ts_col)).alias("__d"),
    )
    cohort = ev.groupBy("__u").agg(F.min("__d").alias("__c"))
    active = ev.distinct()
    hits = (
        active.join(cohort, "__u")
        .groupBy(
            F.col("__c"),
            F.datediff(F.col("__d"), F.col("__c")).cast("int").alias("day_offset"),
        )
        .agg(F.count_distinct(F.col("__u")).cast("bigint").alias("n_users"))
    )
    base = hits.filter(F.col("day_offset") == 0).select(
        F.col("__c").alias("__cb"), F.col("n_users").alias("__n0")
    )
    return (
        hits.join(base, F.col("__c") == F.col("__cb"))
        .select(
            F.date_format("__c", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_users",
            F.floor(
                F.col("n_users").cast("double") / F.col("__n0").cast("double")
                * F.lit(float(scale)) + F.lit(0.5)
            ).cast("bigint").alias("retention_micro"),
        )
    )
