"""Behavioral analytics operators: ordered funnels and cohort
retention.

These are the product-analytics queries an events table exists for
(the reference class of engines is judged on them next to the
temporal joins in ops/joins.py). Both are compositions of standard
DataFrame aggregations/joins — every shuffle is keyed by the user
column, so the plans scale with the user population, never with a
single partition's worth of global state — and both have exact
ANSI-SQL mirrors for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    *,
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel.

    A user enters the funnel at their EARLIEST ``steps[0]`` event;
    step k (k ≥ 2) is the earliest ``steps[k-1]`` event at or after
    the user's step-(k-1) timestamp — and, when ``within_seconds`` is
    set, no later than ``step_1_ts + within_seconds`` (the standard
    conversion-window rule, measured from funnel entry). Returns one
    row per user who reached step 1:

        (user, step_1_ts, ..., step_K_ts, depth)

    with NULL timestamps past the deepest step reached and
    ``depth`` = number of steps completed.

    Plan shape: one aggregation per step plus a left join per step
    after the first, ALL keyed by the user column — K user-keyed
    shuffles total, no window over an unpartitioned stream, no
    driver-side state. Timestamps compare at full microsecond
    precision, so results are exact and partitioning-independent.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps!r}")
    if within_seconds is not None and within_seconds < 1:
        raise ValueError(f"within_seconds must be >= 1, got {within_seconds}")

    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__t"),
    )
    cur = (
        ev.where(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("step_1_ts"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col("__t") == step).select(
            F.col("__u").alias("__nu"), F.col("__ts").alias("__nts")
        )
        cond = (F.col("__u") == F.col("__nu")) & (
            F.col("__nts") >= F.col(f"step_{k - 1}_ts")
        )
        if within_seconds is not None:
            cond = cond & (
                F.col("__nts")
                <= F.col("step_1_ts")
                + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
            )
        prev_cols = ["__u"] + [f"step_{i}_ts" for i in range(1, k)]
        cur = (
            cur.join(nxt, cond, "left")
            .groupBy(*prev_cols)
            .agg(F.min("__nts").alias(f"step_{k}_ts"))
        )
    depth: Column = F.lit(1)
    for k in range(2, len(steps) + 1):
        depth = depth + F.when(
            F.col(f"step_{k}_ts").isNotNull(), F.lit(1)
        ).otherwise(F.lit(0))
    return cur.select(
        F.col("__u").alias(user_col),
        *[f"step_{k}_ts" for k in range(1, len(steps) + 1)],
        depth.cast("int").alias("depth"),
    )


def funnel_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    steps: list[str],
    within_seconds: int | None = None,
) -> str:
    """DuckDB mirror of :func:`funnel` — the same per-step
    min-aggregation + left-join chain, microsecond-exact."""
    parts = [
        f"e AS (SELECT {user_col} AS u, {ts_col}::TIMESTAMP AS ts, "
        f"{type_col} AS t FROM {table})",
        f"s1 AS (SELECT u, min(ts) AS step_1_ts FROM e "
        f"WHERE t = '{steps[0]}' GROUP BY u)",
    ]
    for k in range(2, len(steps) + 1):
        prev = ", ".join(f"step_{i}_ts" for i in range(1, k))
        bound = (
            f" AND e.ts <= s{k - 1}.step_1_ts + INTERVAL {int(within_seconds)} SECOND"
            if within_seconds is not None
            else ""
        )
        parts.append(
            f"s{k} AS (SELECT s{k - 1}.u, "
            + ", ".join(f"s{k - 1}.step_{i}_ts" for i in range(1, k))
            + f", min(e.ts) AS step_{k}_ts "
            f"FROM s{k - 1} LEFT JOIN e ON e.u = s{k - 1}.u "
            f"AND e.t = '{steps[k - 1]}' "
            f"AND e.ts >= s{k - 1}.step_{k - 1}_ts{bound} "
            f"GROUP BY s{k - 1}.u, {prev})"
        )
    k = len(steps)
    depth = " + ".join(
        ["1"]
        + [
            f"CASE WHEN step_{i}_ts IS NULL THEN 0 ELSE 1 END"
            for i in range(2, k + 1)
        ]
    )
    cols = ", ".join(f"step_{i}_ts" for i in range(1, k + 1))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT u AS {user_col}, {cols}, ({depth})::INT AS depth FROM s{k}"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Daily cohort retention matrix.

    Each user's cohort is the day of their first event; the matrix
    counts, for every (cohort_day, day_offset), how many of that
    cohort's users were active ``day_offset`` days after signup:

        (cohort_day, day_offset, n_users)

    ``day_offset`` 0 exists for every cohort (the signup day itself),
    so ``n_users`` at offset 0 is the cohort size — divide through it
    downstream for retention rates.

    Plan shape: a user-keyed min-aggregation for cohorts, a distinct
    over (user, day) activity pairs, one user-keyed join, and a final
    aggregation on (cohort_day, day_offset). The activity distinct
    guarantees each user counts once per offset, so the final
    ``count(*)`` is exactly the distinct-user count without an
    expand-based countDistinct.
    """
    ev = events.select(
        F.col(user_col).alias("__u"),
        # DATE (not day-truncated TIMESTAMP): matches DuckDB's
        # date_trunc('day', ts) return type so oracle values compare raw.
        F.to_date(F.col(ts_col)).alias("__day"),
    )
    first = ev.groupBy("__u").agg(F.min("__day").alias("cohort_day"))
    act = ev.distinct()
    return (
        act.join(first, "__u")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("__day"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def cohort_retention_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB mirror of :func:`cohort_retention`."""
    return f"""
WITH e AS (SELECT {user_col} AS u, date_trunc('day', {ts_col}::TIMESTAMP) AS day
           FROM {table}),
f AS (SELECT u, min(day) AS cohort_day FROM e GROUP BY u),
a AS (SELECT DISTINCT u, day FROM e)
SELECT f.cohort_day, date_diff('day', f.cohort_day, a.day)::BIGINT AS day_offset,
  count(*) AS n_users
FROM a JOIN f USING (u)
GROUP BY f.cohort_day, day_offset"""

