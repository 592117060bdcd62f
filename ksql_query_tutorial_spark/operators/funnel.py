"""Ordered-step funnel analysis over an event stream.

The sequence-analytics operator every product/behavior pipeline runs
(the SQL MATCH_RECOGNIZE / funnel-chart shape): for each user, find the
first time they completed step 1, the first step-2 event STRICTLY AFTER
that, the first step-3 event strictly after that, and the depth reached.

Scale design: one shuffle total. All steps are consecutive window
aggregates over the SAME ``partitionBy(user)`` spec — Catalyst plans a
single Exchange and stacks the window operators on top, and the final
per-user rollup reuses that partitioning. No joins, no re-scans of the
event table, no per-user iteration. Users are the natural partition key
at any scale; per-user event counts bound the window buffers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """First-completion timestamp per funnel step per user, with each
    step constrained to happen strictly after the previous step's first
    completion (the standard ordered-funnel semantics — a purchase
    BEFORE the first view does not count).

    Returns one row per user: ``user_col, first_<step>...`` (nullable
    timestamps) and ``funnel_depth`` (0..len(steps), the number of
    consecutive steps completed in order).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    out = df
    prev: str | None = None
    cols: list[str] = []
    for step in steps:
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"first_{step}"
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        cols.append(name)
        prev = name
    # the strictly-after chaining guarantees consecutiveness: a step's
    # first-completion can only be non-null if the previous one was, so
    # depth is a plain count of non-null steps.
    agg = [F.max(name).alias(name) for name in cols]
    return (
        out.groupBy(user_col)
        .agg(*agg)
        .withColumn(
            "funnel_depth",
            sum(
                (F.when(F.col(n).isNotNull(), 1).otherwise(0) for n in cols),
                start=F.lit(0),
            ).cast("int"),
        )
    )


def conversion_lag(
    df: DataFrame,
    from_step: str = "view",
    to_step: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort conversion-lag report: per day of first exposure
    (``from_step``), how many users were exposed, how many converted
    (first ``to_step`` strictly after the exposure, the
    :func:`funnel_steps` semantics), and the average / maximum
    exposure→conversion lag in seconds.

    Scale design: the per-user first-completion pair rides the single
    funnel exchange (stacked windows over one ``partitionBy(user)``
    spec); the cohort rollup is ≤|days| cells. Lags are summed as
    EXACT epoch-microsecond integers and divided once at the end, so
    the 4dp-rounded averages are bit-portable across engines (a double
    running mean would be order-dependent).

    Returns ``cohort_day, n_exposed, n_converted, avg_lag_sec,
    max_lag_sec`` (lag columns NULL for cohorts with no conversions).
    """
    f = funnel_steps(
        df, steps=(from_step, to_step),
        user_col=user_col, type_col=type_col, ts_col=ts_col,
    )
    first_from, first_to = f"first_{from_step}", f"first_{to_step}"
    # events load as TIMESTAMP_NTZ; unix_micros wants TIMESTAMP (the
    # wrapper pins the session to UTC, so the epoch values match the
    # oracle's epoch_us over the same naive values).
    lag_us = F.unix_micros(F.col(first_to).cast("timestamp")) - F.unix_micros(
        F.col(first_from).cast("timestamp")
    )
    n_conv = F.count(F.col(first_to))
    return (
        f.filter(F.col(first_from).isNotNull())
        .groupBy(
            F.date_trunc("DAY", F.col(first_from)).cast("date").alias(
                "cohort_day"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exposed"),
            n_conv.cast("long").alias("n_converted"),
            F.when(
                n_conv > 0,
                F.round(
                    F.sum(lag_us).cast("double")
                    / n_conv.cast("double") / 1e6,
                    4,
                ),
            ).alias("avg_lag_sec"),
            F.round(F.max(lag_us).cast("double") / 1e6, 4).alias(
                "max_lag_sec"
            ),
        )
        .orderBy("cohort_day")
    )
