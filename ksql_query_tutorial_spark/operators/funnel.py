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
