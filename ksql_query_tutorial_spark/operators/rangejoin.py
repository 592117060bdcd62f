"""Range (interval) join: match right rows whose point falls in a
window around each left row's point, per key.

The reference's join matrix (`/root/reference/README.md:356-360`) is
equi-only; range joins are the second canonical "operator Spark lacks"
(windowed attribution, prior-activity features, sessionized lookups).

Spark-first design — **bucketized equality join**, not a theta join:
a raw range condition (``r.p BETWEEN l.p+lo AND l.p+hi``) downgrades
the join to broadcast-nested-loop (O(n·m) comparisons). Binning the
point into buckets of width ``hi−lo`` makes every window span at most
two consecutive buckets, so the physical join is an ordinary
shuffle-hash/sort-merge **equality** join on ``(key, bucket)`` with
the residual range predicate applied per matched pair. Cost:
O(n+m) bucketing + an equi-join whose fan-out is the true match count
(plus the ≤2× bucket-probe factor) — survives 100 TB like any keyed
join; AQE's skew handling covers hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    by_cols: list[str],
    left_point: str,
    right_point: str,
    lower: float,
    upper: float,
    how: str = "inner",
) -> DataFrame:
    """Pairs where ``right.right_point ∈ [left.left_point + lower,
    left.left_point + upper]`` and the ``by_cols`` keys match.

    Points are numeric (cast timestamps to epoch seconds/days first).
    ``lower < upper`` required. Returns all left columns + all right
    columns (names must not collide except ``by_cols``).

    ``how='inner'`` emits matching pairs; ``how='left'`` keeps
    unmatched left rows with null right payload.
    """
    if not upper > lower:
        raise ValueError(f"need lower < upper, got [{lower}, {upper}]")
    overlap = (set(right.columns) - set(by_cols)) & set(left.columns)
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    width = float(upper - lower)
    src = left.withColumn("__lid", F.monotonically_increasing_id())
    r2 = right.withColumn("__rb", F.floor(F.col(right_point) / width))
    # the probe window [p+lower, p+upper] spans bucket ids
    # floor((p+lower)/w) .. floor((p+upper)/w) — at most 2 distinct ids
    # since the window width equals the bucket width
    l2 = src.withColumn(
        "__lb",
        F.explode(
            F.sequence(
                F.floor((F.col(left_point) + F.lit(lower)) / width),
                F.floor((F.col(left_point) + F.lit(upper)) / width),
            )
        ),
    )
    in_range = (
        (F.col(right_point) >= F.col(left_point) + F.lit(lower))
        & (F.col(right_point) <= F.col(left_point) + F.lit(upper))
    )
    cond = l2["__lb"] == r2["__rb"]
    for c in by_cols:
        cond = cond & (l2[c] == r2[c])
    # each right row lives in exactly ONE bucket and the left side
    # probes each bucket id once, so no pair is produced twice —
    # no dedup needed
    pairs = l2.join(r2, cond).drop(*[r2[c] for c in by_cols]).filter(in_range)
    if how == "inner":
        return pairs.drop("__lb", "__rb", "__lid")

    # left: keep left rows with no in-range match (NOT just no bucket
    # match — a bucket hit can still fail the residual range predicate)
    unmatched = src.join(pairs.select("__lid"), "__lid", "left_anti")
    null_payload = [
        F.lit(None).cast(f.dataType).alias(f.name)
        for f in right.schema.fields if f.name not in by_cols
    ]
    return (
        pairs.drop("__lb", "__rb")
        .unionByName(unmatched.select("*", *null_payload))
        .drop("__lid")
    )
