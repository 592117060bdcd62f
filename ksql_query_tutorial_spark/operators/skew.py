"""Skew mitigation: salted equi-join.

AQE's skew-join split (on in this engine's sessions) handles most skew
by splitting oversized shuffle partitions, but it only helps when the
skewed side is SORT-MERGE-joinable and the split granularity suffices.
Salting is the explicit, planner-independent fallback for pathological
hot keys (a single key holding >> one partition's worth of rows): the
hot side spreads each key over ``n_salts`` sub-keys, the other side
replicates each row ``n_salts`` times, and the join runs on
``(key, salt)`` — turning one straggler task into ``n_salts`` even
ones at the cost of replicating the smaller side.

Result is EXACTLY the plain join's result (tested): salting is a
physical rewrite, not a semantic one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: spread ``skewed`` over
    ``n_salts`` sub-partitions per key, replicate ``other`` to match.

    ``how`` supports ``inner`` and ``left`` (left = the skewed side).
    Columns of both inputs must be disjoint apart from ``on``.

    The salt is derived from a hash of the skewed side's whole row (not
    ``rand()``): deterministic → retries/speculative tasks produce
    identical output, and the hash spreads a hot key's rows evenly.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    l = skewed.withColumn("__salt", salt.cast("int"))
    r = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l.join(r, [*on, "__salt"], how)
    return out.drop("__salt")
