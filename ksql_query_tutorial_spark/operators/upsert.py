"""TABLE upsert materialization: latest record per key.

ksqlDB semantics being replicated: "players will be inserted in the table
if they have a new key or they will be updated if a new record is inserted
in the topic with the same key" (/root/reference/README.md:92), and
LATEST_BY_OFFSET (/root/reference/files/ksqldb-cli/all.sql:136-137).

Spark-first design: ``max_by(struct(cols), order_col)`` — a single
partial+final hash aggregation (one shuffle on the key, map-side combine
does most of the work). This beats the window-function formulation
(row_number over partitionBy ... = 1), which sorts every partition;
max_by only tracks a running max per key. At 100 TB the agg formulation
is the difference between a sort-based exchange and a streaming combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Materialize upsert state: the latest row per key, ordered by
    ``order_col`` (the Kafka-offset analog).

    Returns a DataFrame with the same schema/column order as ``df``.
    """
    if not key_cols:
        raise ValueError("latest_by_key requires at least one key column")
    value_cols = [c for c in df.columns if c not in key_cols]
    packed = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*value_cols), F.col(order_col)).alias("__latest")
    )
    return packed.select(
        *key_cols, *[F.col(f"__latest.{c}").alias(c) for c in value_cols]
    ).select(*df.columns)


def latest_by_offset(df: DataFrame, key_cols: list[str], order_col: str,
                     agg_cols: list[str]) -> DataFrame:
    """LATEST_BY_OFFSET(col) for several columns in one aggregation pass
    (all.sql:136-137): per key, the value of each column in the row with
    the greatest offset.
    """
    aggs = [F.max_by(c, F.col(order_col)).alias(c) for c in agg_cols]
    return df.groupBy(*key_cols).agg(*aggs)


def apply_changelog(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tombstone: F.Column | None = None,
) -> DataFrame:
    """Tombstone-aware changelog apply — the full ksqlDB TABLE
    semantics: the latest record per key wins (``latest_by_key``), and
    a key whose LATEST record is a tombstone (ksqlDB: a null-valued
    record; here: any row matching the ``tombstone`` predicate) is
    DELETED from the materialized state, not surfaced with null
    values. Cites /root/reference/README.md:92 (upsert) — tombstones
    are the delete half ksqlDB tables add on top.

    Scale design: identical to :func:`latest_by_key` — ONE key-keyed
    exchange where ``max_by`` tracks the running latest (map-side
    combine, no per-key sort); the tombstone filter is a post-agg
    predicate on the one-row-per-key result, free at any scale.
    """
    if tombstone is None:
        return latest_by_key(df, key_cols, order_col)
    marked = df.withColumn("__tomb", tombstone)
    latest = latest_by_key(marked, key_cols, order_col)
    return latest.filter(~F.col("__tomb")).drop("__tomb")
