"""Persistent queries: the engine's CTAS/CSAS execution path.

ksqlDB semantics (/root/reference): ``CREATE TABLE ... AS SELECT`` /
``CREATE STREAM ... AS SELECT`` registers a continuously-running query
that maintains a sink topic — "new updates will be pushed to the topic"
(`README.md:310`), running independently of any client, with state in
the engine's state store (`all.sql:45-51`, `129-160`).

Spark mapping: a named, checkpointed ``StreamingQuery``:
- CSAS (stateless projection/filter) → ``outputMode("append")``
- CTAS (keyed aggregate)            → ``outputMode("update")``
- sink = Kafka in production (key/value via functions.serde), memory or
  files in tests; checkpointLocation gives exactly-once state recovery
  (the analog of ksqlDB's changelogged RocksDB state stores).

Output-mode selection is *by plan shape* (T1, `README.md:115-117`):
stateless stream queries emit appends; table-backed (aggregated)
queries emit per-key updates.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

from ksql_query_tutorial_spark.functions.serde import encode_kv


def is_aggregated(df: DataFrame) -> bool:
    """Plan-shape probe: does the (streaming) plan contain a stateful
    aggregate? Drives append-vs-update output-mode selection."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan


def default_output_mode(df: DataFrame) -> str:
    return "update" if is_aggregated(df) else "append"


def start_persistent_query(
    session,
    name: str,
    df: DataFrame,
    key_cols: list[str],
    sink_format: str = "memory",
    sink_path: str | None = None,
    output_mode: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Start a CTAS/CSAS persistent query and register it with the
    engine session (SHOW QUERIES / TERMINATE — `README.md:310`).

    The sink record layout matches the reference: key = key column
    (bare string) or composite JSON (`README.md:342,462-465`), value =
    uppercase-field JSON of the remaining columns.
    """
    mode = output_mode or default_output_mode(df)
    kv = encode_kv(df, key_cols)
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix=f"ksql-spark-{name}-ckpt-")
    writer = kv.writeStream.outputMode(mode).queryName(name).option(
        "checkpointLocation", ckpt
    )
    if sink_format == "kafka":
        writer = writer.format("kafka")
        for k, v in (session.catalog.get(name).properties if name in session.catalog else {}).items():
            writer = writer.option(k, v)
    elif sink_format == "memory":
        writer = writer.format("memory")
    else:
        writer = writer.format(sink_format)
        if sink_path:
            writer = writer.option("path", sink_path)
    q = writer.start()
    session.persistent_queries[name] = q
    return q
