"""Engine session: SparkSession factory + collection catalog.

The reference's engine session is a ksqlDB server (`docker-compose.yml:32-44`
in /root/reference) holding a metastore of STREAMs/TABLEs over Kafka topics.
Ours is a thin layer over ``SparkSession``: the catalog maps collection names
to registered temp views (batch) and streaming DataFrames (streams), and DDL
helpers mirror the reference's CREATE STREAM / CREATE TABLE surface
(`files/ksqldb-cli/all.sql:20-43`).

Scale notes (100 TB target):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic broadcast conversion replace the reference's manual
  co-partitioning discipline (`README.md:362-365`).
- ``spark.sql.shuffle.partitions`` defaults to the local core count for
  tests; on a real cluster leave AQE to coalesce from a high initial count.
- Arrow enabled so any Pandas-UDF path is vectorized, never per-row.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def get_spark(
    app_name: str = "ksql_query_tutorial_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    Honors ``SPARK_GRAFT_CPUS`` (driver contract) for local parallelism.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "32"
    shuffle_partitions = shuffle_partitions or str(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local mode: driver == executor, so shuffles, cached blocks,
        # and checkpoint blocks all share this one heap. 16g showed
        # multi-second full-GC pauses mid-query (2-3x run-to-run
        # variance on the shingle-dedup family); 48g removes them on
        # the 128 GiB test host. Cluster deployments size executors
        # instead and can ignore this knob.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


@dataclass
class Collection:
    """Catalog entry for a STREAM or TABLE.

    Mirrors the reference's collection DDL surface: a name, a declared
    schema, a key (plain key for STREAMs, PRIMARY KEY for TABLEs —
    `README.md:170` vs `README.md:79`), and source properties (topic,
    format, partitions — `all.sql:26-30`).
    """

    name: str
    kind: str  # "STREAM" | "TABLE"
    key_cols: tuple[str, ...] = ()
    value_format: str = "JSON"
    partitions: int = 1
    topic: str | None = None
    properties: dict[str, str] = field(default_factory=dict)


class EngineSession:
    """The engine's top-level handle: catalog + DDL + query entry points.

    ksqlDB analog: the server's metastore + statement endpoint
    (`/root/reference/README.md:32`, server at `docker-compose.yml:32-44`).
    """

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self.catalog: dict[str, Collection] = {}
        # name -> running StreamingQuery (persistent queries, §3.3)
        self.persistent_queries: dict[str, object] = {}
        # session-wide telemetry listener (enable_metrics), off by default
        self._progress_log = None

    # ------------------------------------------------------------------ DDL
    def register(self, name: str, df: DataFrame, kind: str = "TABLE",
                 key_cols: tuple[str, ...] = (), **props) -> Collection:
        """Register a DataFrame as a named collection (temp view + catalog).

        The batch analog of CREATE TABLE / CREATE STREAM over an existing
        topic (`all.sql:20-43`).
        """
        df.createOrReplaceTempView(name)
        coll = Collection(name=name, kind=kind.upper(), key_cols=tuple(key_cols),
                          properties={k: str(v) for k, v in props.items()})
        self.catalog[name] = coll
        return coll

    def create_stream(self, name: str, df: DataFrame,
                      key_cols: tuple[str, ...] = (), **props) -> Collection:
        """CREATE STREAM: append-only collection (`README.md:165`)."""
        return self.register(name, df, kind="STREAM", key_cols=key_cols, **props)

    def create_table(self, name: str, df: DataFrame,
                     key_cols: tuple[str, ...] = (), **props) -> Collection:
        """CREATE TABLE: upsert-by-key collection (`README.md:92`).

        Batch semantics: the registered view is the *changelog*; read the
        materialized latest-per-key state via :func:`table_state`.
        """
        return self.register(name, df, kind="TABLE", key_cols=key_cols, **props)

    def table_state(self, name: str, order_col: str = "__offset") -> DataFrame:
        """Materialize a TABLE's upsert state: latest record per key.

        ksqlDB: "players will be inserted in the table if they have a new
        key or they will be updated if a new record is inserted in the
        topic with the same key" (`README.md:92`).
        """
        from ksql_query_tutorial_spark.operators.upsert import latest_by_key

        coll = self.catalog[name]
        df = self.spark.table(name)
        return latest_by_key(df, list(coll.key_cols), order_col)

    def get(self, name: str, key, order_col: str = "__offset"):
        """Pull query: the CURRENT value for one key from a TABLE's
        materialized upsert state — the KTable point-lookup the
        reference tutorial lacks (its README shows only push queries,
        `/root/reference/README.md:115-117`) but every ksqlDB user
        reaches for next (`SELECT * FROM t WHERE key = ...;` without
        EMIT CHANGES).

        ``key``: a scalar (single-column key), a tuple in ``key_cols``
        order, or a ``{col: value}`` dict. Returns the row as a dict,
        or ``None`` if the key is absent.

        Scale design: the key filter is applied to the CHANGELOG before
        the latest-per-key aggregation — filtering on grouping columns
        commutes with the groupBy, so Catalyst pushes the predicate to
        the scan and the lookup touches one key's records, never a
        full-table materialization.
        """
        from pyspark.sql import functions as F

        from ksql_query_tutorial_spark.operators.upsert import latest_by_key

        coll = self.catalog[name]
        if coll.kind != "TABLE":
            raise ValueError(f"pull queries read TABLEs; {name!r} is a {coll.kind}")
        if not coll.key_cols:
            raise ValueError(f"TABLE {name!r} has no PRIMARY KEY columns")
        if isinstance(key, dict):
            unknown = set(key) - set(coll.key_cols)
            if unknown or set(key) != set(coll.key_cols):
                raise ValueError(
                    f"key columns {sorted(key)} != PRIMARY KEY {list(coll.key_cols)}"
                )
            bound = key
        else:
            values = key if isinstance(key, (tuple, list)) else (key,)
            if len(values) != len(coll.key_cols):
                raise ValueError(
                    f"need {len(coll.key_cols)} key values for {list(coll.key_cols)}, "
                    f"got {len(values)}"
                )
            bound = dict(zip(coll.key_cols, values))
        df = self.spark.table(name)
        for c, v in bound.items():
            df = df.filter(F.col(c) == F.lit(v))
        rows = latest_by_key(df, list(coll.key_cols), order_col).take(1)
        return rows[0].asDict() if rows else None

    # ---------------------------------------------------------------- query
    def sql(self, query: str) -> DataFrame:
        """Spark SQL passthrough (the engine's query endpoint)."""
        return self.spark.sql(query)

    def ksql(self, statement: str) -> object:
        """Execute a statement written in the reference's KSQL dialect."""
        from ksql_query_tutorial_spark.ksql.engine import execute

        return execute(self, statement)

    # ---------------------------------------------------------------- admin
    def show_streams(self) -> list[str]:
        """SHOW STREAMS (`SURVEY.md` §2.7 M3)."""
        return sorted(n for n, c in self.catalog.items() if c.kind == "STREAM")

    def show_tables(self) -> list[str]:
        """SHOW TABLES (`SURVEY.md` §2.7 M3)."""
        return sorted(n for n, c in self.catalog.items() if c.kind == "TABLE")

    def show_queries(self) -> list[str]:
        """SHOW QUERIES: running persistent queries (`README.md:310`)."""
        return sorted(self.persistent_queries)

    def enable_metrics(self):
        """Attach the session-wide streaming telemetry listener
        (streaming/observe.ProgressLog): every persistent query started
        AFTER this call reports per-micro-batch input volume, watermark,
        and any ``observe`` SLI sets via :func:`query_metrics` — the
        engine-surface read-out of the reference's console-consumer
        inspection loop (`README.md:333-351`), as machine telemetry.
        Idempotent; returns the listener."""
        if self._progress_log is None:
            from ksql_query_tutorial_spark.streaming.observe import (
                ProgressLog,
            )

            self._progress_log = ProgressLog()
            self.spark.streams.addListener(self._progress_log)
        return self._progress_log

    def disable_metrics(self) -> None:
        """Detach the telemetry listener (listeners are process-wide in
        Spark — a long-lived host detaches between engine sessions)."""
        if self._progress_log is not None:
            self.spark.streams.removeListener(self._progress_log)
            self._progress_log = None

    def query_metrics(self, name: str) -> list[dict]:
        """Per-micro-batch telemetry records for a persistent query
        (requires :func:`enable_metrics` before the query started)."""
        if self._progress_log is None:
            raise ValueError(
                "metrics not enabled — call enable_metrics() before "
                "starting the query"
            )
        q = self.persistent_queries.get(name)
        if q is None:
            raise KeyError(name)
        qid = str(q.id)
        return [b for b in self._progress_log.batches if b["id"] == qid]

    def terminate(self, name: str) -> None:
        """TERMINATE a persistent query."""
        q = self.persistent_queries.pop(name, None)
        if q is not None and hasattr(q, "stop"):
            q.stop()
