"""Incrementing-mode JDBC ingest (the reference's source connector).

Reference: ``CREATE SOURCE CONNECTOR`` with ``mode='incrementing'``,
``incrementing.column.name='id'`` (/root/reference/files/ksqldb-cli/
all.sql:3-18) — poll a table, emit rows with id greater than the stored
high-water mark, stringify the key (`all.sql:15-17`).

Spark mapping (SURVEY.md §3.2): a periodic batch ``spark.read.jdbc``
with a predicate on the incrementing column; the watermark persists in
a tiny JSON checkpoint. Each poll's output goes through the same
(key, value) serde as every other sink. No Connect worker is
reimplemented — this is an API-level adapter.

At scale: partition the JDBC read (``numPartitions``/bounds on the
incrementing column) so a large backfill parallelizes; steady-state
increments are small by construction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class IncrementingIngest:
    """Poll-based incrementing ingest with a persisted high-water mark."""

    def __init__(self, spark: SparkSession, url: str, table: str,
                 incrementing_column: str, checkpoint_path: str,
                 properties: dict[str, str] | None = None,
                 num_partitions: int = 8):
        self.spark = spark
        self.url = url
        self.table = table
        self.col = incrementing_column
        self.checkpoint_path = checkpoint_path
        self.properties = properties or {}
        self.num_partitions = num_partitions

    # -- watermark persistence (the Connect offsets-topic analog) -------
    def watermark(self) -> int:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as f:
                return json.load(f)["watermark"]
        return -(2 ** 62)

    def _save(self, wm: int) -> None:
        os.makedirs(os.path.dirname(self.checkpoint_path) or ".", exist_ok=True)
        with open(self.checkpoint_path, "w") as f:
            json.dump({"watermark": wm}, f)

    # -- one poll -------------------------------------------------------
    def poll(self) -> DataFrame:
        """Read rows beyond the watermark; advance it to the batch max.

        Uses a pushed-down dbtable subquery so the database, not Spark,
        applies the watermark predicate.
        """
        wm = self.watermark()
        query = f"(SELECT * FROM {self.table} WHERE {self.col} > {wm}) AS t"
        df = self.spark.read.jdbc(self.url, query, properties=self.properties)
        mx = df.agg({self.col: "max"}).collect()[0][0]
        if mx is not None:
            self._save(int(mx))
        return df
