"""File-based sources/sinks: parquet (the fixture path), JSON lines,
CSV — with the schema discipline a 100 TB lake needs.

Reference context: the tutorial's only value format is JSON
(/root/reference/files/ksqldb-cli/all.sql:29,41,48,132 — VALUE_FORMAT
= 'JSON'); these adapters give the same declared-schema contract for
files that `functions.serde` gives for Kafka records.

Scale rules encoded here:
- NEVER infer schemas on the read path: inference is an extra full scan
  of text formats and yields drifting types; collections declare their
  schema (`all.sql:20-31` model).
- Partitioned writes: ``partitionBy`` layout so downstream reads prune
  whole directories (partition pruning shows as ``PartitionFilters`` in
  explain); bound output file counts with a repartition so a 1000-task
  stage doesn't write 1000 tiny files per partition value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a table with an explicit schema (required for text formats).

    parquet carries its own schema; JSON/CSV without a declared schema
    would trigger inference (an extra scan + type drift) — refused.
    """
    fmt = fmt.lower()
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(f"declare a schema for {fmt} reads (no inference)")
    if fmt == "csv":
        options = {"header": "true", **options}
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    files_per_partition: int = 1,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write a table, optionally hive-partitioned by low-cardinality
    columns, with a bounded file count per partition value.

    The repartition on the partition columns routes each partition
    value's rows to ``files_per_partition`` tasks — without it every
    upstream task writes a sliver of every partition value (the
    small-files problem at cluster scale).
    """
    fmt = fmt.lower()
    if partition_by:
        df = df.repartition(
            max(files_per_partition * 4, 1), *[F.col(c) for c in partition_by]
        )
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options = {"header": "true", **options}
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
