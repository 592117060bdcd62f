"""Kafka source/sink adapters (the production ingest/egress path).

Mirrors the reference's collection-over-topic model
(/root/reference/files/ksqldb-cli/all.sql:20-43): a STREAM/TABLE is a
typed view over a topic; `SET 'auto.offset.reset'='earliest'`
(`all.sql:1`) maps to ``startingOffsets=earliest`` (S8).

This container has no Kafka broker or spark-sql-kafka package, so these
builders construct the reader/writer plans and option dicts; the serde
step (`functions.serde`) is identical for the file-based test sources,
which is where the semantics are exercised. ``require_kafka`` gates the
actual ``.load()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ksql_query_tutorial_spark.functions.serde import decode_record, encode_kv


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    **extra: str,
) -> dict[str, str]:
    """Reader options for a collection over a topic (S2/S3/S8)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        **extra,
    }


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    key_name: str,
    key_type: str,
    value_schema: T.StructType,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Unbounded collection over a topic: raw kafka columns → typed rows
    (key decode + JSON value decode, offset carried through for
    LATEST_BY_OFFSET / upserts)."""
    if not kafka_available(spark):
        raise NotImplementedError(
            "spark-sql-kafka connector not on classpath in this container; "
            "use streaming.replay's file source for tests"
        )
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(bootstrap_servers, topic, starting_offsets).items():
        reader = reader.option(k, v)
    raw = reader.load().select("key", "value", "offset")
    return decode_record(raw, key_name, key_type, value_schema)


def write_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_cols: list[str],
    checkpoint_dir: str,
    output_mode: str = "update",
):
    """Continuous sink: encode (key, value) per the reference layout and
    push to a topic (S5/T3)."""
    kv = encode_kv(df, key_cols)
    return (
        kv.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )
