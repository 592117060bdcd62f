"""Avro serde (the reference's commented-out Schema Registry path).

The reference deploys Schema Registry but leaves it disabled
(/root/reference/docker-compose.yml:57-69, connect.properties:16-19);
only JSON is exercised. The serde layer here is format-pluggable, so
Avro drops in as a second codec — gated on the ``spark-avro`` package
being on the classpath (it is not in this container: the wrappers
raise a clear NotImplementedError and unit tests pin that behavior).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data-source package is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not avro_available(spark):
        raise NotImplementedError(
            "Avro serde requires the spark-avro package "
            "(org.apache.spark:spark-avro_2.13) on the classpath; "
            "this container ships JSON serde only"
        )


def decode_avro_value(df: DataFrame, avro_schema: str,
                      value_col: str = "value") -> DataFrame:
    """``from_avro`` the value column into typed columns (the Avro
    analog of functions.serde.decode_value)."""
    _require(df.sparkSession)
    from pyspark.sql.avro.functions import from_avro

    parsed = df.withColumn("__v", from_avro(df[value_col], avro_schema))
    keep = [c for c in df.columns if c not in (value_col, "__v")]
    return parsed.select(*keep, "__v.*")


def encode_avro_value(df: DataFrame, cols: list[str]) -> Column:
    """``to_avro`` over a struct of the given columns."""
    _require(df.sparkSession)
    from pyspark.sql import functions as F
    from pyspark.sql.avro.functions import to_avro

    return to_avro(F.struct(*cols))
