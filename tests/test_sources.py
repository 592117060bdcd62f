"""Source-adapter tests that run without external systems: the JDBC
incrementing ingest's watermark protocol (the Connect offsets analog,
all.sql:11-12 in /root/reference) with the actual JDBC read faked."""

from __future__ import annotations

import os

from pyspark.sql import DataFrameReader

from ksql_query_tutorial_spark.sources.jdbc import IncrementingIngest


def test_incrementing_ingest_watermark_protocol(spark, tmp_path, monkeypatch):
    table = [(0, "a"), (1, "b"), (2, "c")]
    issued_queries: list[str] = []

    def fake_jdbc(self, url, query, properties=None, **kw):
        issued_queries.append(query)
        wm = int(query.split(">")[1].split(")")[0])
        rows = [r for r in table if r[0] > wm]
        return spark.createDataFrame(rows or [], "id long, name string")

    monkeypatch.setattr(DataFrameReader, "jdbc", fake_jdbc)
    ckpt = os.path.join(tmp_path, "wm.json")
    ing = IncrementingIngest(spark, "jdbc:fake://x", "players", "id", ckpt)

    # first poll: everything; watermark advances to 2
    assert ing.poll().count() == 3
    assert ing.watermark() == 2
    # steady state: nothing new -> empty, watermark unchanged
    assert ing.poll().count() == 0
    assert ing.watermark() == 2
    # new rows appear -> only the delta is read
    table.append((3, "d"))
    got = [tuple(r) for r in ing.poll().collect()]
    assert got == [(3, "d")]
    assert ing.watermark() == 3
    # the predicate is pushed into the dbtable subquery (DB-side filter)
    assert all("WHERE id >" in q for q in issued_queries)

    # restart from the persisted checkpoint: no re-read
    ing2 = IncrementingIngest(spark, "jdbc:fake://x", "players", "id", ckpt)
    assert ing2.watermark() == 3
    assert ing2.poll().count() == 0


def test_kafka_adapter_options_and_gating(spark):
    from ksql_query_tutorial_spark.sources import kafka as K

    opts = K.kafka_options("broker:9092", "players")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "players",
        "startingOffsets": "earliest",  # SET 'auto.offset.reset' analog
    }
    assert K.kafka_options("b", "t", starting_offsets="latest")[
        "startingOffsets"] == "latest"
    # no broker/connector in this container: the builder must gate
    # cleanly rather than fail deep inside .load()
    if not K.kafka_available(spark):
        import pytest
        from pyspark.sql import types as T

        with pytest.raises(NotImplementedError):
            K.read_stream(spark, "b:9092", "players", "id", "string",
                          T.StructType([T.StructField("name", T.StringType())]))


def test_file_roundtrip_all_formats(spark, tmp_path):
    """documents round-trips through parquet/json/csv with identical
    typed content; partitioned parquet write prunes at read."""
    from pyspark.sql import functions as F

    from ksql_query_tutorial_spark.sources.files import read_table, write_table
    from ksql_query_tutorial_spark.tables import load

    d = load(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text", "lang")
    want = {(r.doc_id, r.text, r.lang) for r in d.collect()}
    schema = "doc_id long, text string, lang string"

    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / fmt)
        write_table(d, path, fmt=fmt)
        back = read_table(spark, path, fmt=fmt,
                          schema=None if fmt in ("parquet", "orc")
                          else schema)
        got = {(r.doc_id, r.text, r.lang) for r in back.collect()}
        assert got == want, fmt

    # schema inference on text formats is refused
    import pytest

    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "json"), fmt="json")

    # partitioned write: partition filter prunes to one directory
    ppath = str(tmp_path / "part")
    write_table(d, ppath, fmt="parquet", partition_by=["lang"])
    langs = [r.lang for r in d.select("lang").distinct().collect()]
    one = read_table(spark, ppath).filter(F.col("lang") == langs[0])
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted")
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    assert one.count() == d.filter(F.col("lang") == langs[0]).count()


def test_write_table_files_per_partition_spreads_tasks(spark, tmp_path):
    """files_per_partition must actually fan each partition value over
    that many tasks (bounded above by it, spread by the row-hash salt —
    a partition-column-only repartition routes every value to ONE task)."""
    import os

    from ksql_query_tutorial_spark.sources.files import write_table
    from ksql_query_tutorial_spark.tables import load

    d = load(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text", "lang")
    path = str(tmp_path / "salted")
    write_table(d, path, fmt="parquet", partition_by=["lang"], files_per_partition=3)
    per_value = {}
    for entry in os.listdir(path):
        if not entry.startswith("lang="):
            continue
        files = [f for f in os.listdir(os.path.join(path, entry))
                 if f.endswith(".parquet")]
        per_value[entry] = len(files)
    assert per_value, "no partition directories written"
    assert all(1 <= n <= 3 for n in per_value.values()), per_value
    # with hundreds of rows per value, the salt must spread at least one
    # value over >1 file (P[all rows share a salt] is astronomically small)
    assert max(per_value.values()) > 1, per_value
    back = spark.read.parquet(path)
    assert back.count() == d.count()


def test_zorder_key_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from ksql_query_tutorial_spark.sources.files import zorder_key

    df = spark.createDataFrame(
        [(0b101, 0b011)], "x long, y long"
    ).select(zorder_key(F.col("x"), F.col("y"), bits=3).alias("z"))
    # x=101 -> odd positions (bits 5,3,1): 1,0,1; y=011 -> even (4,2,0):
    # 0,1,1 => bits 543210 = 100111 = 39
    assert df.collect()[0]["z"] == 0b100111


def test_zorder_files_bound_both_dimensions(spark):
    """The point of z-order: every file's min/max range is narrow in
    BOTH dimensions. On a uniform 64x64 grid split into 16 files, each
    file must span at most half the global range of each dim (a
    single-dim sort would give full-width ranges on the other dim)."""
    from pyspark.sql import functions as F

    from ksql_query_tutorial_spark.sources.files import zorder_file_stats

    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )
    stats = zorder_file_stats(grid, "x", "y", bits=6, n_files=16).collect()
    assert len(stats) == 16
    assert sum(r["n_rows"] for r in stats) == 64 * 64
    for r in stats:
        assert r["max_x"] - r["min_x"] <= 32, r
        assert r["max_y"] - r["min_y"] <= 32, r


def test_zorder_plan_broadcast_bounds_no_sort(spark):
    """One broadcast of the 4-cell bounds row over the scan, a single
    bounded groupBy — no range partitioning, no Python."""
    from ksql_query_tutorial_spark.plans.checks import (
        assert_no_python,
        executed_plan,
    )
    from ksql_query_tutorial_spark.sources.files import zorder_file_stats
    from ksql_query_tutorial_spark.tables import load
    from pyspark.sql import functions as F

    o = load(spark, "/root/testdata/sf0.001", "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("o_day"),
    )
    df = zorder_file_stats(o, "o_custkey", "o_day")
    assert_no_python(df)
    plan = executed_plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_zorder_rejects_non_power_of_two_files(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ksql_query_tutorial_spark.sources.files import zorder_file_stats

    df = spark.range(10).select("id", (F.col("id") * 0).alias("y"))
    with _pytest.raises(ValueError):
        zorder_file_stats(df, "id", "y", n_files=48)
