"""Windowed streaming operators: stream–stream interval join, session
windows, watermark late-data policy, bounded-state dedup — the
capabilities the reference declares but never exercises
(README.md:356-360; SURVEY.md §2.5 'absent' list)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ksql_query_tutorial_spark.streaming import replay as R
from ksql_query_tutorial_spark.streaming import windows as W

TS = T.StructType([
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("k", T.StringType(), True),
    T.StructField("v", T.LongType(), True),
])


def ts_rows(*specs):
    return [{"ts": f"2024-01-01T00:{m:02d}:{s:02d}", "k": k, "v": v}
            for (m, s, k, v) in specs]


def test_session_window_agg_stream(spark):
    """Two bursts for key 'a' separated by > gap → two sessions.

    Session aggregations only support APPEND mode (sessions emit once
    the watermark closes them), so a sentinel row at 00:30 advances the
    watermark past every real session."""
    rows = ts_rows((0, 0, "a", 1), (0, 30, "a", 1), (1, 0, "a", 1),
                   (5, 0, "a", 1), (5, 20, "a", 1),
                   (0, 10, "b", 1),
                   (30, 0, "zz_sentinel", 1))
    q = R.replay(
        spark, rows, TS,
        lambda df: W.session_agg(df, "ts", "2 minutes", ["k"],
                                 [F.count("*").alias("n")], watermark="10 minutes"),
        name="sess", output_mode="append", with_batch_id=True, chunk_size=2,
    )
    final = {}
    for _, r in q.emissions:
        final[(r.k, str(r.session_start))] = r.n
    a_sessions = {k: v for k, v in final.items() if k[0] == "a"}
    assert len(a_sessions) == 2, f"expected 2 sessions for 'a', got {a_sessions}"
    assert sorted(a_sessions.values()) == [2, 3]
    assert sum(1 for k in final if k[0] == "b") == 1


def test_interval_join_stream_stream(spark, tmp_path):
    """Windowed stream–stream inner join: clicks within 1 minute after
    an impression match; outside the bound they don't."""
    imps = ts_rows((0, 0, "x", 1), (2, 0, "y", 1))
    clicks = ts_rows((0, 30, "x", 10),   # within 1 min of x-impression
                     (4, 0, "y", 20))    # 2 min after y → outside bound
    d1, d2 = str(tmp_path / "imps"), str(tmp_path / "clicks")
    R.write_chunks(d1, imps, chunk_size=1)
    R.write_chunks(d2, clicks, chunk_size=1)
    left = R.stream_source(spark, d1, TS).withColumnRenamed("ts", "imp_ts") \
        .withColumnRenamed("v", "imp_v")
    right = R.stream_source(spark, d2, TS).withColumnRenamed("ts", "click_ts") \
        .withColumnRenamed("k", "k2").withColumnRenamed("v", "click_v")
    joined = W.interval_join(
        left, right, F.col("k") == F.col("k2"), "imp_ts", "click_ts",
        lower="interval 0 seconds", upper="interval 1 minute",
        watermark="10 minutes",
    ).select("k", "imp_ts", "click_ts", "click_v")
    q = R.run_to_memory(joined, "ij", output_mode="append", with_batch_id=True)
    rows = [r for _, r in q.emissions]
    assert {(r.k, r.click_v) for r in rows} == {("x", 10)}


def test_dedup_within_watermark_stream(spark):
    """Duplicate keys within the watermark horizon are dropped."""
    rows = ts_rows((0, 0, "a", 1), (0, 20, "a", 1), (0, 40, "b", 1),
                   (1, 0, "a", 1), (1, 10, "c", 1))
    q = R.replay(
        spark, rows, TS,
        lambda df: W.dedup_within_watermark(df, "ts", ["k"], watermark="10 minutes"),
        name="ddw", output_mode="append", with_batch_id=True, chunk_size=1,
    )
    keys = [r.k for _, r in q.emissions]
    assert sorted(keys) == ["a", "b", "c"]


def test_late_row_dropped_by_watermark(spark):
    """Late-data policy (ksqlDB grace-period analog), APPEND mode —
    where the drop is GUARANTEED: a closed window emits exactly once,
    so a row arriving after the watermark closed its window cannot be
    counted. (In update mode Spark's contract is weaker: late rows
    "may" be dropped — un-evicted state can still absorb them; verified
    empirically, so the strict test pins append mode.)"""
    rows = (
        ts_rows((0, 10, "a", 1))
        + ts_rows((30, 0, "a", 1))          # advances watermark to 00:25
        + ts_rows((31, 0, "a", 1))          # watermark PROPAGATES (the
        # late-input filter runs on the previous batch's watermark —
        # one-batch propagation delay, verified empirically)
        + ts_rows((0, 50, "a", 1))          # late: window 00:00 closed
    )
    q = R.replay(
        spark, rows, TS,
        lambda df: (
            df.withWatermark("ts", "5 minutes")
            .groupBy(F.window("ts", "1 minute"), "k")
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("ws"), "k", "n")
        ),
        name="late", output_mode="append", with_batch_id=True, chunk_size=1,
    )
    final = {str(r.ws): r.n for _, r in q.emissions}
    # window 00:00 emitted once, with the late third row excluded
    assert final == {"2024-01-01 00:00:00": 1}

def test_hopping_window_stream_matches_batch_twin(spark):
    """Hopping-window counts computed by the STREAM (F.window with a
    slide, update mode) equal the batch twin's integer-epoch fan-out
    on the same rows — same epoch-aligned window grid, same counts."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = ts_rows((0, 10, "u1", 1), (2, 0, "u1", 1), (7, 30, "u2", 1),
                   (12, 0, "u3", 1))
    q = R.replay(
        spark, rows, TS,
        lambda df: W.hopping_agg(
            df, "ts", "10 minutes", "5 minutes", [],
            [F.count("*").alias("n_events")],
        ),
        name="hop", output_mode="update", with_batch_id=True, chunk_size=2,
    )
    final = {}
    for _, r in q.emissions:
        final[str(r.window_start)] = r.n_events

    # batch twin on the same grid (10-min windows hopping every 5):
    # the same integer-epoch fan-out hopping_window_counts uses,
    # expressed at minutes granularity
    hop_us = 5 * 60 * 1_000_000
    n_hops = 2
    src = spark.createDataFrame(
        [(r["k"], r["ts"]) for r in rows], "user_id string, d string"
    ).selectExpr("user_id", "cast(d as timestamp_ntz) as ts")
    h = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / hop_us)
    contrib = src.select(
        "user_id", F.explode(F.sequence(h - (n_hops - 1), h)).alias("hp")
    )
    expected = {
        str(r["window_start"]): r["n_events"]
        for r in contrib.groupBy(
            F.timestamp_micros(F.col("hp") * hop_us).alias("window_start")
        ).agg(F.count(F.lit(1)).alias("n_events")).collect()
    }
    assert final == expected, (final, expected)


def test_interval_join_left_outer_null_pads_on_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: an impression with no
    click in its window emits null-padded — but only after the global
    watermark passes the window end (plus one batch of propagation);
    matched rows emit normally."""
    imps = (
        ts_rows((0, 0, "x", 1), (0, 10, "y", 1))
        + ts_rows((40, 0, "zz", 1))        # advance left watermark
        + ts_rows((41, 0, "zz", 1))        # propagation batch
    )
    clicks = (
        ts_rows((0, 30, "x", 10))
        + ts_rows((40, 0, "none", 99))     # advance right watermark
        + ts_rows((41, 0, "none", 99))
    )
    d1, d2 = str(tmp_path / "imps"), str(tmp_path / "clicks")
    R.write_chunks(d1, imps, chunk_size=1)
    R.write_chunks(d2, clicks, chunk_size=1)
    left = R.stream_source(spark, d1, TS).withColumnRenamed("ts", "imp_ts") \
        .withColumnRenamed("v", "imp_v")
    right = R.stream_source(spark, d2, TS).withColumnRenamed("ts", "click_ts") \
        .withColumnRenamed("k", "k2").withColumnRenamed("v", "click_v")
    joined = W.interval_join(
        left, right, F.col("k") == F.col("k2"), "imp_ts", "click_ts",
        lower="interval 0 seconds", upper="interval 1 minute",
        watermark="1 minute", how="left_outer",
    ).select("k", "imp_ts", "click_ts", "click_v")
    q = R.run_to_memory(joined, "ijlo", output_mode="append",
                        with_batch_id=True)
    got = {(r.k, r.click_v) for _, r in q.emissions if r.k in ("x", "y")}
    assert got == {("x", 10), ("y", None)}
