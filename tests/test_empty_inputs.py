"""Empty-input robustness gate: EVERY declared query must execute
(zero or more rows, no exception) against a fixture whose tables have
the right schemas but no rows.

This is the bug class behind round 3's bench crash (an operator that
only worked when its input produced groups): empty sources are routine
at 100 TB — a partition filter that matches nothing, a day with no
events, a fresh benchmark split — and a query that throws on them
takes down the whole job. The Bloom decontamination empty-bench fix
established the policy; this test enforces it for the full surface.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

# All-240-query sweep: excluded from the driver-facing default run
# (pytest.ini addopts); run with -m slow / -m "".
pytestmark = pytest.mark.slow

QUERIES = entrymod.queries()

# Ops whose CONTRACT requires non-empty input (they raise a clear
# ValueError, not an internal error): none currently. Add (name,
# exc_type) here only with a docstring-documented reason.
EXPECTED_RAISERS: dict[str, type] = {}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Schema-identical, zero-row copies of every fixture table."""
    d = str(tmp_path_factory.mktemp("sf-empty"))
    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        df.limit(0).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    if name in EXPECTED_RAISERS:
        with pytest.raises(EXPECTED_RAISERS[name]):
            QUERIES[name](spark, empty_sf_dir).count()
        return
    n = QUERIES[name](spark, empty_sf_dir).count()
    assert n >= 0


def test_topk_operators_with_empty_query_side(spark):
    """Empty QUERY set against a non-empty corpus (the other half of
    the empty-input matrix for the broadcast-matrix searches): typed
    empty results, no np.stack crash."""
    from ksql_query_tutorial_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
        quantized_topk,
    )
    from ksql_query_tutorial_spark.tables import load

    corpus = load(spark, "/root/testdata/sf0.001", "embeddings")
    empty = corpus.filter("vec_id < 0")
    for fn in (brute_force_topk, quantized_topk, pq_topk):
        out = fn(corpus, empty)
        assert out.count() == 0
        assert out.columns[:3] == ["query_id", "neighbor_id", "rank"]


@pytest.fixture(scope="module")
def nullrow_sf_dir(spark, tmp_path_factory):
    """sf0.001 plus planted NULL-bearing rows: documents with NULL
    text/lang/source, events with NULL value/props/event_type — the
    dirty-input class every 100 TB source contains."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("sf-nulls"))
    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        spark.read.parquet(os.path.join(src, f"{t}.parquet")) \
            .write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    base = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dirty_docs = spark.createDataFrame(
        [
            (base, None, "en", "src0", None),
            (base + 1, "some text here okay", None, None, 19),
            (base + 2, None, None, None, None),
        ],
        docs.schema,
    )
    docs.unionByName(dirty_docs).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )

    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    emax = ev.agg(F.max("event_id")).collect()[0][0] + 1
    ts = ev.select("ts").first()[0]
    dirty_ev = spark.createDataFrame(
        [
            (emax, ts, 1, None, None, None),
            (emax + 1, ts, None, "click", 1.5, None),
        ],
        ev.schema,
    )
    ev.unionByName(dirty_ev).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_null_rows(spark, nullrow_sf_dir, name):
    """NULL text/lang/props/value/event_type rows must not crash any
    query — NULLs propagate through expressions, drop out of joins
    and explodes, and count as empty where a contract needs a row."""
    n = QUERIES[name](spark, nullrow_sf_dir).count()
    assert n >= 0


@pytest.fixture(scope="module")
def extreme_sf_dir(spark, tmp_path_factory):
    """sf0.001 plus adversarial rows: a 200k-char single-token doc, a
    unicode (emoji/CJK/RTL) doc, a whitespace-only doc, a 10k-times
    repeated-token doc, and events with extreme double values."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("sf-extreme"))
    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        spark.read.parquet(os.path.join(src, f"{t}.parquet")) \
            .write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    base = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    extreme = [
        (base, "x" * 200_000, "en", "src0", 200_000),
        (base + 1, "emoji 🙂🚀 汉字 مرحبا עברית mixed", "xx", "srcU", 30),
        (base + 2, "   \t  \t ", "en", "src0", 8),
        (base + 3, " ".join(["tok"] * 10_000), "en", "src1", 39_999),
    ]
    docs.unionByName(
        spark.createDataFrame(extreme, docs.schema)
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    emax = ev.agg(F.max("event_id")).collect()[0][0] + 1
    ts = ev.select("ts").first()[0]
    dirty = [
        (emax, ts, 7, "view", 1e308, "{}"),
        (emax + 1, ts, 7, "click", -1e308, '{"k": 999999999999}'),
        (emax + 2, ts, 7, "purchase", 0.0, "not json at all"),
    ]
    ev.unionByName(
        spark.createDataFrame(dirty, ev.schema)
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_extreme_rows(spark, extreme_sf_dir, name):
    """Giant/unicode/degenerate documents and extreme numeric values
    must not crash any query (slow is acceptable; throwing is not)."""
    n = QUERIES[name](spark, extreme_sf_dir).count()
    assert n >= 0
