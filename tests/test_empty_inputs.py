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
