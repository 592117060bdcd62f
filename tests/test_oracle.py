"""Every declared query vs its DuckDB oracle at sf0.001 (local mirror of
the driver's t2 correctness gate — SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle_or_is_declared_weak():
    """Coverage honesty gate (VERDICT r3 #7): every declared query must
    carry a full DuckDB value-hash oracle — exercised for ALL of them by
    test_query_matches_oracle below, whether or not they sit inside the
    driver's 50-entry window — except an EXACT allow-list of queries
    that are provably non-oracle-able, each of which must have its own
    dedicated in-repo verification test."""
    weak = set(QUERIES) - set(ORACLES)
    # ann_ivf_topk: recall < 1 by construction with driver-trained
    # centroids (proof in its docstring); verified instead by
    # tests/test_extensions.py::test_ivf_topk_structure_and_recall.
    # ann_pq_topk: PQ codes quantize the corpus side, so ranks/scores
    # are approximate by construction; verified by
    # tests/test_extensions.py::test_pq_topk_structure_and_recall.
    allowed_weak = {"ann_ivf_topk", "ann_pq_topk"}
    assert weak == allowed_weak, (
        f"oracle coverage drifted: unexpected weak={weak - allowed_weak}, "
        f"stale allow-list={allowed_weak - weak}"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    assert name in QUERIES, f"oracle {name} has no query"
    df = QUERIES[name](spark, SF_ORACLE)
    assert_matches_oracle(df, ORACLES[name], SF_ORACLE, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_runs_at_tiniest_sf(spark):
    """Smoke: every declared query executes at sf0.001 (near-empty
    inputs — winnowing windows, LSH buckets, CC loops etc. must not
    crash on degenerate sizes)."""
    from ksql_query_tutorial_spark.extensions import EXTENSION_QUERIES
    from ksql_query_tutorial_spark.queries import TUTORIAL_QUERIES

    sf = "/root/testdata/sf0.001"
    for name, fn in {**TUTORIAL_QUERIES, **EXTENSION_QUERIES}.items():
        df = fn(spark, sf)
        assert df.count() >= 0, name
        assert df.columns, name
