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
    # queries without oracles get the driver's weaker rows-only check;
    # keep that set intentional and small.
    weak = set(QUERIES) - set(ORACLES)
    allowed_weak = {
        k for k in QUERIES
        if k.startswith(("dedup_minhash", "dedup_simhash", "dedup_embedding_lsh",
                         "ann_", "mm_"))
    }
    assert weak <= allowed_weak, f"unexpected oracle-less queries: {weak - allowed_weak}"


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
