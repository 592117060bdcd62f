"""Driver-window hygiene gates (VERDICT r7 #2).

The driver's correctness gate records the FIRST 50 ``queries()``
entries and hash-compares each against its DuckDB oracle at sf0.01.
A query that returns 0 rows at that scale "passes" trivially — an
empty frame hashes equal to an empty frame — so a window slot spent
on it is near-zero evidence (the r7 rotation dodged exactly this trap
by hand for ``supplier_single_source``). These gates make the guard
systematic:

1. every declared query yields >=1 row at the driver's sf (sf0.01),
   or sits in an EXACT, documented exemption list;
2. the 50-slot window itself is structurally sound — every slot has a
   strict-hash oracle and no exempt (0-row) query occupies a slot.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DRIVER = "/root/testdata/sf0.01"

QUERIES = entrymod.queries()

# Queries allowed to return 0 rows at sf0.01, each with the reason a
# larger scale is required. Anything else returning an empty frame at
# the driver sf is a bug (either the query or the fixture sizing).
ZERO_ROW_EXEMPT = {
    # Flags suppliers that are the SOLE source of some part. At
    # sf0.01 every part has >=2 suppliers (partsupp fan-out is 4-ish
    # and the supplier pool is small), so the correct answer IS empty;
    # at sf>=0.1 the tail thins and rows appear. Kept out of the
    # driver window for exactly that reason (see _GATE_PRIORITY).
    "supplier_single_source",
}


def test_exemption_list_is_exact():
    """Every exemption names a real query (no stale entries)."""
    stale = ZERO_ROW_EXEMPT - set(QUERIES)
    assert not stale, f"exemptions for unknown queries: {stale}"


def test_window_structure():
    """First 50 = 30 tutorial queries + the LSH anchor + 19 rotation
    picks; every slot oracle-backed, no exempt query burns a slot."""
    names = list(QUERIES)
    window = names[:50]
    oracles = entrymod.oracle_sql()
    assert [n for n in window if n.startswith("q")][:30] == window[:30], (
        "tutorial queries must fill slots 1-30")
    assert window[30] == "dedup_minhash_lsh", "family anchor moved"
    missing_oracle = [n for n in window if n not in oracles]
    assert not missing_oracle, (
        f"window slots without a strict-hash oracle: {missing_oracle}")
    wasted = set(window) & ZERO_ROW_EXEMPT
    assert not wasted, f"0-row queries occupying window slots: {wasted}"
    assert len(set(window)) == 50


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_nondegenerate_at_driver_sf(spark, name):
    """>=1 row at sf0.01 (driver scale), or a documented exemption."""
    rows = QUERIES[name](spark, SF_DRIVER).take(1)
    spark.catalog.clearCache()
    if name in ZERO_ROW_EXEMPT:
        assert not rows, (
            f"{name} now returns rows at sf0.01 — remove the exemption "
            f"and consider it for a future driver-window rotation")
    else:
        assert rows, (
            f"{name} returns 0 rows at the driver sf — a window slot "
            f"spent on it would be a trivially-matching empty frame; "
            f"fix the query/fixture or add a documented exemption")
