"""Duplicate-plan-subtree audit (r8 follow-up to the sweep-rung wins).

The r8 rewires (dedup_shingle_sweep, embedding_threshold_sweep,
graph pair) shared one signature: an EXPENSIVE subtree (join, Arrow
stage, aggregate over a scan) appearing twice in the physical plan
because two aggregate branches consumed the same un-cached frame.
AQE's ReusedExchange rescues only identical exchanges that survive
canonicalization — self-join aliasing and broadcast builds defeat it.

This sweep walks every declared query's executed plan, canonicalizes
each subtree by its verboseString head chain, and reports subtrees
that (a) appear >= 2 times, (b) contain a cost marker (Exchange,
Arrow-Python stage, parquet scan), and (c) are not under an
InMemoryTableScan (a cached frame consumed twice is the FIX, not the
bug). Hits are candidates for cache.pin() or a single-pass
restructure — each multiplicity should be a DECISION, as with
tools/expr_dup_audit.py.

Usage: python tools/dup_subtree_audit.py [min_nodes]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COST_MARKERS = ("Exchange", "ArrowEvalPython", "MapInPandas",
                "FlatMapGroupsInPandas", "Scan parquet")


def subtree_sigs(jnode, min_nodes: int, out: Counter, depth: int = 0):
    """Collect a canonicalized signature per subtree with >= min_nodes
    nodes (Spark's own plan canonicalization normalizes expression IDs,
    so two instances of the same computation match while same-shaped-
    but-different computations do not). Returns the node count. Does
    NOT descend into cached relations (InMemoryTableScan) — reuse
    through the cache is intended behavior."""
    name = jnode.nodeName()
    if name == "InMemoryTableScan":
        return 1
    if name == "AdaptiveSparkPlan":
        return subtree_sigs(jnode.executedPlan(), min_nodes, out, depth)
    if name.startswith("ReusedExchange") or name == "ReusedSubquery":
        return 1  # already deduplicated at runtime
    kids = jnode.children()
    n = 1
    for i in range(kids.size()):
        n += subtree_sigs(kids.apply(i), min_nodes, out, depth + 1)
    if n >= min_nodes:
        out[jnode.canonicalized().toString()] += 1
    return n


def main() -> int:
    min_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    from ksql_query_tutorial_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark(app_name="dup-subtree-audit", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    flagged = 0
    for name in sorted(qs):
        try:
            jplan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: PLAN ERROR {e}")
            continue
        sigs: Counter = Counter()
        subtree_sigs(jplan, min_nodes, sigs)
        dups = {s: c for s, c in sigs.items()
                if c >= 2 and any(m in s for m in COST_MARKERS)}
        if dups:
            # report only maximal duplicated subtrees (drop ones that
            # are substrings of a bigger duplicated signature)
            maximal = [sig for sig in dups
                       if not any(sig != t and sig in t for t in dups)]
            flagged += 1
            for sig in sorted(maximal, key=len, reverse=True)[:2]:
                head = " <- ".join(
                    ln.strip().lstrip("+-: ").split(" ", 1)[0]
                    for ln in sig.splitlines()[:8] if ln.strip()
                )
                print(f"{name}: x{dups[sig]} {head[:170]}")
    print(f"\n{flagged} queries with duplicated costly subtrees")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
