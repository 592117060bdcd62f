"""Audit every declared query's executed plan for duplicated heavy
expressions (r7 follow-up to the checksum-exposed blowups).

The four r7 fixes shared one signature: an expensive per-row expression
(regex tokenizer, HOF transform) appearing multiple times in the
physical plan because Catalyst inlined it into an inferred filter, a
second scan branch, or repeated uses inside one Project. This sweep
counts, per query, the plan-string occurrences of the known heavy
expression heads and reports queries where a head appears >= the
threshold — candidates for a projection boundary or restructure.

A count above 1 is NOT automatically a bug (legitimate two-branch
shapes re-tokenize by measured choice — see STRESS.md scan-audit
burn-down); the audit exists so every multiplicity is a DECISION.

Usage: python tools/expr_dup_audit.py [threshold]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY_HEADS = [
    "split(lower",            # whitespace tokenizer
    "regexp_extract_all",     # BPE-ish tokenizer
    "lambdafunction",         # any HOF body
    "regexp_replace",
    "sentences(",
    "array_distinct",
    "array_intersect",
    "aggregate(",             # interpreted fold
]


def main() -> int:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from ksql_query_tutorial_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark(app_name="expr-dup-audit", cpus="8")
    qs = em.queries()
    flagged = 0
    for name in sorted(qs):
        try:
            plan = qs[name](spark, sf_dir)._jdf.queryExecution() \
                .executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: PLAN ERROR {e}")
            flagged += 1
            continue
        hits = {h: plan.count(h) for h in HEAVY_HEADS}
        bad = {h: c for h, c in hits.items() if c >= threshold}
        if bad:
            flagged += 1
            print(f"{name}: {bad}")
    print(f"\n{flagged} queries with a heavy head >= {threshold}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
