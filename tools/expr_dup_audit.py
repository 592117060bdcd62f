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

Usage:
    python tools/expr_dup_audit.py [threshold]       # report >= threshold
    python tools/expr_dup_audit.py --write-pins      # refresh the standing
        gate's pinned counts (tests/expr_dup_pins.json) after an
        INTENTIONAL plan change — tests/test_expr_dup.py fails any query
        whose heavy-head count exceeds its pin (VERDICT r7 #6)
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


PINS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "expr_dup_pins.json",
)
# counts below this are free (normal expression reprints across plan
# nodes); at or above, the count must be pinned
FREE_LIMIT = 3
PIN_SF = "/root/testdata/sf0.001"


def plan_counts(spark, qs, sf_dir):
    """{query: {head: count}} over executedPlan strings, counts >= FREE_LIMIT."""
    out = {}
    for name in sorted(qs):
        plan = qs[name](spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        hits = {h: plan.count(h) for h in HEAVY_HEADS
                if plan.count(h) >= FREE_LIMIT}
        if hits:
            out[name] = hits
    return out


def main() -> int:
    import json

    write_pins = "--write-pins" in sys.argv[1:]
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    threshold = int(pos[0]) if pos else 3
    sf_dir = PIN_SF if write_pins else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from ksql_query_tutorial_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark(app_name="expr-dup-audit", cpus="8")
    qs = em.queries()

    if write_pins:
        pins = plan_counts(spark, qs, PIN_SF)
        with open(PINS_PATH, "w") as f:
            json.dump(pins, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {len(pins)} pinned queries to {PINS_PATH}")
        return 0

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
