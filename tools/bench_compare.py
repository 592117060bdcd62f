"""Round-over-round benchmark comparison: BENCH_r{N}.json deltas.

Prints the shared-query subtotal, the worst per-query regressions, and
the cost of newly added queries — the analysis each round's plan audit
starts from. Usage:

    python tools/bench_compare.py BENCH_r04.json BENCH_r05.json
    python tools/bench_compare.py            # newest two BENCH_r*.json
"""

from __future__ import annotations

import glob
import json
import sys


def load(path: str) -> dict[str, float]:
    raw = json.load(open(path))
    parsed = raw.get("parsed", raw)
    if not parsed or "queries" not in parsed:
        raise SystemExit(
            f"{path}: no parsed queries (crashed bench run, rc="
            f"{raw.get('rc')}) — pick a valid round"
        )
    return parsed["queries"]


def main() -> None:
    if len(sys.argv) >= 3:
        a_path, b_path = sys.argv[1], sys.argv[2]
    else:
        paths = sorted(glob.glob("BENCH_r*.json"))
        if len(paths) < 2:
            raise SystemExit("need two BENCH_r*.json files")
        a_path, b_path = paths[-2], paths[-1]
    a, b = load(a_path), load(b_path)

    shared = sorted(set(a) & set(b))
    sa, sb = sum(a[q] for q in shared), sum(b[q] for q in shared)
    print(f"{a_path} -> {b_path}")
    print(f"shared queries: {len(shared)}  {sa:.2f}s -> {sb:.2f}s "
          f"({sb / sa:.2f}x)")

    movers = sorted(((b[q] / a[q], q) for q in shared), reverse=True)
    print("\nworst movers (ratio, old s, new s):")
    for r, q in movers[:10]:
        print(f"  {q:32s} {r:5.2f}x  {a[q]:6.2f} -> {b[q]:6.2f}")
    regress_2x = [q for r, q in movers if r >= 2.0]
    print(f"\n>=2x regressions: {len(regress_2x)} {regress_2x or ''}")

    new = sorted(set(b) - set(a), key=lambda q: -b[q])
    if new:
        print(f"\nnew queries ({len(new)}, {sum(b[q] for q in new):.2f}s):")
        for q in new:
            print(f"  {q:32s} {b[q]:6.2f}")
    gone = sorted(set(a) - set(b))
    if gone:
        print(f"\nremoved queries: {gone}")


if __name__ == "__main__":
    main()
