#!/usr/bin/env python3
"""Compare a bench pair against a reference pair on common queries.

Usage: bench_pair_compare.py runA1.json runA2.json refB1.json refB2.json

Pair-min semantics (the ledger rule): for each query take the MIN of the
two runs on each side — the min suppresses one-off GC/JIT hiccups that a
single run or a mean would keep — then report total ratio and any query
whose A/B ratio exceeds 1.5x.
"""
import json
import sys


def pair_min(p1, p2):
    a = json.load(open(p1))["queries"]
    b = json.load(open(p2))["queries"]
    return {k: min(a[k], b[k]) for k in a if k in b
            and a[k] > 0 and b[k] > 0}


def main():
    a = pair_min(sys.argv[1], sys.argv[2])
    b = pair_min(sys.argv[3], sys.argv[4])
    common = sorted(set(a) & set(b))
    ta = sum(a[k] for k in common)
    tb = sum(b[k] for k in common)
    print(f"common queries: {len(common)}")
    print(f"pair-min totals: new {ta:.1f} s vs ref {tb:.1f} s "
          f"= {ta / tb:.3f}x")
    slow = [(a[k] / b[k], k, a[k], b[k]) for k in common
            if a[k] / b[k] > 1.5]
    print(f"queries >1.5x slower than ref: {len(slow)}")
    for r, k, x, y in sorted(slow, reverse=True):
        print(f"  {k}: {x:.2f} s vs {y:.2f} s = {r:.2f}x")
    new_only = sorted(set(a) - set(b))
    if new_only:
        print(f"new-only queries ({len(new_only)}): "
              f"{sum(a[k] for k in new_only):.1f} s total")
        for k in new_only:
            print(f"  {k}: {a[k]:.2f} s")


if __name__ == "__main__":
    main()
