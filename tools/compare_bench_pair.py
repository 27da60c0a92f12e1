#!/usr/bin/env python3
"""Adjudicate a consecutive bench pair: agreement between the two runs,
and each run against a prior reference ledger (default BENCH_r09, the
last committed low-load builder run). Usage:

  python3 tools/compare_bench_pair.py run1.json run2.json [ref.json]
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    r1, r2 = load(sys.argv[1]), load(sys.argv[2])
    ref = load(sys.argv[3]) if len(sys.argv) > 3 else None
    q1, q2 = r1["queries"], r2["queries"]
    common = sorted(set(q1) & set(q2))
    t1 = sum(q1[q] for q in common)
    t2 = sum(q2[q] for q in common)
    print(f"pair: {len(common)} common queries, totals {t1:.1f}s vs {t2:.1f}s "
          f"({t2 / t1:.3f}x), loads {r1['load']['loadavg1_start']} / "
          f"{r2['load']['loadavg1_start']}")
    drift = [(max(q1[q], q2[q]) / min(q1[q], q2[q]), q) for q in common
             if min(q1[q], q2[q]) > 0.5]
    drift.sort(reverse=True)
    print("largest pair drift (>0.5s queries):")
    for d, q in drift[:8]:
        print(f"  {q}: {q1[q]:.2f} vs {q2[q]:.2f} ({d:.2f}x)")
    if ref:
        qr = ref["queries"]
        ref_common = sorted(set(qr) & set(common))
        tr = sum(qr[q] for q in ref_common)
        tp = sum(min(q1[q], q2[q]) for q in ref_common)
        print(f"\nvs ref ({sys.argv[3]}): {len(ref_common)} common, "
              f"ref {tr:.1f}s vs pair-min {tp:.1f}s ({tp / tr:.3f}x)")
        worse = [(min(q1[q], q2[q]) / qr[q], q) for q in ref_common
                 if qr[q] > 0.3 and min(q1[q], q2[q]) / qr[q] > 1.5]
        worse.sort(reverse=True)
        print("queries >1.5x slower than ref (pair-min):")
        for d, q in worse:
            print(f"  {q}: ref {qr[q]:.2f} -> {min(q1[q], q2[q]):.2f} ({d:.2f}x)")


if __name__ == "__main__":
    main()
