#!/usr/bin/env python3
"""Compare two BENCH_FULL-style JSON lines (sf0.1 vs sf1.0 rehearsal) and
flag queries scaling worse than ~linear in the 10x data factor.

Usage: python3 tools/scale_compare.py BENCH_SF01.json BENCH_SF10.json [factor]

Interpretation notes (why "ratio > factor" alone is not the flag):
- Sub-second sf0.1 queries are dominated by fixed per-query overhead
  (session setup, planning, JIT-warm stage launch), so their ratio
  understates asymptotic cost; conversely a 0.2s -> 2.5s move is noise.
  We therefore flag on BOTH ratio > 1.3*factor AND sf1.0 time > 2s.
- Pair-producing dedup queries legitimately grow superlinearly in the
  rehearsal because ScaleUp deliberately makes replicas near-duplicates
  (clusters of `factor`): true-pair count grows ~factor^2/2. Those are
  reviewed by hand, not auto-excused here.
"""
import json, sys

def load(path):
    with open(path) as f:
        return json.loads(f.readline())

a = load(sys.argv[1])  # sf0.1
b = load(sys.argv[2])  # sf1.0
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
rows = []
for q in common:
    ta, tb = qa[q], qb[q]
    if ta is None or tb is None:
        rows.append((float("inf"), q, ta, tb))
        continue
    rows.append((tb / max(ta, 1e-9), q, ta, tb))

rows.sort(reverse=True)
print(f"{'query':30s} {'sf0.1':>8s} {'sf1.0':>8s} {'ratio':>7s}  flag")
flagged = 0
for r, q, ta, tb in rows:
    flag = ""
    if ta is None or tb is None:
        flag = "FAILED"
        flagged += 1
    elif r > 1.3 * factor and tb > 2.0:
        flag = "SUPERLINEAR"
        flagged += 1
    elif r > factor and tb > 2.0:
        flag = "watch"
    if flag or r > 0:
        print(f"{q:30s} {ta if ta is not None else float('nan'):8.2f} "
              f"{tb if tb is not None else float('nan'):8.2f} {r:7.2f}  {flag}")
print(f"\nTotals: sf0.1 {a['value']:.1f}s -> sf1.0 {b['value']:.1f}s "
      f"(x{b['value']/a['value']:.2f} for {factor:.0f}x data); "
      f"{flagged} flagged; sf1.0 failed={b.get('failed')}")
only_b = sorted(set(qb) - set(qa))
if only_b:
    print(f"only in sf1.0 run: {only_b}")
