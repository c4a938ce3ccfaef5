#!/usr/bin/env python3
"""Compare two Bench full-sweep JSONs (sf0.1 vs sf1) and print the
per-query scale ratios, worst first. Usage:
  python3 tools/ratios.py target/sweep_sf01.json target/sweep_sf1.json [min_base_sec]

min_base_sec (default 0.15): queries cheaper than this at the base tier
are fixed-cost-bound — their ratios measure session overhead, not scaling —
and are summarized instead of listed.
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
min_base = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15

qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
missing = sorted(set(qa) ^ set(qb))
if missing:
    print(f"NOT IN BOTH: {missing}")
print(f"calib base={a.get('calib')} scaled={b.get('calib')}  "
      f"n base={len(qa)} scaled={len(qb)}")
print(f"total base={a['value']:.1f}s scaled={b['value']:.1f}s "
      f"ratio={b['value']/a['value']:.2f}x")

rows = []
small = []
for q in shared:
    if qa[q] <= 0 or qb[q] <= 0:
        print(f"FAILED/NEGATIVE: {q} base={qa[q]} scaled={qb[q]}")
        continue
    r = qb[q] / qa[q]
    if qa[q] < min_base and qb[q] < 10 * min_base:
        small.append((q, r))
        continue
    rows.append((r, q))

rows.sort(reverse=True)
print(f"\n{'query':32s} {'sf0.1':>7s} {'sf1':>7s} {'ratio':>6s}")
for r, q in rows:
    flag = "  <-- SUPERLINEAR" if r > 10 else ("  ! near-limit" if r > 8 else "")
    print(f"{q:32s} {qa[q]:7.3f} {qb[q]:7.3f} {r:5.1f}x{flag}")
print(f"\n{len(small)} fixed-cost-bound queries (base < {min_base}s, scaled < "
      f"{10*min_base}s) all trivially inside budget; worst of them: "
      + (", ".join(f"{q}={r:.1f}x" for q, r in sorted(small, key=lambda x: -x[1])[:5])))
