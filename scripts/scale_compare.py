#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1) and print per-query
scaling factors, sorted worst-first. Usage:
  python3 scripts/scale_compare.py BENCH_r08.json /tmp/bench_sf1.json [data_ratio]
data_ratio defaults to 10 (sf0.1 -> sf1). Queries whose time ratio
exceeds the data ratio are flagged SUPERLINEAR."""
import json, sys

def load(p):
    with open(p) as f:
        txt = f.read().strip()
    # the file may be a raw JSON line or contain one
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    return json.loads(txt)

a = load(sys.argv[1]); b = load(sys.argv[2])
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
qa, qb = a["queries"], b["queries"]
rows = []
for q in sorted(set(qa) & set(qb)):
    r = qb[q] / qa[q] if qa[q] > 0 else float("inf")
    rows.append((r, q, qa[q], qb[q]))
rows.sort(reverse=True)
print(f"{'query':36s} {'base_s':>8s} {'scaled_s':>9s} {'ratio':>7s}  flag")
for r, q, ta, tb in rows:
    flag = "SUPERLINEAR" if r > ratio else ("sublinear" if r < 2 else "")
    print(f"{q:36s} {ta:8.2f} {tb:9.2f} {r:7.2f}  {flag}")
only_a = set(qa) - set(qb); only_b = set(qb) - set(qa)
if only_a: print("missing in scaled run:", sorted(only_a))
if only_b: print("new in scaled run:", sorted(only_b))
print(f"TOTALS base={a['value']:.1f}s scaled={b['value']:.1f}s "
      f"ratio={b['value']/a['value']:.2f} (data x{ratio:.0f}) "
      f"errors base={a.get('n_err')} scaled={b.get('n_err')}")
