#!/usr/bin/env python3
"""Dev-only summarizer for SCALING.json: ratio distribution, worst
last-step ratios, errors with recorded causes. Usage:
    python3 scripts/scaling_summary.py [SCALING.json] [allowance]
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
allowance = float(sys.argv[2]) if len(sys.argv) > 2 else 13.0

with open(path) as f:
    d = json.load(f)

qs = d["queries"]
ratios = {}
for name, row in qs.items():
    rs = row["ratios"]
    if rs and all(r >= 0 for r in rs):
        ratios[name] = rs[-1]

vals = sorted(ratios.values())
n = len(vals)
print(f"dirs: {d['dirs']}")
print(f"queries: {d['n_queries']}, with clean last-step ratio: {n}")
print(f"errors: {d.get('errors', [])}")
for k, v in d.get("error_detail", {}).items():
    print(f"  {k}: {v[:150]}")
if n:
    med = vals[n // 2]
    print(f"median last-step ratio: {med:.2f}")
    for cut in (4, 8, allowance):
        print(f"  above {cut}: {sum(1 for v in vals if v > cut)}")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:15]
    print("worst 15:")
    for name, r in worst:
        t = qs[name]["t"]
        print(f"  {name}: {r:.2f}x  t={t}")
