#!/usr/bin/env python3
"""Per-query scale-linearity table: compare two Bench JSON artifacts
(e.g. sf0.1 vs the 9x-replicated testdata_sf1) and print query -> (t_small,
t_big, ratio), flagging ratios beyond the linear budget. Dev-harness only.

Usage: linearity.py <bench_small.json> <bench_big.json> <scale_factor>
"""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
scale = float(sys.argv[3])

qs = small.get("queries", {})
qb = big.get("queries", {})


def t(of, q):
    v = of.get(q)
    return v if isinstance(v, (int, float)) else v.get("median") if isinstance(v, dict) else None


rows = []
for q in sorted(set(qs) & set(qb)):
    a, b = t(qs, q), t(qb, q)
    if a is None or b is None or a <= 0:
        continue
    rows.append((q, a, b, b / a))

rows.sort(key=lambda r: -r[3])
# linear budget: ratio <= scale * slack; constant-cost queries sit far
# below it (streaming fixed overheads, dimension-sized work)
slack = 1.35
flagged = [r for r in rows if r[3] > scale * slack]
print(f"{'query':34s} {'t_small':>8s} {'t_big':>8s} {'ratio':>7s}")
for q, a, b, r in rows:
    mark = " <-- SUPER-LINEAR" if r > scale * slack else ""
    print(f"{q:34s} {a:8.2f} {b:8.2f} {r:7.2f}{mark}")
ts, tb = small.get("value"), big.get("value")
if isinstance(ts, (int, float)) and isinstance(tb, (int, float)) and ts > 0:
    print(f"\ntotal: {ts:.1f}s -> {tb:.1f}s (x{tb/ts:.2f} at {scale}x data); "
          f"{len(flagged)}/{len(rows)} queries over the {scale}x*{slack} budget")
else:
    print(f"\ntotal: UNPARSEABLE (value={ts!r}/{tb!r}); "
          f"{len(flagged)}/{len(rows)} queries over the {scale}x*{slack} budget")
    sys.exit(2)
