#!/usr/bin/env python3
"""Two-scale-point growth-exponent fit (dev-harness only).

One scale point cannot distinguish linear from quadratic-with-small-
coefficient (r12 verdict, directive 2). Given three Bench JSON artifacts
at 1x, 9x, and 27x data, fit each query's growth exponent two ways and
report the more pessimistic:

  e_9_27 = ln(t27/t9) / ln(3)          (the tail slope -- fixed overheads
                                        have amortized away by 9x, so this
                                        is the honest asymptotic signal)
  e_fit  = least-squares slope of ln(t) on ln(s) over all three points

A truly linear query shows e ~= 1 (sub-1 when constant costs remain);
a quadratic one shows e ~= 2 regardless of how small its coefficient is.

Usage: growth_fit.py <bench_1x.json> <bench_9x.json> <bench_27x.json>
                     [threshold=1.2]
Exit 1 if any query's max(e_9_27, e_fit) exceeds the threshold.
"""
import json
import math
import sys


def times(path):
    d = json.load(open(path))
    out = {}
    for q, v in d.get("queries", {}).items():
        t = v if isinstance(v, (int, float)) else (
            v.get("median") if isinstance(v, dict) else None)
        if isinstance(t, (int, float)) and t > 0:
            out[q] = float(t)
    return out, d.get("value")


t1, tot1 = times(sys.argv[1])
t9, tot9 = times(sys.argv[2])
t27, tot27 = times(sys.argv[3])
thresh = float(sys.argv[4]) if len(sys.argv) > 4 else 1.2

scales = [1.0, 9.0, 27.0]
rows = []
for q in sorted(set(t1) & set(t9) & set(t27)):
    ts = [t1[q], t9[q], t27[q]]
    e_tail = math.log(t27[q] / t9[q]) / math.log(3.0)
    xs = [math.log(s) for s in scales]
    ys = [math.log(t) for t in ts]
    mx, my = sum(xs) / 3, sum(ys) / 3
    e_fit = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
        sum((x - mx) ** 2 for x in xs)
    rows.append((q, ts[0], ts[1], ts[2], e_tail, e_fit,
                 max(e_tail, e_fit)))

rows.sort(key=lambda r: -r[6])
print(f"{'query':34s} {'t_1x':>7s} {'t_9x':>7s} {'t_27x':>7s} "
      f"{'e_9-27':>7s} {'e_fit':>6s}")
bad = []
for q, a, b, c, et, ef, em in rows:
    mark = f" <-- exponent > {thresh}" if em > thresh else ""
    print(f"{q:34s} {a:7.2f} {b:7.2f} {c:7.2f} {et:7.2f} {ef:6.2f}{mark}")
    if em > thresh:
        bad.append(q)

if all(isinstance(x, (int, float)) for x in (tot1, tot9, tot27)):
    e_tot = math.log(tot27 / tot9) / math.log(3.0)
    print(f"\ntotal: {tot1:.1f}s -> {tot9:.1f}s -> {tot27:.1f}s "
          f"(tail exponent {e_tot:.2f})")
print(f"{len(bad)}/{len(rows)} queries with fitted exponent > {thresh}"
      + (f": {', '.join(bad)}" if bad else ""))
sys.exit(1 if bad else 0)
