#!/usr/bin/env python3
"""N-scale-point growth-exponent fit (dev-harness only).

One scale point cannot distinguish linear from quadratic-with-small-
coefficient (r12 verdict, directive 2). Given Bench JSON artifacts at
increasing data scales, fit each query's growth exponent two ways and
report the more pessimistic:

  e_tail = ln(t_last/t_prev) / ln(s_last/s_prev)
           (the tail slope -- fixed overheads have amortized away at the
            largest scales, so this is the honest asymptotic signal)
  e_fit  = least-squares slope of ln(t) on ln(s) over ALL points

A truly linear query shows e ~= 1 (sub-1 when constant costs remain);
a quadratic one shows e ~= 2 regardless of how small its coefficient is.

Usage (new form, any number of points >= 2):
  growth_fit.py --points 1:bench_1x.json 9:bench_9x.json 27:bench_27x.json \
                [81:bench_81x.json ...] [threshold]
Usage (legacy form, kept for committed-artifact replay):
  growth_fit.py <bench_1x.json> <bench_9x.json> <bench_27x.json> [threshold]

A query only contributes to the fit at the scales where it was benched
(the 81x pass typically covers only the top slow queries); e_fit uses
every point the query has, e_tail its last two. Exit 1 if any query's
max(e_tail, e_fit) exceeds the threshold.
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


args = sys.argv[1:]
if args and args[0] == "--points":
    pts, thresh = [], 1.2
    for a in args[1:]:
        if ":" in a and not a.replace(".", "").isdigit():
            s, p = a.split(":", 1)
            pts.append((float(s), p))
        else:
            thresh = float(a)
    pts.sort()
else:  # legacy 1x/9x/27x positional form
    pts = list(zip([1.0, 9.0, 27.0], args[:3]))
    thresh = float(args[3]) if len(args) > 3 else 1.2

if len(pts) < 2:
    sys.exit("need at least two scale points")

loaded = [(s, *times(p)) for s, p in pts]  # (scale, {q: t}, total)
base = loaded[0][1]

rows = []
# identity-based coverage (r14 advice): a query must cover the SPECIFIC
# base scales (the full-bench points), not just any len(base-3) subset —
# a query present at 1x/9x/81x but missing 27x must be skipped, and the
# skip count reported so truncation is visible
base_scales = [s for s, _, _ in loaded[:3]]
skipped = []
for q in sorted(base):
    series = [(s, t[q]) for s, t, _ in loaded if q in t]
    covered = {s for s, _ in series}
    if not all(s in covered for s in base_scales):
        skipped.append(q)
        continue
    (sp, tp), (sl, tl) = series[-2], series[-1]
    e_tail = math.log(tl / tp) / math.log(sl / sp)
    xs = [math.log(s) for s, _ in series]
    ys = [math.log(t) for _, t in series]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    e_fit = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
        sum((x - mx) ** 2 for x in xs)
    rows.append((q, series, e_tail, e_fit, max(e_tail, e_fit)))

rows.sort(key=lambda r: -r[4])
hdr = " ".join(f"{'t_' + (str(int(s)) if s == int(s) else str(s)) + 'x':>8s}"
               for s, _, _ in loaded)
print(f"{'query':34s} {hdr} {'e_tail':>7s} {'e_fit':>6s}")
bad = []
for q, series, et, ef, em in rows:
    by_scale = dict(series)
    cells = " ".join(
        f"{by_scale[s]:8.2f}" if s in by_scale else f"{'-':>8s}"
        for s, _, _ in loaded)
    mark = f" <-- exponent > {thresh}" if em > thresh else ""
    print(f"{q:34s} {cells} {et:7.2f} {ef:6.2f}{mark}")
    if em > thresh:
        bad.append(q)

totals = [(s, tot) for s, _, tot in loaded
          if isinstance(tot, (int, float))]
if len(totals) >= 2:
    # totals are comparable only across artifacts covering the same query
    # set; the tail pair may be a top-N subset, so report the base chain
    full = [(s, tot) for (s, t, tot) in loaded if len(t) >= len(base) * 0.9]
    if len(full) >= 2:
        (sp, tp), (sl, tl) = full[-2], full[-1]
        e_tot = math.log(tl / tp) / math.log(sl / sp)
        chain = " -> ".join(f"{tot:.1f}s" for _, tot in full)
        # name the pair: when the tail artifacts are top-N subsets, this
        # falls back to the earliest full-coverage pair, where fixed
        # overheads are LEAST amortized — don't let it read as asymptotic
        print(f"\ntotal: {chain} (exponent {e_tot:.2f} over the "
              f"{sp:g}x->{sl:g}x full-coverage pair)")
if skipped:
    print(f"note: {len(skipped)} queries skipped for missing base-scale "
          f"coverage: {', '.join(skipped[:8])}"
          + (" ..." if len(skipped) > 8 else ""))
print(f"{len(bad)}/{len(rows)} queries with fitted exponent > {thresh}"
      + (f": {', '.join(bad)}" if bad else ""))
sys.exit(1 if bad else 0)
