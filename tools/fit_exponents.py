#!/usr/bin/env python3
"""Fit per-query scaling exponents from TimeQ/bench timings.

Input: a JSON file {query: {scale_factor: seconds, ...}, ...} where
scale_factor is the replication factor relative to sf0.1 (1, 10, 100,
300, 1000). Output: per-query least-squares exponent of t = c * N^e in
log-log space, plus the per-segment local exponents so a regime change
(e.g. a gate saturating) is visible rather than averaged away.

Usage: python3 tools/fit_exponents.py TIMINGS.json
"""
import json
import math
import sys

data = json.load(open(sys.argv[1]))
print(f"{'query':34s} {'points':>22s} {'fit_e':>6s}  segment exponents")
for q in sorted(data):
    pts = sorted((float(k), float(v)) for k, v in data[q].items() if v is not None)
    if len(pts) < 2:
        print(f"{q:34s} insufficient points")
        continue
    xs = [math.log(s) for s, _ in pts]
    ys = [math.log(t) for _, t in pts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    e = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
        sum((x - mx) ** 2 for x in xs)
    segs = []
    for (s0, t0), (s1, t1) in zip(pts, pts[1:]):
        segs.append(f"{s0:g}->{s1:g}: {math.log(t1 / t0) / math.log(s1 / s0):+.2f}")
    label = " ".join(f"{s:g}x={t:.1f}s" for s, t in pts)
    print(f"{q:34s} {label:>22s} {e:6.2f}  {'; '.join(segs)}")
