#!/usr/bin/env python3
"""Turn two focus-bench JSON lines (1x and 10x) into the scaling table
for SCALE_MEASURED.md.

Usage: python3 tools/scale_report.py <1x.json> <10x.json> [factor=10]

Exponent e solves t(Nx) = t(1x) * N^e on the min-of-N samples, i.e.
e = log(ratio) / log(factor). Linear work with fixed per-query overhead
shows e < 1 at this scale (the overhead amortizes); e ~ 2 is quadratic.
"""
import json
import math
import sys


def main(p1, p10, factor=10.0):
    q1 = json.load(open(p1))["queries"]
    q10 = json.load(open(p10))["queries"]
    rows = []
    for name in q1:
        if name not in q10:
            continue
        t1, t10 = q1[name]["min"], q10[name]["min"]
        ratio = t10 / t1 if t1 > 0 else float("inf")
        exp = math.log(ratio) / math.log(factor) if ratio > 0 else float("nan")
        rows.append((name, t1, t10, ratio, exp))
    rows.sort(key=lambda r: -r[4])
    print(f"| query | t(1x) s | t({int(factor)}x) s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for name, t1, t10, ratio, exp in rows:
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {ratio:.2f}x | {exp:.2f} |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
