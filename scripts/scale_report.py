#!/usr/bin/env python3
"""Render SCALE.md from two Bench records (sf0.1 and pseudo-sf1).

Usage: python3 scripts/scale_report.py <bench_sf01.json> <bench_sf1.json>
Prints a markdown table of per-query seconds and the sf1/sf0.1 ratio,
sorted by ratio descending, with a crude classification column. The
narrative around the table is written by hand in SCALE.md.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def classify(ratio):
    if ratio < 2.0:
        return "constant/sublinear"
    if ratio < 13.0:
        return "≈linear (10× rows)"
    return "SUPER-LINEAR — justify"


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    rows = []
    for q in sorted(a):
        if q in b and a[q] > 0 and b[q] > 0:
            rows.append((q, a[q], b[q], b[q] / a[q]))
    rows.sort(key=lambda r: -r[3])
    print("| query | sf0.1 s | sf1 s | ratio | class |")
    print("|---|---|---|---|---|")
    for q, x, y, r in rows:
        print(f"| {q} | {x:.2f} | {y:.2f} | {r:.1f}× | {classify(r)} |")
    ta = sum(x for _, x, _, _ in rows)
    tb = sum(y for _, _, y, _ in rows)
    print(f"\ntotal: {ta:.0f} s -> {tb:.0f} s ({tb/ta:.1f}x) over {len(rows)} queries")


if __name__ == "__main__":
    main()
