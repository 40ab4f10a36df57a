#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines (e.g. sf0.1 vs sf1) and emit the
SCALING.md slope table. Slope = t_big / t_small for a `factor`× data-size
step; ~linear means slope <= factor (plus a fixed-overhead allowance for
sub-second queries, where Spark's per-job scheduling floor dominates).

Usage: python3 tools/scaling_report.py <small.json> <big.json> <factor>
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    m = re.search(r"\{.*\}", text)
    return json.loads(m.group(0))


def main():
    small, big, factor = load(sys.argv[1]), load(sys.argv[2]), float(sys.argv[3])
    qs, qb = small["queries"], big["queries"]
    # fixed per-query overhead estimate: the fastest small-SF query is
    # essentially pure scheduling floor
    floor = min(qs.values())
    rows = []
    for name in sorted(qs):
        if name not in qb:
            continue
        ts, tb = qs[name], qb[name]
        slope = tb / ts
        # overhead-adjusted slope: remove the scheduling floor both sides
        adj = (tb - floor) / max(ts - floor, 1e-3)
        rows.append((name, ts, tb, slope, adj))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | t(sf0.1) s | t(sf1) s | slope | floor-adjusted |")
    print("| --- | --- | --- | --- | --- |")
    for name, ts, tb, slope, adj in rows:
        flag = " ⚠" if adj > factor * 1.3 and tb > 1.0 else ""
        print(f"| {name} | {ts:.2f} | {tb:.2f} | {slope:.1f}× | {adj:.1f}×{flag} |")
    tot_s = sum(qs[n] for n in qs if n in qb)
    tot_b = sum(qb[n] for n in qs if n in qb)
    print(f"\ntotals: {tot_s:.1f} s -> {tot_b:.1f} s "
          f"({tot_b / tot_s:.1f}x on {factor:.0f}x data, {len(rows)} queries)")


if __name__ == "__main__":
    main()
