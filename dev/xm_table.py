#!/usr/bin/env python3
"""Metric-backed per-family slope table (VERDICT r14 Next #5).

Joins two BENCH full JSONs (the shape Bench writes to
SPARK_GRAFT_BENCH_FULL — per-query medians plus the per-row "xm"
metrics channel) and prints, for every family whose time slope exceeds
the threshold, the measured metric slopes that explain it:

  or = output rows of the timed execution
  jr = max join output rows (candidate volume for the dedup families)
  sr = summed scan output rows (probe volume for vector/text)
  wb/wr = bytes/rows written by engine commits (iud/sql/load rewrite)
  db = merge-on-read delta bytes written

Usage: xm_table.py <sf0.1_full.json> <sf1_full.json> [slope_threshold]
"""
import sys, json
from collections import defaultdict

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0


def fam(k):
    if not k.startswith("q_"):
        return "@"
    rest = k[2:]
    i = rest.find("_")
    return rest[:i] if i > 0 else "@"


def fam_times(d):
    out = defaultdict(float)
    for k, v in d["queries"].items():
        if isinstance(v, (int, float)) and v >= 0:
            out[fam(k)] += float(v)
    return out


def fam_metric(d, key):
    out = defaultdict(float)
    for row, m in d.get("xm", {}).items():
        v = m.get(key, -1)
        if v is not None and v > 0:
            out[fam(row)] += float(v)
    return out


ta, tb = fam_times(a), fam_times(b)
METRICS = ["or", "jr", "sr", "wb", "wr", "db"]
ma = {k: fam_metric(a, k) for k in METRICS}
mb = {k: fam_metric(b, k) for k in METRICS}

print(f"{'family':14s} {'t0(ms)':>8s} {'t1(ms)':>8s} {'slope':>6s}  metric slopes (m1/m0 where both > 0)")
rows = []
for f in sorted(ta):
    if f not in tb or ta[f] <= 0:
        continue
    slope = tb[f] / ta[f]
    mparts = []
    for k in METRICS:
        v0, v1 = ma[k].get(f, 0), mb[k].get(f, 0)
        if v0 > 0 and v1 > 0:
            mparts.append(f"{k}:{v1 / v0:.1f}x ({v0:.3g}->{v1:.3g})")
    rows.append((slope, f, ta[f], tb[f], "  ".join(mparts) or "-"))

for slope, f, t0, t1, m in sorted(rows, reverse=True):
    flag = " *" if slope > thresh else ""
    print(f"{f:14s} {t0:8.0f} {t1:8.0f} {slope:5.1f}x{flag}  {m}")

unexplained = [f for s, f, _, _, m in rows if s > thresh and m == "-"]
print()
if unexplained:
    print(f"families >{thresh}x slope with NO metric signal: {unexplained}")
else:
    print(f"every family >{thresh}x slope carries at least one measured metric")
