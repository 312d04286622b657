#!/usr/bin/env python3
"""Per-family scale slope between two full-name bench artifacts
(BENCH_r{N}_local.json shape: {"queries": {"q_fam_x": <ms or sec>}}).
Usage: slope.py <sf0.1.json> <sf1.json> [data_ratio]"""
import sys, json
from collections import defaultdict

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0


def fam(k):
    if not k.startswith("q_"):
        return "@"
    rest = k[2:]
    i = rest.find("_")
    return rest[:i] if i > 0 else "@"


def fams(d):
    out = defaultdict(float)
    for k, v in d["queries"].items():
        if isinstance(v, dict):  # famsum scheme
            continue
        if v is not None and v >= 0:
            out[fam(k)] += float(v)
    return out


# Exact-oracle baseline rows: quadratic WORKLOAD by design (brute-force
# pairs / full probe so DuckDB can check them). Quarantined from the
# headline so the production total tracks the shapes a 100 TB user runs
# (VERDICT r12 Next #4).
EXACT_BASELINE = {
    "q_dedup_embedding",  # O(n^2) cosine pairs (oracle for the LSH row)
    "q_ann_topk",         # brute-force top-k (oracle for q_ann_pruned)
    "q_ann_ivf",          # degenerate full-probe IVF (oracle shape)
    "q_ann_ivfpq",        # degenerate full-probe IVF-PQ (oracle shape)
    # exact similarity join: candidate volume is sum(df^2) over prefix
    # grams — corpus-quadratic on the copy-heavy sf1 blow-up (every base
    # doc becomes a 10-copy near-dup cluster). The production near-dup
    # path at scale is the approximate twin q_dedup_minhash; this row
    # exists to CERTIFY exactness (its oracle has no candidate stage).
    "q_dedup_ngram",
}


def split(d):
    prod = {"queries": {k: v for k, v in d["queries"].items()
                        if k not in EXACT_BASELINE and not isinstance(v, dict)}}
    ex = {k: v for k, v in d["queries"].items()
          if k in EXACT_BASELINE and not isinstance(v, dict)}
    return prod, ex


pa, ea = split(a)
pb, eb = split(b)
fa, fb = fams(pa), fams(pb)
rows = []
for f in sorted(set(fa) | set(fb)):
    x, y = fa.get(f, 0.0), fb.get(f, 0.0)
    slope = (y / x) if x > 0 else float("nan")
    rows.append((f, x, y, slope))

print("## Production shapes (headline)")
print(f"| family | sf0.1 (ms) | sf1 (ms) | slope (x{ratio:.0f} data) | per-row |")
print("|---|---|---|---|---|")
ta = tb = 0.0
for f, x, y, s in rows:
    ta += x; tb += y
    per = s / ratio if s == s else float("nan")
    flag = " ⚠" if s == s and s > 2 * ratio else ""
    print(f"| {f} | {x:.0f} | {y:.0f} | {s:.1f}x{flag} | {per:.2f} |")
print(f"| **total** | {ta:.0f} | {tb:.0f} | {tb/ta:.1f}x | {tb/ta/ratio:.2f} |")

print()
print("## Exact-oracle baselines (quadratic workload by design, quarantined)")
print(f"| query | sf0.1 (ms) | sf1 (ms) | slope |")
print("|---|---|---|---|")
qa = qb = 0.0
for k in sorted(set(ea) | set(eb)):
    x, y = ea.get(k, 0.0), eb.get(k, 0.0)
    qa += x; qb += y
    s = (y / x) if x > 0 else float("nan")
    print(f"| {k} | {x:.0f} | {y:.0f} | {s:.1f}x |")
if qa > 0:
    print(f"| **subtotal** | {qa:.0f} | {qb:.0f} | {qb/qa:.1f}x |")
