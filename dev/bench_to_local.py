#!/usr/bin/env python3
"""Convert Bench's compact family-keyed ms JSON line to the
BENCH_rN_local.json format (full names, seconds)."""
import sys, json, re

log = open(sys.argv[1]).read()
m = re.findall(r'^(?:\[info\] )?(\{"metric".*\})\s*$', log, re.M)
assert m, "no bench JSON line found"
d = json.loads(m[-1])
assert d.get("qscheme") == "fam" and d.get("qunit") == "ms", d.keys()
queries = {}
for fam, inner in d["queries"].items():
    for k, ms in inner.items():
        name = k if fam == "@" else f"q_{fam}_{k}"
        queries[name] = round(ms / 1000.0, 3)
out = {
    "metric": "total", "value": d["value"], "unit": "sec", "warm": True,
    "queries": dict(sorted(queries.items())), "sf": d.get("sf"),
}
for k in ("errors_n", "errors"):
    if k in d:
        out[k] = d[k]
json.dump(out, open(sys.argv[2], "w"), indent=1)
print(f"{len(queries)} queries, total {d['value']}s", "errors:", d.get("errors_n", 0))
