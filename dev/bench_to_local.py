#!/usr/bin/env python3
"""Produce BENCH_rN_local.json (full names, seconds) from either the
full per-query JSON file Bench writes (SPARK_GRAFT_BENCH_FULL, default
/tmp/graft_bench_full.json) or an sbt log containing the family-compact
stdout line."""
import sys, json, re

src = open(sys.argv[1]).read()
queries = {}
d = None
try:
    d = json.loads(src)
except ValueError:
    m = re.findall(r'^(?:\[info\] )?(\{"metric".*\})\s*$', src, re.M)
    assert m, "no bench JSON line found"
    d = json.loads(m[-1])
assert d.get("qunit") == "ms", d.keys()
if d.get("qscheme") == "fam":
    for fam, inner in d["queries"].items():
        for k, ms in inner.items():
            name = k if fam == "@" else f"q_{fam}_{k}"
            queries[name] = round(ms / 1000.0, 3)
else:  # full flat format from the file
    queries = {k: round(ms / 1000.0, 3) for k, ms in d["queries"].items()}
out = {
    "metric": "total", "value": d["value"], "unit": "sec", "warm": True,
    "queries": dict(sorted(queries.items())), "sf": d.get("sf"),
}
for k in ("errors_n", "errors"):
    if k in d:
        out[k] = d[k]
json.dump(out, open(sys.argv[2], "w"), indent=1)
print(f"{len(queries)} queries, total {d['value']}s", "errors:", d.get("errors_n", 0))
