#!/usr/bin/env python3
"""Paired same-window CONCURRENT tree A/B (r18, VERDICT r17 Next #3).

Serial A/Bs cannot see scheduling effects, so the 20-client anomaly
class (sf1 p95 swinging 9.8 -> 16.4 s across windows) needs both trees'
BenchConcurrent runs interleaved in ONE window: pair i runs A,B for
even i, B,A for odd i; the artifact keeps each run's p50/p95/wall so
the verdict can compare like-for-like.

usage: ab_concurrent.py <treeA> <treeB> <sfDir> <pairs> <out.json> [label_a] [label_b]
"""
import json
import os
import re
import subprocess
import sys


def bench(tree, sfdir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir, SPARK_GRAFT_CPUS="4")
    p = subprocess.run(
        ["sbt", "-batch", "runMain graft.BenchConcurrent"],
        cwd=tree, env=env, capture_output=True, text=True, timeout=3600)
    line = None
    for l in p.stdout.splitlines():
        m = re.match(r"^(\[info\] )?(\{\"metric\".*)$", l)
        if m:
            line = m.group(2)
    if line is None:
        sys.stderr.write(p.stdout[-3000:])
        sys.stderr.write(p.stderr[-2000:])
        raise RuntimeError(f"no bench json line from {tree}")
    j = json.loads(line)
    # r20 (VERDICT r19 #2): keep the per-run noise channel IN the A/B
    # artifact — calib base/post, process CPU/GC, pre/post load and the
    # window verdict adjudicate a drifting host in place, and "worst"
    # names the tail shapes
    keys = ("p50", "p95", "max", "wall", "runs", "failed", "qps",
            "calib", "cpums", "gcms", "load1_pre", "load1_post",
            "noise", "worst")
    return {k: j.get(k) for k in keys}


def main():
    tree_a, tree_b, sfdir, pairs, out = sys.argv[1:6]
    label_a = sys.argv[6] if len(sys.argv) > 6 else "A"
    label_b = sys.argv[7] if len(sys.argv) > 7 else "B"
    pairs = int(pairs)
    runs = {label_a: [], label_b: []}
    order = []
    for i in range(pairs):
        seq = [(label_a, tree_a), (label_b, tree_b)]
        if i % 2 == 1:
            seq.reverse()
        for tag, tree in seq:
            print(f"[ab] pair {i} run {tag} ...", flush=True)
            runs[tag].append(bench(tree, sfdir))
            order.append(tag)
    doc = {
        "metric": "sf1_concurrent_ab",
        "unit": "sec",
        "sf": os.path.basename(sfdir.rstrip("/")),
        "protocol": (
            f"alternating same-window BenchConcurrent pairs ({label_a} vs "
            f"{label_b}), 20 clients x 20 query shapes each run"),
        "order": order,
        "runs": runs,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"[ab] wrote {out}")


if __name__ == "__main__":
    main()
