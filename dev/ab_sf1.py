#!/usr/bin/env python3
"""Paired same-window tree A/B over selected bench rows (r18 protocol).

The r17 A/B chose its rows by RATIO among production rows and missed
the largest ABSOLUTE movers (VERDICT r17 Next #3). This runner takes
the row list explicitly (pick top-N by |delta ms| vs the prior round's
full artifact, quarantined or not), then alternates the two trees in
one window so machine drift cancels: pair i runs A,B for even i and
B,A for odd i. Each run is graft.Bench with SPARK_GRAFT_BENCH_ONLY, so
per-row medians come from the bench's own median-of-3 policy.

usage: ab_sf1.py <treeA> <treeB> <sfDir> <rows_csv> <pairs> <out.json> [label_a] [label_b]
"""
import json
import os
import re
import subprocess
import sys
import tempfile


def bench(tree, sfdir, rows):
    # per-row ms medians come from the FULL artifact (the stdout line
    # is family-compact — that bit r17's first attempt too).
    # Per-invocation scratch (advisor r18): a shared /tmp path let two
    # concurrent A/B invocations clobber each other's artifacts and
    # attribute one tree's medians to the other.
    fd, full = tempfile.mkstemp(prefix="ab_full_scratch_", suffix=".json")
    os.close(fd)
    os.remove(full)
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sfdir,
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_ONLY=rows,
        SPARK_GRAFT_BENCH_FULL=full,
    )
    p = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=tree, env=env, capture_output=True, text=True, timeout=3600)
    if not os.path.exists(full):
        sys.stderr.write(p.stdout[-3000:])
        sys.stderr.write(p.stderr[-2000:])
        raise RuntimeError(f"no full bench artifact from {tree}")
    try:
        with open(full) as f:
            j = json.load(f)
        # r20 (after VERDICT r19 #2 asked the same of the concurrent
        # A/B): keep each run's calibration + noise channel in the
        # artifact so a drifting window adjudicates itself in place
        noise = j.get("noise", {})
        env = {
            "calib": j.get("calib"),
            "noisy_n": sum(1 for v in noise.values() if v != "ok"),
        }
        return j["queries"], env  # name -> ms median, run noise channel
    finally:
        os.remove(full)


def main():
    tree_a, tree_b, sfdir, rows, pairs, out = sys.argv[1:7]
    label_a = sys.argv[7] if len(sys.argv) > 7 else "A"
    label_b = sys.argv[8] if len(sys.argv) > 8 else "B"
    pairs = int(pairs)
    runs = {label_a: [], label_b: []}
    envs = {label_a: [], label_b: []}
    order = []
    for i in range(pairs):
        seq = [(label_a, tree_a), (label_b, tree_b)]
        if i % 2 == 1:
            seq.reverse()
        for tag, tree in seq:
            print(f"[ab] pair {i} run {tag} ...", flush=True)
            qs, env = bench(tree, sfdir, rows)
            runs[tag].append(qs)
            envs[tag].append(env)
            order.append(tag)
    row_names = rows.split(",")
    per_row = {}
    for n in row_names:
        per_row[n] = {
            label_a: [r.get(n, -1) for r in runs[label_a]],
            label_b: [r.get(n, -1) for r in runs[label_b]],
        }
    doc = {
        "metric": "sf1_serial_ab_ms",
        "unit": "ms",
        "sf": os.path.basename(sfdir.rstrip("/")),
        "protocol": (
            f"alternating same-window pairs ({label_a} vs {label_b}), "
            "median-of-3 per row inside each bench run; rows = top movers "
            "by ABSOLUTE delta vs the prior full artifact (quarantine "
            "ignored) + the pure-Spark control"),
        "order": order,
        "rows": per_row,
        "envs": envs,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"[ab] wrote {out}")


if __name__ == "__main__":
    main()
