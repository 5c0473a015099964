"""Profile the bench mapping step on the real chip; print top device ops.

Runs the same fused fwd+bwd step as bench.py under jax.profiler.start_trace
and aggregates the Chrome-trace device events by op name. Device op times are
real on the axon tunnel (CLAUDE.md); host wall-clock is not.

Usage: python tools/profile_bench.py [--iters 10] [--top 40]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--mode", type=str, default=None,
                    help="bench mode tokens, e.g. perm+roll+c256")
    ap.add_argument("--hlo", action="store_true", help="dump compiled HLO too")
    ap.add_argument("--n", type=int, default=200_000,
                    help="gaussian count (e.g. 900000 = SLAM map scale)")
    args = ap.parse_args()

    import jax

    import bench

    print("setup (probe binning + sat-trim sizing)...", flush=True)
    b = bench.setup(args.mode, iters=args.iters, n=args.n)
    run, gauss, sat0 = b["run"], b["gauss"], b["sat0"]

    if args.hlo:
        txt = run.lower(gauss, sat0).compile().as_text()
        open("/tmp/bench_hlo.txt", "w").write(txt)
        print(f"HLO -> /tmp/bench_hlo.txt ({len(txt)} bytes)")

    print("compile + warm...", flush=True)
    _ = float(run(gauss, sat0))  # compile + warm

    print("tracing...", flush=True)
    logdir = tempfile.mkdtemp(prefix="benchtrace_")
    jax.profiler.start_trace(logdir)
    _ = float(run(gauss, sat0))
    jax.profiler.stop_trace()
    print("aggregating...", flush=True)

    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    assert files, f"no trace under {logdir}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # device-track pids: process_name metadata containing "TPU" / "/device:"
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in pid_names.items() if "TPU" in nm or "Device" in nm}

    agg = collections.Counter()
    cnt = collections.Counter()
    meta = {}
    total_us = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            nm = e["name"]
            agg[nm] += e.get("dur", 0)
            cnt[nm] += 1
            total_us += e.get("dur", 0)
            if nm not in meta and e.get("args"):
                meta[nm] = e["args"]
    print(f"process names: {sorted(set(pid_names.values()))}")
    print(f"total device-op time: {total_us/1000:.2f} ms over {args.iters} iters")
    print(f"per-iter: {total_us/1000/(args.iters):.2f} ms")
    print(f"{'op':<52} {'tot ms':>8} {'n':>5} {'per-iter':>9}")
    for nm, us in agg.most_common(args.top):
        print(f"{nm[:52]:<52} {us/1000:>8.2f} {cnt[nm]:>5} {us/1000/(args.iters):>9.3f}")
        info = meta.get(nm, {})
        ln = info.get("long_name") or info.get("hlo_op") or ""
        src = info.get("source_info") or ""
        extra = " ".join(str(v) for v in (ln, src) if v)
        if extra:
            print(f"    {extra[:200]}")


if __name__ == "__main__":
    main()
