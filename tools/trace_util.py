"""Shared jax.profiler trace aggregation (device-op time by op name)."""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def aggregate_trace(logdir: str, top: int = 40, iters: int = 1) -> float:
    """Print the per-op device-time table for the newest trace in ``logdir``;
    returns total device-op ms."""
    files = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    assert files, f"no trace under {logdir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, nm in pid_names.items() if "TPU" in nm or "Device" in nm
    }
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
    print(f"total device-op time: {total_us / 1000:.2f} ms "
          f"({total_us / 1000 / max(iters, 1):.2f} per iter)")
    print(f"{'op':<52} {'tot ms':>8} {'n':>5} {'per-iter':>9}")
    for nm, us in agg.most_common(top):
        print(
            f"{nm[:52]:<52} {us / 1000:>8.2f} {cnt[nm]:>5} "
            f"{us / 1000 / max(iters, 1):>9.3f}"
        )
        info = meta.get(nm, {})
        ln = info.get("long_name") or info.get("hlo_op") or ""
        src = info.get("source_info") or ""
        extra = " ".join(str(v) for v in (ln, src) if v)
        if extra:
            print(f"    {extra[:200]}")
    return total_us / 1000
