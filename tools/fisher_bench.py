"""On-chip Fisher/EIG latency benchmark (VERDICT r3 item 5, r4 item 3).

The reference serves active-view-selection gains inside a realtime planner
loop (`scripts/ros_handler.py:807-902`): per candidate pose it renders
silhouette + RGB and runs the power=2 fused backward for the diagonal
Fisher; per mapped frame it rebuilds H_train_inv from a <=40-pose
Monte-Carlo subsample. This tool measures, on the real chip at SLAM scale:

  * render_fisher ms per candidate pose at SAFE vs SIZED capacities
    (fisher.sized_fisher_config probe),
  * handler.compute_gains ms per candidate — the fused one-program path
    (shared binning, scalar fetch) with k_eig=1,
  * the 40-pose H_train_inv rebuild seconds (device-side padded scan).

Handler calls are a host loop by design (like the reference's), so numbers
include the ~35 ms/dispatch tunnel overhead — which the production planner
loop pays too.

Usage: python tools/fisher_bench.py [--n 200000] [--w 1200] [--h 680] [--poses 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--w", type=int, default=1200)
    ap.add_argument("--h", type=int, default=680)
    ap.add_argument("--poses", type=int, default=8)
    ap.add_argument("--monte", type=int, default=40)
    ap.add_argument("--cpu", action="store_true",
                    help="force XLA:CPU (smoke; sitecustomize pins TPU)")
    ap.add_argument("--skip_safe", action="store_true",
                    help="skip the safe-capacity baseline measurement")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_scene
    from splatam_tpu.fisher import render_fisher, sized_fisher_config
    from splatam_tpu.realtime.handler import ActiveViewHandler, GainConfig
    from splatam_tpu.render.binning import RasterConfig

    params, active, cam = make_scene(args.n, args.w, args.h)
    cfg = RasterConfig(max_instances=2**20, max_per_tile=1024, chunk=128)
    rng = np.random.default_rng(0)

    def pose(i):
        w2c = np.eye(4)
        w2c[:3, 3] = 0.02 * rng.normal(size=3)
        return w2c

    rot0 = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    tran0 = jnp.zeros(3, jnp.float32)

    def time_fisher(use_cfg, label):
        f = jax.jit(
            lambda r, t: render_fisher(params, active, r, t, cam, use_cfg)
        )
        h = f(rot0, tran0)  # compile
        _ = np.asarray(h)
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            h = f(rot0, tran0 + 1e-6 * i)
            _ = float(h[0, 0])  # host sync per pose, as the planner loop pays
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"render_fisher[{label}]: {ms:.1f} ms/pose", flush=True)
        return ms

    fisher_safe_ms = (
        None if args.skip_safe else time_fisher(cfg, "safe caps")
    )
    sized = sized_fisher_config(params, active, rot0, tran0, cam, cfg)
    fisher_sized_ms = time_fisher(sized, "sized caps")

    # --- handler.compute_gains per candidate (fused sil + EIG program) ---
    handler = ActiveViewHandler(cam, cfg, GainConfig(k_eig=1.0))
    for i in range(3):
        handler.add_visited_pose(pose(i))
    t0 = time.perf_counter()
    handler.recompute_h_train_inv(params, active)
    h_rebuild_3_s = time.perf_counter() - t0

    # [tx ty tz qx qy qz qw] with identity rotation (w last)
    cands = [
        np.concatenate([pose(i)[:3, 3], [0, 0, 0, 1]]) for i in range(args.poses)
    ]
    gains = handler.compute_gains(params, active, cands)  # compile
    t0 = time.perf_counter()
    gains = handler.compute_gains(params, active, cands)
    gains_ms = (time.perf_counter() - t0) / len(cands) * 1e3

    # --- the <=40-pose Monte-Carlo H_train rebuild -----------------------
    for i in range(3, args.monte):
        handler.add_visited_pose(pose(i))
    handler.recompute_h_train_inv(params, active)  # compile at the padded cap
    t0 = time.perf_counter()
    handler.recompute_h_train_inv(params, active)
    h_rebuild_s = time.perf_counter() - t0

    print(json.dumps({
        "render_fisher_ms_per_pose_safe": (
            None if fisher_safe_ms is None else round(fisher_safe_ms, 1)
        ),
        "render_fisher_ms_per_pose_sized": round(fisher_sized_ms, 1),
        "compute_gains_ms_per_candidate": round(gains_ms, 1),
        "h_train_inv_rebuild_s_3poses": round(h_rebuild_3_s, 2),
        f"h_train_inv_rebuild_s_{args.monte}poses": round(h_rebuild_s, 2),
        "n_gaussians": args.n,
        "resolution": f"{args.w}x{args.h}",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
