"""On-chip end-to-end SLAM benchmark (VERDICT r3 item 2).

Runs the full SplaTAM loop — tracking, densification, keyframe selection,
mapping with prune — on a synthetic RGB-D stream at the Replica working
settings (1200x680, tracking 40 iters, mapping 60 iters, window 24,
map_every 1, keyframe_every 5), and reports the reference's four runtime
telemetry averages (`scripts/splatam.py:959-979`):

  avg tracking iteration ms | avg tracking frame s
  avg mapping  iteration ms | avg mapping  frame s

Host wall-clock through the axon tunnel includes ~35 ms per dispatch, so a
healthy run has frame time ~ iters x per-step time + O(100 ms) host
overhead; if per-frame time is seconds-scale beyond that, hunt a python-int
recompile first (CLAUDE.md).

Usage: python tools/slam_bench.py [--frames 20] [--width 1200] [--height 680]
       [--track_iters 40] [--map_iters 60] [--layout auto|split|aligned] [--json out]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def make_config(args) -> dict:
    return dict(
        seed=0,
        map_every=1,
        keyframe_every=5,
        mapping_window_size=32 if args.splatam_s else 24,
        report_global_progress_every=10_000,
        eval_every=0,
        scene_radius_depth_ratio=3,
        mean_sq_dist_method="projective",
        gaussian_distribution="isotropic",
        report_iter_progress=False,
        load_checkpoint=False,
        save_checkpoints=False,
        use_wandb=False,
        data=dict(num_frames=args.frames),
        raster=dict(
            max_instances=args.max_instances,
            max_per_tile=1024,
            chunk=128,
            backend=args.backend,
            # 'auto': omit the key -> the pipeline resolves the layout from
            # frame 0's measured instance density (slam/pipeline.py)
            **({} if args.layout == "auto" else dict(layout=args.layout)),
        ),
        tracking=dict(
            use_gt_poses=False,
            forward_prop=True,
            fixed_binning=args.splatam_s,  # splatam_s.py: bin once/frame
            num_iters=args.track_iters,
            use_sil_for_loss=True,
            sil_thres=0.99,
            use_l1=True,
            ignore_outlier_depth_loss=False,
            loss_weights=dict(im=0.5, depth=1.0),
            lrs=dict(
                means3D=0.0, rgb_colors=0.0, unnorm_rotations=0.0,
                logit_opacities=0.0, log_scales=0.0,
                cam_unnorm_rots=0.0004, cam_trans=0.002,
            ),
        ),
        mapping=dict(
            num_iters=args.map_iters,
            add_new_gaussians=True,
            sil_thres=0.5,
            use_l1=True,
            use_sil_for_loss=False,
            ignore_outlier_depth_loss=False,
            loss_weights=dict(im=0.5, depth=1.0),
            lrs=dict(
                means3D=0.0001, rgb_colors=0.0025, unnorm_rotations=0.001,
                logit_opacities=0.05, log_scales=0.001,
                cam_unnorm_rots=0.0, cam_trans=0.0,
            ),
            prune_gaussians=True,
            pruning_dict=dict(
                start_after=0, remove_big_after=0, stop_after=20,
                prune_every=20, removal_opacity_threshold=0.005,
                final_removal_opacity_threshold=0.005,
                reset_opacities=False, reset_opacities_every=500,
            ),
            use_gaussian_splatting_densification=False,
            densify_dict=dict(),
        ),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--height", type=int, default=680)
    ap.add_argument("--track_iters", type=int, default=40)
    ap.add_argument("--map_iters", type=int, default=60)
    ap.add_argument("--layout", default="auto",
                    choices=["auto", "split", "aligned"])
    ap.add_argument("--backend", default="pallas", choices=["pallas", "jnp"],
                    help="jnp = fast CPU smoke of the driver plumbing")
    ap.add_argument("--cpu", action="store_true",
                    help="force XLA:CPU (the container's sitecustomize pins "
                         "the TPU platform; env vars alone don't override it)")
    ap.add_argument("--splatam_s", action="store_true",
                    help="SplaTAM-S realtime settings (configs/replica/"
                         "splatam_s.py:14-16,54-57): track 10 / map 15 / "
                         "window 32, densification at half resolution")
    ap.add_argument("--max_instances", type=int, default=2**20,
                    help="pre-cull instance capacity (shrink for CPU smokes)")
    ap.add_argument("--json", default=None, help="write results here")
    ap.add_argument("--profile_last", action="store_true",
                    help="jax.profiler trace of the final frame; prints the "
                         "device-op table (host-overhead hunt)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from splatam_tpu.core.params import num_active
    from splatam_tpu.data.synthetic import SyntheticDataset
    from splatam_tpu.slam.pipeline import rgbd_slam

    if args.splatam_s:
        args.track_iters, args.map_iters = 10, 15

    print(f"backend={__import__('jax').default_backend()} "
          f"{args.width}x{args.height} frames={args.frames} "
          f"track={args.track_iters} map={args.map_iters} "
          f"layout={args.layout}", flush=True)
    ds = SyntheticDataset(
        num_frames=args.frames, width=args.width, height=args.height, seed=0
    )
    densify_ds = None
    if args.splatam_s:
        # half-res view of the SAME world (the scene/gaussians depend only
        # on the seed, not the render resolution)
        densify_ds = SyntheticDataset(
            num_frames=args.frames, width=args.width // 2,
            height=args.height // 2, seed=0,
        )
    cb = None
    logdir = None
    if args.profile_last:
        import tempfile

        import jax

        logdir = tempfile.mkdtemp(prefix="slamtrace_")

        def cb(t, state):
            if t == args.frames - 1:
                jax.profiler.start_trace(logdir)

    t0 = time.time()
    state = rgbd_slam(make_config(args), dataset=ds, progress=True,
                      frame_callback=cb, densify_dataset=densify_ds)
    total = time.time() - t0
    if args.profile_last:
        import jax

        jax.profiler.stop_trace()
        from tools.trace_util import aggregate_trace

        dev_ms = aggregate_trace(logdir, top=30, iters=1)
        lf = (state.timing["tracking_frame"][-1]
              + state.timing["mapping_frame"][-1])
        print(f"last-frame wall {lf * 1e3:.0f} ms vs device-op {dev_ms:.0f} "
              f"ms -> host/dispatch overhead {lf * 1e3 - dev_ms:.0f} ms")

    def avg(key, scale):
        v = state.timing[key]
        return float(np.mean(v) * scale) if v else float("nan")

    def med(key, scale):
        v = state.timing[key]
        return float(np.median(v) * scale) if v else float("nan")

    res = {
        "avg_tracking_iter_ms": round(avg("tracking_iter", 1e3), 2),
        "avg_tracking_frame_s": round(avg("tracking_frame", 1.0), 3),
        "avg_mapping_iter_ms": round(avg("mapping_iter", 1e3), 2),
        "avg_mapping_frame_s": round(avg("mapping_frame", 1.0), 3),
        # medians exclude the compile spikes (tier changes / first frame)
        "med_tracking_iter_ms": round(med("tracking_iter", 1e3), 2),
        "med_mapping_iter_ms": round(med("mapping_iter", 1e3), 2),
        "avg_frame_s": round(
            (avg("tracking_frame", 1.0) + avg("mapping_frame", 1.0)), 3
        ),
        "total_wall_s": round(total, 1),
        "frames": args.frames,
        "gaussians": int(num_active(state.variables)),
        "resolution": f"{args.width}x{args.height}",
        "track_iters": args.track_iters,
        "map_iters": args.map_iters,
        "layout": args.layout,
        "splatam_s": bool(args.splatam_s),
    }
    print(json.dumps(res))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
