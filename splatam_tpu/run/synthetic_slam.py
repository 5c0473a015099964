"""End-to-end SLAM validation on the synthetic scene (no dataset needed).

Stands in for the Replica room0 benchmark when no RGB-D data is on disk
(BASELINE.md config 4): runs the full tracking+densification+mapping loop on
a textured synthetic sequence and reports ATE / PSNR / depth-L1 + timing as
one JSON line.

Usage: python -m splatam_tpu.run.synthetic_slam [--frames 20] [--width 320]
       [--height 240] [--track_iters 20] [--map_iters 30] [--backend auto]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

from splatam_tpu.data.synthetic import SyntheticDataset
from splatam_tpu.eval.ate import evaluate_ate, trajectory_from_params
from splatam_tpu.slam.pipeline import rgbd_slam


def build_config(args) -> dict:
    cap = 1 << int(np.ceil(np.log2(8 * args.width * args.height)))
    return {
        "scene_radius_depth_ratio": 3.0,
        "gaussian_distribution": "isotropic",
        "map_every": 1,
        "keyframe_every": 5,
        "mapping_window_size": 10,
        "seed": 0,
        "data": {"num_frames": args.frames},
        "raster": {
            "max_instances": cap,
            "max_per_tile": 1024,
            "chunk": 128,
            "backend": args.backend,
        },
        "tracking": {
            "num_iters": args.track_iters,
            "forward_prop": True,
            "use_gt_poses": False,
            "use_sil_for_loss": True,
            "sil_thres": 0.99,
            "ignore_outlier_depth_loss": False,
            "fixed_binning": args.fixed_binning,
            "loss_weights": {"im": 0.5, "depth": 1.0},
            "lrs": {"cam_unnorm_rots": 2e-3, "cam_trans": 4e-3},
        },
        "mapping": {
            "num_iters": args.map_iters,
            "add_new_gaussians": True,
            "sil_thres": 0.5,
            "use_sil_for_loss": False,
            "ignore_outlier_depth_loss": False,
            "loss_weights": {"im": 0.5, "depth": 1.0},
            "prune_gaussians": True,
            "pruning_dict": {
                "start_after": 0, "stop_after": 20, "prune_every": 20,
                "removal_opacity_threshold": 0.005,
                "final_removal_opacity_threshold": 0.005,
                "reset_opacities": False, "reset_opacities_every": 500,
                "remove_big_after": 0,
            },
            "lrs": {
                "means3D": 1e-4, "rgb_colors": 2.5e-3,
                "unnorm_rotations": 1e-3, "logit_opacities": 0.05,
                "log_scales": 1e-3, "cam_unnorm_rots": 0.0, "cam_trans": 0.0,
            },
        },
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--track_iters", type=int, default=20)
    p.add_argument("--map_iters", type=int, default=30)
    p.add_argument("--backend", default="auto")
    p.add_argument("--fixed_binning", action="store_true")
    args = p.parse_args(argv)

    ds = SyntheticDataset(
        num_frames=args.frames, width=args.width, height=args.height, seed=0
    )
    config = build_config(args)
    t0 = time.time()
    state = rgbd_slam(config, ds, progress=False)
    wall = time.time() - t0

    gt, est = trajectory_from_params(
        state.params, state.first_w2c, state.gt_w2c_all
    )
    ate = evaluate_ate(gt, est)

    # PSNR over the sequence at estimated poses
    import jax
    import jax.numpy as jnp

    from splatam_tpu.core.losses import calc_psnr, render_for_loss
    from splatam_tpu.render.binning import RasterConfig

    cfg = RasterConfig(**config["raster"])
    render = jax.jit(
        lambda pr, a, r, t: render_for_loss(
            pr, a, r, t, state.cam, cfg, gaussians_grad=False, camera_grad=False
        )[0]
    )
    gauss_only = {
        k: v for k, v in state.params.items() if not k.startswith("cam_")
    }
    psnrs, depth_l1s = [], []
    for t in range(args.frames):
        color, depth, _, _ = ds[t]
        im_gt = jnp.asarray(np.transpose(color, (2, 0, 1)) / 255.0, jnp.float32)
        d_gt = jnp.asarray(np.transpose(depth, (2, 0, 1)), jnp.float32)
        from splatam_tpu.core.params import get_pose

        rot_t, tran_t = get_pose(state.params, t)
        out = render(gauss_only, state.variables["active"], rot_t, tran_t)
        valid = d_gt > 0
        psnrs.append(float(calc_psnr(out.color[:3] * valid, im_gt * valid)))
        depth_l1s.append(
            float(
                (jnp.abs(out.color[3:4] - d_gt) * valid).sum()
                / jnp.maximum(valid.sum(), 1)
            )
        )

    result = {
        "ate_m": round(ate, 5),
        "psnr": round(float(np.mean(psnrs)), 2),
        "depth_l1_m": round(float(np.mean(depth_l1s)), 5),
        "gaussians": int(np.asarray(state.variables["active"]).sum()),
        "frames": args.frames,
        "wall_s": round(wall, 1),
        "s_per_frame": round(wall / args.frames, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
