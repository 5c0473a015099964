"""Reconstruction visualization CLI.

Usage: python -m splatam_tpu.run.viz configs/replica/splatam.py [--mode color]
Parity: `viz_scripts/final_recon.py` / `viz_scripts/online_recon.py` —
renders the estimated trajectory from the saved params.npz (headless PNGs +
trajectory plot; Open3D interactive view when available and requested).
"""
from __future__ import annotations

import os

import numpy as np

from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.run.common import load_experiment_config, standard_argparser
from splatam_tpu.utils.checkpoint import load_params
from splatam_tpu.viz import plot_trajectory, render_trajectory


def main():
    p = standard_argparser("Visualize reconstruction")
    p.add_argument("--mode", default=None, choices=[None, "color", "depth", "sil"])
    p.add_argument("--every", type=int, default=5)
    p.add_argument("--interactive", action="store_true",
                   help="Open3D point-cloud view (needs open3d + display)")
    args = p.parse_args()
    config = load_experiment_config(args.config)
    if args.run_name is not None:
        config["run_name"] = args.run_name
    run_dir = os.path.join(config["workdir"], config["run_name"])

    params, variables, extras = load_params(os.path.join(run_dir, "params.npz"))
    intrinsics = extras["intrinsics"][:3, :3]
    first_w2c = extras["w2c"]
    viz_cfg = config.get("viz", {})
    mode = args.mode or viz_cfg.get("render_mode", "color")

    out_dir = os.path.join(run_dir, "recon")
    render_trajectory(
        params, variables["active"], intrinsics, first_w2c, out_dir,
        width=config["data"]["desired_image_width"],
        height=config["data"]["desired_image_height"],
        raster_cfg=RasterConfig(**config.get("raster", {})),
        every=args.every,
        render_mode="sil" if viz_cfg.get("show_sil") else mode,
    )
    plot_trajectory(
        params,
        extras.get("gt_w2c_all_frames"),
        os.path.join(run_dir, "trajectory.png"),
    )
    print(f"wrote {out_dir} and {run_dir}/trajectory.png")

    if args.interactive:
        from splatam_tpu.viz import interactive_recon

        interactive_recon(params, variables["active"], intrinsics, first_w2c, viz_cfg)


if __name__ == "__main__":
    main()
