"""Online SLAM on an iPhone (NeRFCapture) stream.

Parity: `scripts/iphone_demo.py` — the reference subscribes to NeRFCapture
frames over CycloneDDS and runs SplaTAM online. Here the realtime driver
(splatam_tpu/realtime) does the SLAM; this module provides the frame
sources: a live DDS source (import-gated) and a capture-directory replay
(the output of tools/nerfcapture2dataset.py), so the demo runs end-to-end on
a recorded capture without any DDS network.

Usage:
  python -m splatam_tpu.tools.iphone_demo --capture_dir out/seq [--num_iters 10]
"""
from __future__ import annotations

import argparse

from splatam_tpu.data.datasets import NeRFCaptureDataset
from splatam_tpu.realtime import GainConfig, ReplaySource, realtime_slam


def demo_config(num_iters: int = 10) -> dict:
    """iPhone-demo knobs (`scripts/iphone_demo.py` config block)."""
    return {
        "scene_radius_depth_ratio": 3.0,
        "gaussian_distribution": "isotropic",
        "seed": 0,
        "keyframe_every": 5,
        "mapping_window_size": 32,
        "data": {"max_frames": 2048},
        "raster": {"max_instances": 2**19, "max_per_tile": 1024, "chunk": 128},
        "tracking": {
            "num_iters": num_iters, "forward_prop": True, "use_gt_poses": False,
            "use_sil_for_loss": True, "sil_thres": 0.99,
            "ignore_outlier_depth_loss": False,
            "loss_weights": {"im": 0.5, "depth": 1.0},
            "lrs": {"cam_unnorm_rots": 2e-3, "cam_trans": 4e-3},
        },
        "mapping": {
            "num_iters": num_iters, "add_new_gaussians": True, "sil_thres": 0.5,
            "use_sil_for_loss": False, "ignore_outlier_depth_loss": False,
            "loss_weights": {"im": 0.5, "depth": 1.0},
            "prune_gaussians": False, "pruning_dict": {},
            "lrs": {"means3D": 1e-4, "rgb_colors": 2.5e-3,
                    "unnorm_rotations": 1e-3, "logit_opacities": 0.05,
                    "log_scales": 1e-3, "cam_unnorm_rots": 0.0,
                    "cam_trans": 0.0},
        },
    }


def run_on_capture(capture_basedir: str, sequence: str, num_iters: int = 10,
                   height: int = 360, width: int = 480):
    """Replay a NeRFCapture directory through the realtime SLAM driver."""
    ds = NeRFCaptureDataset(
        capture_basedir, sequence, desired_height=height, desired_width=width
    )
    source = ReplaySource(ds)
    return realtime_slam(demo_config(num_iters), source, GainConfig())


def main():  # pragma: no cover - CLI entry
    p = argparse.ArgumentParser()
    p.add_argument("--capture_dir", required=True,
                   help="basedir containing <sequence>/transforms.json")
    p.add_argument("--sequence", default=".")
    p.add_argument("--num_iters", type=int, default=10)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--out", default=None, help="save params.npz here")
    args = p.parse_args()
    state, _ = run_on_capture(
        args.capture_dir, args.sequence, args.num_iters, args.height, args.width
    )
    if args.out:
        from splatam_tpu.utils.checkpoint import save_params

        save_params(state.params, state.variables, args.out)
        print(f"saved map to {args.out}/params.npz")


if __name__ == "__main__":
    main()
