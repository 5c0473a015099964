"""SplaTAM SLAM CLI driver.

Usage: python -m splatam_tpu.run.slam configs/replica/splatam.py

Parity with `scripts/splatam.py __main__` (`scripts/splatam.py:1039-1061`):
load config, seed, run SLAM, evaluate, save params.npz + splat.ply.
"""
from __future__ import annotations

import os

import numpy as np

from splatam_tpu.eval.runner import eval_sequence
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.run.common import (
    build_datasets_with_resolutions,
    load_experiment_config,
    prepare_results_dir,
    seed_everything,
    standard_argparser,
)
from splatam_tpu.slam.pipeline import rgbd_slam
from splatam_tpu.utils.checkpoint import params_to_numpy, save_params
from splatam_tpu.utils.ply import save_ply_from_params


def main():
    from splatam_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()  # env-gated multi-host bootstrap
    args = standard_argparser("Run SplaTAM SLAM").parse_args()
    config = load_experiment_config(args.config)
    if args.run_name is not None:
        config["run_name"] = args.run_name
    results_dir = prepare_results_dir(config, args.config)
    seed_everything(config.get("seed", 0))

    dataset, tracking_dataset, densify_dataset = (
        build_datasets_with_resolutions(config)
    )
    state = rgbd_slam(
        config, dataset,
        tracking_dataset=tracking_dataset,
        densify_dataset=densify_dataset,
    )

    # the reference's four headline timing averages
    # (`scripts/splatam.py:959-979`): tracking/mapping x iter (ms) / frame (s)
    for phase, unit in (
        ("tracking_iter", "ms"), ("tracking_frame", "s"),
        ("mapping_iter", "ms"), ("mapping_frame", "s"),
    ):
        vals = state.timing[phase]
        if vals:
            mean = np.mean(vals)
            val = mean * 1000 if unit == "ms" else mean
            print(f"Average {phase.replace('_', ' ')} time: {val:.2f} {unit}")

    num_frames = config["data"].get("num_frames", -1)
    if num_frames == -1:
        num_frames = len(dataset)
    eval_dir = os.path.join(results_dir, "eval")
    try:
        eval_sequence(
            dataset, state.params, state.variables["active"], num_frames,
            eval_dir,
            sil_thres=config["mapping"]["sil_thres"],
            mapping_iters=config["mapping"]["num_iters"],
            add_new_gaussians=config["mapping"]["add_new_gaussians"],
            eval_every=config.get("eval_every", 1),
            raster_cfg=RasterConfig(**config.get("raster", {})),
        )
    except Exception as e:  # emergency checkpoint (`scripts/splatam.py:780-794`)
        print(f"[error] evaluation failed ({e}); saving emergency checkpoint")
        save_params(state.params, state.variables, results_dir, name="params_emergency")

    save_params(
        state.params, state.variables, results_dir,
        intrinsics=state.intrinsics, first_w2c=state.first_w2c,
        gt_w2c_all_frames=state.gt_w2c_all,
        keyframe_time_indices=state.keyframe_time_indices,
    )
    save_ply_from_params(
        os.path.join(results_dir, "splat.ply"),
        params_to_numpy(state.params, state.variables),
    )


if __name__ == "__main__":
    main()
