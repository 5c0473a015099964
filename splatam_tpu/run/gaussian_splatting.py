"""Offline 3DGS training CLI driver (GT poses).

Usage: python -m splatam_tpu.run.gaussian_splatting configs/replica/gaussian_splatting.py
Parity: `scripts/gaussian_splatting.py __main__`.
"""
from __future__ import annotations

import os

from splatam_tpu.eval.runner import eval_sequence
from splatam_tpu.gs import offline_splatting
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.run.common import (
    build_dataset,
    load_experiment_config,
    prepare_results_dir,
    seed_everything,
    standard_argparser,
)
from splatam_tpu.utils.checkpoint import params_to_numpy, save_params
from splatam_tpu.utils.ply import save_ply_from_params


def main():
    from splatam_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()  # env-gated multi-host bootstrap
    args = standard_argparser("Offline 3DGS training").parse_args()
    config = load_experiment_config(args.config)
    if args.run_name is not None:
        config["run_name"] = args.run_name
    results_dir = prepare_results_dir(config, args.config)
    seed_everything(config.get("seed", 0))

    dataset = build_dataset(config)
    state = offline_splatting(config, dataset)

    num_frames = config["data"].get("num_frames", -1)
    if num_frames == -1:
        num_frames = len(dataset)
    eval_sequence(
        dataset, state.params, state.variables["active"], num_frames,
        os.path.join(results_dir, "eval"),
        sil_thres=config["train"]["sil_thres"],
        mapping_iters=config["train"]["num_iters_mapping"],
        add_new_gaussians=True,
        eval_every=config.get("eval_every", 1),
        raster_cfg=RasterConfig(**config.get("raster", {})),
    )
    save_params(
        state.params, state.variables, results_dir,
        intrinsics=state.intrinsics, first_w2c=state.first_w2c,
        gt_w2c_all_frames=state.gt_w2c_all,
    )
    save_ply_from_params(
        os.path.join(results_dir, "splat.ply"),
        params_to_numpy(state.params, state.variables),
    )


if __name__ == "__main__":
    main()
