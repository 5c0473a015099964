"""Novel-view-synthesis evaluation CLI driver.

Usage: python -m splatam_tpu.run.eval_novel_view configs/scannetpp/splatam.py
Parity: `scripts/eval_novel_view.py:120-165` — dispatches `eval` on the train
split (with frame saving) vs `eval_nvs` on the test split based on
config['data']['use_train_split'].
"""
from __future__ import annotations

import os

from splatam_tpu.eval.nvs import eval_nvs
from splatam_tpu.eval.runner import eval_sequence
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.run.common import (
    build_dataset,
    load_experiment_config,
    seed_everything,
    standard_argparser,
)
from splatam_tpu.utils.checkpoint import load_params


def main():
    args = standard_argparser("Novel view synthesis eval").parse_args()
    config = load_experiment_config(args.config)
    if args.run_name is not None:
        config["run_name"] = args.run_name
    seed_everything(config.get("seed", 0))
    results_dir = os.path.join(config["workdir"], config["run_name"])

    params, variables, extras = load_params(
        os.path.join(results_dir, "params.npz")
    )
    use_train_split = config["data"].get("use_train_split", True)
    dataset = build_dataset(config, use_train_split=use_train_split)
    num_frames = config["data"].get("eval_num_frames", -1)
    if num_frames == -1:
        num_frames = len(dataset)
    raster_cfg = RasterConfig(**config.get("raster", {}))

    if use_train_split:
        eval_sequence(
            dataset, params, variables["active"], num_frames,
            os.path.join(results_dir, "eval_train"),
            sil_thres=config["mapping"]["sil_thres"],
            mapping_iters=config["mapping"]["num_iters"],
            add_new_gaussians=config["mapping"]["add_new_gaussians"],
            eval_every=config.get("eval_every", 1),
            raster_cfg=raster_cfg,
            save_frames=True,
        )
    else:
        eval_nvs(
            dataset, params, variables["active"], num_frames,
            os.path.join(results_dir, "eval_nvs"),
            sil_thres=config["mapping"]["sil_thres"],
            mapping_iters=config["mapping"]["num_iters"],
            add_new_gaussians=config["mapping"]["add_new_gaussians"],
            eval_every=config.get("eval_every", 1),
            raster_cfg=raster_cfg,
        )


if __name__ == "__main__":
    main()
