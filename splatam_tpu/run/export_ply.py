"""PLY export CLI driver.

Usage: python -m splatam_tpu.run.export_ply configs/replica/splatam.py
Parity: `scripts/export_ply.py __main__`.
"""
from __future__ import annotations

import os

import numpy as np

from splatam_tpu.run.common import load_experiment_config, standard_argparser
from splatam_tpu.utils.ply import save_ply_from_params


def main():
    args = standard_argparser("Export splat PLY").parse_args()
    config = load_experiment_config(args.config)
    if args.run_name is not None:
        config["run_name"] = args.run_name
    run_dir = os.path.join(config["workdir"], config["run_name"])
    params = dict(np.load(os.path.join(run_dir, "params.npz"), allow_pickle=True))
    save_ply_from_params(os.path.join(run_dir, "splat.ply"), params)


if __name__ == "__main__":
    main()
