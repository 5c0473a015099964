"""Aggregate Monte-Carlo ablation experiments and plot EIG-vs-PSNR.

TPU-native counterpart of `scripts/get_monte_plot.py` (197 LoC): reads each
experiment group's `eval/*.txt` metric dumps (what `eval/runner.py` writes)
plus the `running_metrics_*.csv` files (`viz/plots.save_running_metrics`),
prints mean/std statistics per group, and renders the grouped
EIG-vs-PSNR scatter. Groups are given on the command line instead of the
reference's hard-coded path dict:

    python tools/monte_plot.py --out stats/ \
        no_monte:exp/monte01,exp/monte02 monte_40:exp/monte20,exp/monte21
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METRICS = ("eig", "l1", "lpips", "psnr", "rmse", "ssim")


def get_stats(dpaths) -> str:
    """Mean/std of each eval metric concatenated over the group's runs
    (`get_monte_plot.py:79-132`). Missing metric files are skipped."""
    out = []
    for m in METRICS:
        vals = []
        for d in dpaths:
            f = os.path.join(d, "eval", f"{m}.txt")
            if os.path.exists(f):
                vals.append(np.atleast_1d(np.loadtxt(f, skiprows=1)))
        if not vals:
            continue
        v = np.concatenate(vals)
        out.append(
            f"Mean {m.upper()}: {np.mean(v):.4f}, Std {m.upper()}: {np.std(v):.4f}"
        )
    return "\n".join(out) + "\n"


def get_running_stats(dpaths):
    """Concatenated (sil, eig, psnr) from each run's running_metrics csv."""
    sils, eigs, psnrs = [], [], []
    for d in dpaths:
        files = sorted(glob.glob(os.path.join(d, "running_metrics_*")))
        if not files:
            continue
        data = np.loadtxt(files[0], delimiter=",", skiprows=1).reshape(-1, 4)
        sils.append(data[:, 0])
        eigs.append(data[:, 1])
        psnrs.append(data[:, 2])
    if not sils:
        return np.array([]), np.array([]), np.array([])
    return np.concatenate(sils), np.concatenate(eigs), np.concatenate(psnrs)


def plot_monte_slice(data, thr, save_dir, prefix):
    """Grouped EIG-vs-PSNR scatter with silhouette threshold
    (`get_monte_plot.py:34-77`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 6))
    for key, v in data.items():
        if v["psnr"].size == 0:
            continue
        mask = v["sil"] < thr
        ax.scatter(v["psnr"][mask], v["eig"][mask], alpha=0.5, label=key)
    ax.set_xlabel("PSNR")
    ax.set_ylabel("EIG")
    ax.set_title("EIG vs PSNR")
    ax.legend(title="Dataset", loc="upper right")
    fig.tight_layout()
    fname = os.path.join(save_dir, f"{prefix}_sliced.pdf")
    fig.savefig(fname, format="pdf", bbox_inches="tight", pad_inches=0.02)
    plt.close(fig)
    return fname


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "groups", nargs="+",
        help="name:dir1,dir2,... experiment groups to aggregate",
    )
    ap.add_argument("--out", default="monte_stats")
    ap.add_argument("--sil_thr", type=float, default=1000.0)
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    stamp = time.time_ns()
    stats_file = os.path.join(args.out, f"statistics_{stamp}.txt")
    data = {}
    for group in args.groups:
        name, _, paths = group.partition(":")
        dpaths = [p for p in paths.split(",") if p]
        txt = get_stats(dpaths)
        print(f"------ Statistics for {name} data ------\n{txt}")
        with open(stats_file, "a") as f:
            f.write(f"\n------ Statistics for {name} data ------\n{txt}")
        sil, eig, psnr = get_running_stats(dpaths)
        data[name] = {"sil": sil, "eig": eig, "psnr": psnr}
    fname = plot_monte_slice(
        data, args.sil_thr, args.out, f"psnr_eig_{stamp}"
    )
    print(f"wrote {stats_file} and {fname}")


if __name__ == "__main__":
    main()
