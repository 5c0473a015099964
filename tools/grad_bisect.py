"""Bisect the backward-gradient divergence: which path moved?

Run with --backend {pallas,jnp} to dump grads for the parity scene to an
npz (platform = whatever JAX_PLATFORMS says), or with --compare a.npz b.npz
... to print pairwise normalized max errors.

  JAX_PLATFORMS=cpu python tools/grad_bisect.py --backend pallas --out /tmp/g_pc.npz
  JAX_PLATFORMS=cpu python tools/grad_bisect.py --backend jnp    --out /tmp/g_jc.npz
  python tools/grad_bisect.py --backend pallas --out /tmp/g_pt.npz
  python tools/grad_bisect.py --backend jnp    --out /tmp/g_jt.npz
  python tools/grad_bisect.py --compare /tmp/g_*.npz
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def compute(backend, out):
    import jax
    import jax.numpy as jnp

    from bench import make_scene
    from splatam_tpu.core.losses import slam_loss
    from splatam_tpu.core.params import GAUSSIAN_KEYS
    from splatam_tpu.render.binning import RasterConfig

    n = 20_000
    w, h = 320, 192
    params, active, cam = make_scene(n, w, h, seed=3)
    rot = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    tran = jnp.zeros(3, jnp.float32)
    gt_im = jnp.zeros((3, h, w), jnp.float32)
    gt_depth = jnp.full((1, h, w), 2.5, jnp.float32)
    cfg = RasterConfig(
        max_instances=2**18, max_per_tile=1024, chunk=128, backend=backend
    )

    def loss_fn(gauss):
        p = dict(params)
        p.update(gauss)
        res = slam_loss(
            p, active, rot, tran, gt_im, gt_depth, cam, cfg,
            tracking=False, loss_w_im=0.5, loss_w_depth=1.0,
            use_sil_for_loss=False, sil_thres=0.5,
            ignore_outlier_depth_loss=False,
        )
        return res.loss

    gauss = {k: params[k] for k in GAUSSIAN_KEYS}
    g = jax.jit(jax.grad(loss_fn))(gauss)
    np.savez(out, **{k: np.asarray(v) for k, v in g.items()})
    print(f"{backend} on {jax.default_backend()} -> {out}")


def compare(files):
    data = {f: dict(np.load(f)) for f in files}
    names = list(data.keys())
    keys = list(data[names[0]].keys())
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            print(f"--- {a} vs {b}")
            for k in keys:
                s = np.max(np.abs(data[b][k])) + 1e-12
                e = np.max(np.abs(data[a][k] - data[b][k])) / s
                print(f"  {k:<20} scale={s:.3e} rel={e:.3e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["pallas", "jnp"])
    ap.add_argument("--out")
    ap.add_argument("--compare", nargs="*")
    args = ap.parse_args()
    if args.compare:
        compare(args.compare)
    else:
        compute(args.backend, args.out)
