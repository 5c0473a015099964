"""Diagnose the gradient-reduction numerics: sort+cumsum-diff vs scatter-add.

Builds the same small scene as tpu_parity_check, runs the pallas backward
once, and reduces the per-instance gradient stream both ways. If the
scatter-add result matches the jnp-path gradients but cumsum-diff does not,
the cumsum differencing is losing precision to cancellation.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_scene
from splatam_tpu.core.losses import slam_loss
from splatam_tpu.core.params import GAUSSIAN_KEYS
from splatam_tpu.render.binning import RasterConfig
import splatam_tpu.render.pallas_raster as pr


def main():
    n = 20_000
    w, h = 320, 192
    params, active, cam = make_scene(n, w, h, seed=3)
    rot = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    tran = jnp.zeros(3, jnp.float32)
    gt_im = jnp.zeros((3, h, w), jnp.float32)
    gt_depth = jnp.full((1, h, w), 2.5, jnp.float32)

    # monkeypatch segment_reduce_by_key with a scatter-add version
    orig = pr.segment_reduce_by_key

    def scatter_reduce(vals, key_row, hist):
        r, m = vals.shape
        nn = hist.shape[0]
        key = jnp.clip(vals[key_row].astype(jnp.int32), 0, nn)  # BIG -> nn
        out = jnp.zeros((r, nn + 1), jnp.float32).at[:, key].add(vals)
        out = out[:, :nn]
        return out.at[key_row].set(0.0)

    def run(reduce_fn):
        pr.segment_reduce_by_key = reduce_fn
        pr._make_raster_fn.cache_clear()

        def loss_fn(gauss):
            cfg = RasterConfig(
                max_instances=2**18, max_per_tile=1024, chunk=128,
                backend="pallas",
            )
            p = dict(params)
            p.update(gauss)
            out = slam_loss(
                p, active, rot, tran, gt_im, gt_depth, cam, cfg,
                tracking=False, loss_w_im=0.5, loss_w_depth=1.0,
                use_sil_for_loss=False, sil_thres=0.5,
                ignore_outlier_depth_loss=False,
            )
            return out.loss

        gauss = {k: params[k] for k in GAUSSIAN_KEYS}
        g = jax.jit(jax.grad(loss_fn))(gauss)
        return {k: np.asarray(v) for k, v in g.items()}

    def jnp_grads():
        def loss_fn(gauss):
            cfg = RasterConfig(
                max_instances=2**18, max_per_tile=1024, chunk=128,
                backend="jnp",
            )
            p = dict(params)
            p.update(gauss)
            out = slam_loss(
                p, active, rot, tran, gt_im, gt_depth, cam, cfg,
                tracking=False, loss_w_im=0.5, loss_w_depth=1.0,
                use_sil_for_loss=False, sil_thres=0.5,
                ignore_outlier_depth_loss=False,
            )
            return out.loss

        gauss = {k: params[k] for k in GAUSSIAN_KEYS}
        g = jax.jit(jax.grad(loss_fn))(gauss)
        return {k: np.asarray(v) for k, v in g.items()}

    try:
        g_cumsum = run(orig)
        g_scatter = run(scatter_reduce)
    finally:
        pr.segment_reduce_by_key = orig
        pr._make_raster_fn.cache_clear()
    g_ref = jnp_grads()

    for k in GAUSSIAN_KEYS:
        s = np.max(np.abs(g_ref[k])) + 1e-12
        e_c = np.max(np.abs(g_cumsum[k] - g_ref[k])) / s
        e_s = np.max(np.abs(g_scatter[k] - g_ref[k])) / s
        e_cs = np.max(np.abs(g_scatter[k] - g_cumsum[k])) / s
        print(f"{k:<20} ref_scale={s:.3e} cumsum_vs_ref={e_c:.3e} "
              f"scatter_vs_ref={e_s:.3e} cumsum_vs_scatter={e_cs:.3e}")


if __name__ == "__main__":
    main()
