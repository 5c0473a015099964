"""Arbitrate pallas-vs-jnp gradient differences with finite differences.

For a few random directions d: compares the directional derivatives
g_pallas . d and g_jnp . d against central finite differences of the loss
(computed with BOTH backends). Whichever analytic gradient sits closer to
the FD values is the more accurate one at this scene density.
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


def main():
    n = 20_000
    w, h = 320, 192
    params, active, cam = make_scene(n, w, h, seed=3)
    rot = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    tran = jnp.zeros(3, jnp.float32)
    gt_im = jnp.zeros((3, h, w), jnp.float32)
    gt_depth = jnp.full((1, h, w), 2.5, jnp.float32)

    def make_loss(backend):
        cfg = RasterConfig(
            max_instances=2**18, max_per_tile=1024, chunk=128, backend=backend
        )

        @jax.jit
        def loss_fn(gauss):
            p = dict(params)
            p.update(gauss)
            return slam_loss(
                p, active, rot, tran, gt_im, gt_depth, cam, cfg,
                tracking=False, loss_w_im=0.5, loss_w_depth=1.0,
                use_sil_for_loss=False, sil_thres=0.5,
                ignore_outlier_depth_loss=False,
            ).loss

        return loss_fn

    gauss = {k: params[k] for k in GAUSSIAN_KEYS}
    rng = np.random.default_rng(7)

    losses = {b: make_loss(b) for b in ("pallas", "jnp")}
    grads = {b: jax.jit(jax.grad(losses[b]))(gauss) for b in losses}

    for trial in range(4):
        d = {
            k: jnp.asarray(
                rng.normal(size=v.shape).astype(np.float32)
                * (1.0 if k != "unnorm_rotations" else 0.0)
            )
            for k, v in gauss.items()
        }
        nrm = float(
            jnp.sqrt(sum(jnp.sum(x * x) for x in d.values()))
        )
        d = {k: v / nrm for k, v in d.items()}
        eps = 1e-3
        plus = {k: gauss[k] + eps * d[k] for k in gauss}
        minus = {k: gauss[k] - eps * d[k] for k in gauss}
        line = [f"dir{trial}:"]
        for b in ("pallas", "jnp"):
            fd = (float(losses[b](plus)) - float(losses[b](minus))) / (2 * eps)
            an = float(sum(jnp.sum(grads[b][k] * d[k]) for k in gauss))
            line.append(f"{b}: fd={fd:+.6f} analytic={an:+.6f}")
        print("  ".join(line))


if __name__ == "__main__":
    main()
