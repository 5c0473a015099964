"""Multi-chip training steps: tile-sharded render + keyframe-batch DP.

New design vs the single-GPU reference (SURVEY.md §2.3):

  * `map_step` with `RasterConfig.shard_axis='tiles'` — the per-frame
    mapping/refinement step partitions the compositing scan over image tiles
    across chips; XLA SPMD all-reduces the per-Gaussian parameter gradients
    over ICI in the backward pass.
  * `batched_map_step` (this module) — offline / post-SLAM refinement over a
    BATCH of keyframes: batch sharded over the 'data' mesh axis (DCN-friendly
    across hosts), tiles over 'tiles' within a host. One Adam step on the
    mean loss — a true multi-host data-parallel 3DGS trainer, which the
    reference (random single keyframe per iter) cannot express.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from splatam_tpu.core.losses import slam_loss
from splatam_tpu.core.optim import AdamState, adam_step
from splatam_tpu.core.params import GAUSSIAN_KEYS
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import Camera


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "lrs", "sil_thres", "use_sil_for_loss",
        "ignore_outlier_depth_loss", "loss_w_im", "loss_w_depth",
    ),
)
def batched_map_step(
    params: Dict[str, jax.Array],
    active: jax.Array,
    opt_state: AdamState,
    cam_rots: jax.Array,  # (B, 4)
    cam_trans: jax.Array,  # (B, 3)
    frames_im: jax.Array,  # (B, 3, H, W) — shard over 'data'
    frames_depth: jax.Array,  # (B, 1, H, W)
    cam: Camera,
    cfg: RasterConfig,
    lrs: Tuple[Tuple[str, float], ...],
    sil_thres: float = 0.5,
    use_sil_for_loss: bool = False,
    ignore_outlier_depth_loss: bool = False,
    loss_w_im: float = 0.5,
    loss_w_depth: float = 1.0,
):
    """One Adam step on the mean loss over a keyframe batch."""
    gauss = {k: params[k] for k in GAUSSIAN_KEYS}

    frames_im = jax.lax.with_sharding_constraint(frames_im, P("data"))
    frames_depth = jax.lax.with_sharding_constraint(frames_depth, P("data"))

    def single_loss(g, rot, tran, im, depth):
        p = dict(params)
        p.update(g)
        out = slam_loss(
            p, active, rot, tran, im, depth, cam, cfg,
            tracking=False,
            loss_w_im=loss_w_im, loss_w_depth=loss_w_depth,
            use_sil_for_loss=use_sil_for_loss, sil_thres=sil_thres,
            ignore_outlier_depth_loss=ignore_outlier_depth_loss,
        )
        return out.loss

    def mean_loss(g):
        losses = jax.vmap(single_loss, in_axes=(None, 0, 0, 0, 0))(
            g, cam_rots, cam_trans, frames_im, frames_depth
        )
        return jnp.mean(losses)

    loss, grads = jax.value_and_grad(mean_loss)(gauss)
    grads = {
        k: jnp.where(active.reshape(-1, *([1] * (g.ndim - 1))), g, 0.0)
        for k, g in grads.items()
    }
    new_gauss, opt_state = adam_step(gauss, grads, opt_state, dict(lrs), eps=1e-15)
    new_params = dict(params)
    new_params.update(new_gauss)
    return new_params, opt_state, loss
