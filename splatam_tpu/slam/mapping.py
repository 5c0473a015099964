"""Map optimization: per-iteration Gaussian Adam step + pruning.

Parity with the mapping block of `rgbd_slam` (`scripts/splatam.py:844-911`)
and `prune_gaussians` (`utils/slam_external.py:167-188`). One jitted step per
(keyframe, iteration); Adam state threads through the host loop so the
60-iteration phase shares moments, exactly like the reference's single
optimizer per mapping phase. Pruning clears active bits instead of slicing
tensors — equivalent under capacity padding (inactive slots render with
radius 0 and receive zero gradients).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from splatam_tpu.core.losses import slam_loss
from splatam_tpu.core.optim import AdamState, adam_step, init_adam, reset_param_state
from splatam_tpu.core.params import GAUSSIAN_KEYS
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import Camera


class MapStepResult(NamedTuple):
    params: Dict[str, jax.Array]
    opt_state: AdamState
    losses: Dict[str, jax.Array]
    seen: jax.Array  # (C,) bool
    radius: jax.Array  # (C,) int32
    means2d_grad_norm: jax.Array  # (C,) accumulated ||dL/dmeans2D||
    overflow: jax.Array


def init_mapping_optimizer(params: Dict[str, jax.Array]) -> AdamState:
    gauss = {k: params[k] for k in GAUSSIAN_KEYS}
    return init_adam(gauss)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "sil_thres", "use_sil_for_loss", "ignore_outlier_depth_loss",
        "loss_w_im", "loss_w_depth", "lrs", "track_means2d_grad",
    ),
)
def map_step(
    params: Dict[str, jax.Array],
    active: jax.Array,
    opt_state: AdamState,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    frame_im: jax.Array,
    frame_depth: jax.Array,
    cam: Camera,
    cfg: RasterConfig,
    lrs: Tuple[Tuple[str, float], ...],
    sil_thres: float = 0.5,
    use_sil_for_loss: bool = False,
    ignore_outlier_depth_loss: bool = False,
    loss_w_im: float = 0.5,
    loss_w_depth: float = 1.0,
    track_means2d_grad: bool = False,
    binned=None,
) -> MapStepResult:
    """One mapping Adam iteration on the Gaussian parameters (pose frozen).

    ``binned`` optionally reuses a precomputed instance stream (see
    core.losses.compute_binned) — the driver caches one per keyframe and
    re-bins every rebin_every iterations / after map mutations."""
    gauss = {k: params[k] for k in GAUSSIAN_KEYS}
    dummy = (
        jnp.zeros((gauss["means3D"].shape[0], 2), jnp.float32)
        if track_means2d_grad
        else None
    )

    def loss_fn(g, d):
        p = dict(params)
        p.update(g)
        out = slam_loss(
            p, active, cam_rot, cam_tran, frame_im, frame_depth, cam, cfg,
            tracking=False,
            loss_w_im=loss_w_im, loss_w_depth=loss_w_depth,
            use_sil_for_loss=use_sil_for_loss, sil_thres=sil_thres,
            ignore_outlier_depth_loss=ignore_outlier_depth_loss,
            means2d_dummy=d,
            binned=binned,
        )
        return out.loss, out

    if track_means2d_grad:
        (loss, out), (grads, dummy_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(gauss, dummy)
        m2d_norm = jnp.linalg.norm(dummy_grad, axis=-1)
    else:
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(gauss, dummy)
        m2d_norm = jnp.zeros(gauss["means3D"].shape[0], jnp.float32)

    # inactive capacity-padding slots must never move (and any NaN leaking
    # from their degenerate values must not reach the moments)
    grads = {
        k: jnp.where(active.reshape(-1, *([1] * (g.ndim - 1))), g, 0.0)
        for k, g in grads.items()
    }

    new_gauss, opt_state = adam_step(
        gauss, grads, opt_state, dict(lrs), eps=1e-15
    )
    new_params = dict(params)
    new_params.update(new_gauss)
    return MapStepResult(
        params=new_params,
        opt_state=opt_state,
        losses=out.losses,
        seen=out.radius > 0,
        radius=out.radius,
        means2d_grad_norm=m2d_norm,
        overflow=out.overflow,
    )


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def prune_gaussians(
    params: Dict[str, jax.Array],
    variables: Dict[str, jax.Array],
    opt_state: AdamState,
    it: int,
    prune_dict: Dict,
    scene_radius: float,
):
    """`prune_gaussians` parity (`utils/slam_external.py:167-188`).

    Host-side schedule (``it`` is a python int), device-side masking.
    """
    if it <= prune_dict["stop_after"]:
        if (it >= prune_dict["start_after"]) and (
            it % prune_dict["prune_every"] == 0
        ):
            if it == prune_dict["stop_after"]:
                thresh = prune_dict["final_removal_opacity_threshold"]
            else:
                thresh = prune_dict["removal_opacity_threshold"]
            to_remove = (
                jax.nn.sigmoid(params["logit_opacities"][:, 0]) < thresh
            )
            if it >= prune_dict["remove_big_after"]:
                big = (
                    jnp.exp(params["log_scales"]).max(axis=1)
                    > 0.1 * scene_radius
                )
                to_remove = to_remove | big
            variables = dict(variables)
            variables["active"] = variables["active"] & ~to_remove
        if (
            it > 0
            and prune_dict.get("reset_opacities", False)
            and it % prune_dict["reset_opacities_every"] == 0
        ):
            params = dict(params)
            params["logit_opacities"] = jnp.full_like(
                params["logit_opacities"], inverse_sigmoid(0.01)
            )
            opt_state = reset_param_state(opt_state, "logit_opacities")
    return params, variables, opt_state
