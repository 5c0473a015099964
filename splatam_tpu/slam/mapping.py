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
    # do_ba=True only: bundle-adjusted keyframe pose + its Adam moments
    cam_rot: jax.Array | None = None
    cam_tran: jax.Array | None = None
    pose_opt: AdamState | None = None
    nonfinite: jax.Array | bool = False  # loss was NaN/inf; the update
    # was skipped (params/opt/pose returned unchanged)


def init_mapping_optimizer(params: Dict[str, jax.Array]) -> AdamState:
    gauss = {k: params[k] for k in GAUSSIAN_KEYS}
    return init_adam(gauss)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "sil_thres", "use_sil_for_loss", "ignore_outlier_depth_loss",
        "loss_w_im", "loss_w_depth", "lrs", "track_means2d_grad", "do_ba",
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
    do_ba: bool = False,
    pose_opt: AdamState | None = None,
    binned=None,
) -> MapStepResult:
    """One mapping Adam iteration on the Gaussian parameters.

    The keyframe pose is frozen unless ``do_ba=True`` (bundle adjustment,
    `scripts/splatam.py:232-238`): then the pose receives gradients too and
    takes its own Adam step with the ``cam_unnorm_rots`` / ``cam_trans``
    learning rates, threading its moments through ``pose_opt``.

    ``binned`` optionally reuses a precomputed instance stream (see
    core.losses.compute_binned) — the driver caches one per keyframe and
    re-bins every rebin_every iterations / after map mutations."""
    gauss = {k: params[k] for k in GAUSSIAN_KEYS}
    dummy = (
        jnp.zeros((gauss["means3D"].shape[0], 2), jnp.float32)
        if track_means2d_grad
        else None
    )

    def loss_fn(g, rot, tran, d):
        p = dict(params)
        p.update(g)
        out = slam_loss(
            p, active, rot, tran, frame_im, frame_depth, cam, cfg,
            tracking=False, do_ba=do_ba,
            loss_w_im=loss_w_im, loss_w_depth=loss_w_depth,
            use_sil_for_loss=use_sil_for_loss, sil_thres=sil_thres,
            ignore_outlier_depth_loss=ignore_outlier_depth_loss,
            means2d_dummy=d,
            binned=binned,
        )
        return out.loss, out

    argnums = (0,)
    if do_ba:
        argnums += (1, 2)
    if track_means2d_grad:
        argnums += (3,)
    (loss, out), grad_tuple = jax.value_and_grad(
        loss_fn, argnums=argnums, has_aux=True
    )(gauss, cam_rot, cam_tran, dummy)
    grads = grad_tuple[0]
    pose_grads = grad_tuple[1:3] if do_ba else None
    if track_means2d_grad:
        m2d_norm = jnp.linalg.norm(grad_tuple[-1], axis=-1)
    else:
        m2d_norm = jnp.zeros(gauss["means3D"].shape[0], jnp.float32)

    # NaN/inf-loss guard: skip the whole update for a divergent iteration so
    # bad frame data can't poison the map or the Adam moments
    finite = jnp.isfinite(loss)

    def keep_good(new, old):
        return jax.tree.map(lambda a, b: jnp.where(finite, a, b), new, old)

    new_rot, new_tran, new_pose_opt = cam_rot, cam_tran, None
    if do_ba:
        lr_map = dict(lrs)
        pose_params = {"cam_unnorm_rots": cam_rot, "cam_trans": cam_tran}
        if pose_opt is None:
            pose_opt = init_adam(pose_params)
        new_pose, new_pose_opt = adam_step(
            pose_params,
            {"cam_unnorm_rots": pose_grads[0], "cam_trans": pose_grads[1]},
            pose_opt,
            {
                "cam_unnorm_rots": lr_map.get("cam_unnorm_rots", 0.0),
                "cam_trans": lr_map.get("cam_trans", 0.0),
            },
            eps=1e-15,
        )
        new_pose, new_pose_opt = keep_good(
            (new_pose, new_pose_opt), (pose_params, pose_opt)
        )
        new_rot, new_tran = new_pose["cam_unnorm_rots"], new_pose["cam_trans"]

    # inactive capacity-padding slots must never move (and any NaN leaking
    # from their degenerate values must not reach the moments)
    grads = {
        k: jnp.where(active.reshape(-1, *([1] * (g.ndim - 1))), g, 0.0)
        for k, g in grads.items()
    }

    gauss_lrs = {k: v for k, v in dict(lrs).items() if k in gauss}
    new_gauss, opt_state = keep_good(
        adam_step(gauss, grads, opt_state, gauss_lrs, eps=1e-15),
        (gauss, opt_state),
    )
    new_params = dict(params)
    new_params.update(new_gauss)
    return MapStepResult(
        params=new_params,
        opt_state=opt_state,
        losses=out.losses,
        seen=out.radius > 0,
        radius=out.radius,
        means2d_grad_norm=jnp.where(finite, m2d_norm, 0.0),
        overflow=out.overflow,
        cam_rot=new_rot if do_ba else None,
        cam_tran=new_tran if do_ba else None,
        pose_opt=new_pose_opt,
        nonfinite=~finite,
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
