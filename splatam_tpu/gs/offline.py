"""Offline 3D Gaussian Splatting training with ground-truth poses.

Parity with `scripts/gaussian_splatting.py:320-616` (`offline_splatting`):
per-frame silhouette-driven densification with GT poses written into the
trajectory, then a final full-map optimization phase with random-frame
sampling, an exponential means3D LR schedule and Inria clone/split
densification.

The per-iteration step is one jitted program (`gs_step`); learning rates are
traced scalars so the LR schedule does not trigger recompiles.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splatam_tpu.core.losses import calc_ssim, l1_loss_v1, render_for_loss
from splatam_tpu.core.optim import AdamState, adam_step, init_adam
from splatam_tpu.core.params import GAUSSIAN_KEYS, Params, Variables, get_pose
from splatam_tpu.core.transforms import matrix_to_quaternion
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import Camera
from splatam_tpu.slam.densify import add_new_gaussians
from splatam_tpu.slam.initialize import initialize_first_timestep
from splatam_tpu.slam.inria_densify import (
    accumulate_mean2d_gradient,
    densify,
    get_expon_lr_func,
)
from splatam_tpu.slam.pipeline import SlamState, _as_frame, _set_pose


class GsStepResult(NamedTuple):
    params: Dict[str, jax.Array]
    opt_state: AdamState
    losses: Dict[str, jax.Array]
    seen: jax.Array
    radius: jax.Array
    means2d_grad_norm: jax.Array
    overflow: jax.Array


@partial(
    jax.jit,
    static_argnames=("cfg", "lr_keys", "loss_w_im", "loss_w_depth"),
)
def gs_step(
    params: Dict[str, jax.Array],
    active: jax.Array,
    opt_state: AdamState,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    frame_im: jax.Array,
    frame_depth: jax.Array,
    cam: Camera,
    cfg: RasterConfig,
    lr_keys: Tuple[str, ...],
    lr_vals: jax.Array,  # traced so the means3D schedule is recompile-free
    loss_w_im: float = 0.5,
    loss_w_depth: float = 1.0,
) -> GsStepResult:
    """One offline-3DGS Adam iteration (`get_loss_gs`,
    `gaussian_splatting.py:201-237`): full-image 0.8 L1 + 0.2 DSSIM RGB and
    mean L1 over valid-depth-masked rendered depth."""
    gauss = {k: params[k] for k in GAUSSIAN_KEYS}
    dummy = jnp.zeros((gauss["means3D"].shape[0], 2), jnp.float32)

    def loss_fn(g, d):
        p = dict(params)
        p.update(g)
        out, aux = render_for_loss(
            p, active, cam_rot, cam_tran, cam, cfg,
            gaussians_grad=True, camera_grad=False, means2d_dummy=d,
        )
        im = out.color[:3]
        depth = out.color[3:4]
        valid = (frame_depth != 0.0).astype(jnp.float32)
        losses = {
            "im": 0.8 * l1_loss_v1(im, frame_im)
            + 0.2 * (1.0 - calc_ssim(im, frame_im)),
            "depth": l1_loss_v1(depth * valid, frame_depth),
        }
        loss = loss_w_im * losses["im"] + loss_w_depth * losses["depth"]
        losses["loss"] = loss
        return loss, (losses, out.radius, aux.overflow)

    (loss, (losses, radius, overflow)), (grads, dummy_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(gauss, dummy)
    m2d_norm = jnp.linalg.norm(dummy_grad, axis=-1)

    grads = {
        k: jnp.where(active.reshape(-1, *([1] * (g.ndim - 1))), g, 0.0)
        for k, g in grads.items()
    }
    lrs = {k: lr_vals[i] for i, k in enumerate(lr_keys)}
    new_gauss, opt_state = adam_step(gauss, grads, opt_state, lrs, eps=1e-15)
    new_params = dict(params)
    new_params.update(new_gauss)
    return GsStepResult(
        params=new_params,
        opt_state=opt_state,
        losses=losses,
        seen=radius > 0,
        radius=radius,
        means2d_grad_norm=m2d_norm,
        overflow=overflow,
    )


def offline_splatting(
    config: Dict,
    dataset,
    progress: bool = True,
    initial: Optional[Tuple[Params, Variables]] = None,
    use_poses: Optional[np.ndarray] = None,
) -> SlamState:
    """Offline 3DGS training (`offline_splatting`,
    `gaussian_splatting.py:320-616`).

    ``initial``/``use_poses`` support the post-SLAM refinement entry
    (post_opt.py): start from a checkpointed map and use estimated (not GT)
    poses as fixed cameras.
    """
    train = config["train"]
    raster_cfg = RasterConfig(**config.get("raster", {}))
    rng = np.random.default_rng(config.get("seed", 0))

    num_frames = config["data"].get("num_frames", -1)
    if num_frames == -1:
        num_frames = len(dataset)

    state = SlamState()
    color, depth, intrinsics, pose = dataset[0]
    params, variables, k3, first_w2c, cam, scene_radius = initialize_first_timestep(
        np.asarray(color), np.asarray(depth), np.asarray(intrinsics),
        np.asarray(pose), num_frames,
        config["scene_radius_depth_ratio"],
        config.get("gaussian_distribution", "isotropic"),
    )
    if initial is not None:
        params, variables = initial
    state.cam, state.intrinsics, state.first_w2c = cam, k3, first_w2c
    state.scene_radius = scene_radius

    frames = []
    for time_idx in range(num_frames):
        color, depth, _, pose = dataset[time_idx]
        if use_poses is not None:
            gt_w2c = np.asarray(use_poses[time_idx], dtype=np.float64)
        else:
            gt_w2c = np.linalg.inv(np.asarray(pose, dtype=np.float64))
        state.gt_w2c_all.append(np.linalg.inv(np.asarray(pose, dtype=np.float64)))
        frame_im, frame_depth = _as_frame(color, depth)
        frames.append((frame_im, frame_depth))

        # write the (GT or estimated) pose into the trajectory params
        rel = jnp.asarray(gt_w2c, jnp.float32)
        rot = matrix_to_quaternion(rel[:3, :3])
        params = _set_pose(params, time_idx, rot, rel[:3, 3])

        if time_idx > 0 and initial is None:
            params, variables, _, _ = add_new_gaussians(
                params, variables, None, frame_im, frame_depth,
                state.intrinsics, cam, raster_cfg,
                train["sil_thres"], time_idx,
                config.get("gaussian_distribution", "isotropic"),
                pose=(rot, rel[:3, 3]),
            )
        if progress and time_idx % 50 == 0:
            print(f"init frame {time_idx}/{num_frames} "
                  f"gaussians={int(np.asarray(variables['active']).sum())}")

    # ---- final full-map optimization ----
    num_iters = train["num_iters_mapping"]
    lrs = dict(train["lrs_mapping"])
    lr_keys = tuple(k for k in GAUSSIAN_KEYS)
    sched = get_expon_lr_func(
        lr_init=lrs["means3D"],
        lr_final=train.get("lrs_mapping_means3D_final", lrs["means3D"]),
        lr_delay_mult=train.get("lr_delay_mult", 1.0),
        max_steps=num_iters,
    )
    opt_state = init_adam({k: params[k] for k in GAUSSIAN_KEYS})
    use_densify = train.get("use_gaussian_splatting_densification", False)

    t0 = time.time()
    for it in range(num_iters):
        lr_means = sched(it + 1)
        lr_vals = jnp.asarray(
            [lr_means if k == "means3D" else lrs[k] for k in lr_keys],
            jnp.float32,
        )
        t_idx = int(rng.integers(0, num_frames))
        frame_im, frame_depth = frames[t_idx]
        rot_t, tran_t = get_pose(params, t_idx)
        gauss_only = {k: params[k] for k in GAUSSIAN_KEYS}
        res = gs_step(
            gauss_only, variables["active"], opt_state,
            jax.lax.stop_gradient(rot_t),
            jax.lax.stop_gradient(tran_t),
            frame_im, frame_depth, cam, raster_cfg,
            lr_keys, lr_vals,
            loss_w_im=train["loss_weights"]["im"],
            loss_w_depth=train["loss_weights"]["depth"],
        )
        params = dict(params)
        params.update(res.params)
        opt_state = res.opt_state
        variables["max_2D_radius"] = jnp.where(
            res.seen,
            jnp.maximum(res.radius.astype(jnp.float32), variables["max_2D_radius"]),
            variables["max_2D_radius"],
        )
        if use_densify:
            variables = accumulate_mean2d_gradient(
                variables, res.means2d_grad_norm, res.seen
            )
            params, variables, opt_state = densify(
                params, variables, opt_state, it, train["densify_dict"],
                state.scene_radius, rng,
            )
        if progress and (it % 100 == 0 or it == num_iters - 1):
            print(
                f"iter {it}/{num_iters} loss={float(res.losses['loss']):.4f} "
                f"gaussians={int(np.asarray(variables['active']).sum())} "
                f"({time.time()-t0:.1f}s)"
            )

    state.params = params
    state.variables = variables
    return state
