"""Silhouette/depth-error-driven densification.

Parity: `add_new_gaussians` (`scripts/splatam.py:384-426`). The render runs
jitted on device; mask compaction and back-projection are host-side (the new
point count is data-dependent, which XLA cannot express), writing into the
capacity-padded map via `append_gaussians`.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splatam_tpu.core.losses import render_for_loss
from splatam_tpu.core.optim import AdamState, zero_state_slots
from splatam_tpu.core.params import (
    GAUSSIAN_KEYS,
    Params,
    Variables,
    append_gaussians,
    get_pose,
    slots_used,
)
from splatam_tpu.core.transforms import pose_to_w2c
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import Camera
from splatam_tpu.slam.initialize import get_pointcloud


@partial(jax.jit, static_argnames=("cfg",))
def _render_depth_sil(params, active, cam_rot, cam_tran, cam: Camera, cfg: RasterConfig):
    out, _ = render_for_loss(
        params, active, cam_rot, cam_tran, cam, cfg,
        gaussians_grad=False, camera_grad=False,
    )
    return out.color[3], out.color[4]  # render_depth (H, W), silhouette (H, W)


def add_new_gaussians(
    params: Params,
    variables: Variables,
    opt_state: AdamState | None,
    frame_im: jax.Array,  # (3, H, W)
    frame_depth: jax.Array,  # (1, H, W)
    intrinsics: np.ndarray,  # (3, 3)
    cam: Camera,
    cfg: RasterConfig,
    sil_thres: float,
    time_idx: int,
    gaussian_distribution: str,
    pose=None,  # (rot, tran); defaults to the trajectory at time_idx
) -> Tuple[Params, Variables, AdamState | None, int]:
    """Append Gaussians where the map fails to explain the frame.

    Returns (params, variables, opt_state, num_added). The render below is
    given ONLY the gaussian arrays — jitted programs must not see the
    trajectory arrays, whose length varies per sequence and would force a
    recompile of everything for every new sequence length.
    """
    cam_rot, cam_tran = pose if pose is not None else get_pose(params, time_idx)
    gauss = {k: params[k] for k in GAUSSIAN_KEYS}
    gauss["log_scales"] = params["log_scales"]
    render_depth, silhouette = _render_depth_sil(
        gauss, variables["active"], cam_rot, cam_tran, cam, cfg
    )

    gt_depth = frame_depth[0]
    depth_error = jnp.abs(gt_depth - render_depth) * (gt_depth > 0)
    non_presence = (silhouette < sil_thres) | (
        (render_depth > gt_depth) & (depth_error > 50 * jnp.median(depth_error))
    )
    non_presence = non_presence.reshape(-1) & (gt_depth > 0).reshape(-1)

    mask = np.asarray(non_presence)
    if not mask.any():
        return params, variables, opt_state, 0

    curr_w2c = np.asarray(pose_to_w2c(cam_rot, cam_tran))
    new_pt_cld, mean3_sq_dist = get_pointcloud(
        np.asarray(frame_im), np.asarray(frame_depth), intrinsics, curr_w2c,
        mask=mask, compute_mean_sq_dist=True,
    )
    m = new_pt_cld.shape[0]
    scale_dim = 1 if gaussian_distribution == "isotropic" else 3
    new_values = {
        "means3D": new_pt_cld[:, :3],
        "rgb_colors": new_pt_cld[:, 3:6],
        "unnorm_rotations": np.tile([1, 0, 0, 0], (m, 1)).astype(np.float32),
        "logit_opacities": np.zeros((m, 1), np.float32),
        "log_scales": np.tile(
            np.log(np.sqrt(np.maximum(mean3_sq_dist, 1e-12)))[:, None],
            (1, scale_dim),
        ).astype(np.float32),
    }
    start = slots_used(variables)
    old_cap = params["means3D"].shape[0]
    params, variables, opt_state = append_gaussians(
        params, variables, opt_state, new_values, time_idx
    )
    if opt_state is not None:
        # moments for appended slots start at zero (they already are if the
        # capacity grew — grow_capacity zero-fills — but slots below the old
        # capacity may hold stale moments from pruned gaussians)
        stop = min(start + m, old_cap)
        if stop > start:
            opt_state = zero_state_slots(opt_state, GAUSSIAN_KEYS, start, stop)
    return params, variables, opt_state, m
