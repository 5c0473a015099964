"""Diagonal Fisher information of the rendered image w.r.t. map parameters.

TPU-native equivalent of the reference fork's Hessian rasterizer + ROS
active-view-selection math:

  * `compute_Hessian` (`scripts/ros_handler.py:839-902`): render with
    `backward_power=2`, seed the backward with 1e-3 * ones on the RGB image,
    read H = [grad^2 means3D || grad^2 opacities] per gaussian -> (N, 4).
  * `compute_H_visited_inv` (`ros_handler.py:807-829`): H_train =
    sum of per-pose Hessians over <= `monte_carlo` visited poses,
    H_train_inv = 1 / (H_train + 0.1).
  * `compute_eig_score` (`ros_handler.py:832-836`): EIG = sum(H * H_train_inv).
  * silhouette gain (`ros_handler.py:299-311`) and the optional sigmoid
    nonlinearity (`ros_handler.py:314-318`).

The squared PER-PIXEL gradients come from the Pallas fisher kernel
(render/pallas_raster.py::_fisher_kernel), which emits per-gaussian second
moments M = sum_p v v^T of the screen-space gradients; the chain to 3D means
is closed here as diag(J^T M J) with J the per-gaussian projection Jacobian
— exact, because J does not depend on the pixel.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from splatam_tpu.core.transforms import normalize, transform_to_frame
from splatam_tpu.render.binning import RasterConfig, bin_gaussians_csr
from splatam_tpu.render.camera import Camera
from splatam_tpu.render.geometry import TILE, compute_cov3d, preprocess
from splatam_tpu.render.pallas_raster import (
    NFEAT_PAD,
    fisher_moments,
    pack_attrs,
)

# upper-triangle index pairs matching _fisher_kernel's moment rows
_TRI_PAIRS = [(a, b) for a in range(5) for b in range(a, 5)]


def _screen_quantities(mean3d, cov3d, cam: Camera):
    """mean3D -> (x_pix, y_pix, conic_a, conic_b, conic_c) for one gaussian.

    Mirrors the preprocess math (geometry.py) for a single point so jacfwd
    gives the exact per-gaussian projection Jacobian.
    """
    p_hom = cam.projmatrix[:3, :3] @ mean3d + cam.projmatrix[:3, 3]
    wclip = cam.projmatrix[3, :3] @ mean3d + cam.projmatrix[3, 3]
    p_w = 1.0 / (wclip + 1e-7)
    x = ((p_hom[0] * p_w + 1.0) * cam.image_width - 1.0) * 0.5
    y = ((p_hom[1] * p_w + 1.0) * cam.image_height - 1.0) * 0.5

    W = cam.viewmatrix[:3, :3]
    t = W @ mean3d + cam.viewmatrix[:3, 3]
    tz = t[2]
    limx, limy = 1.3 * cam.tanfovx, 1.3 * cam.tanfovy
    tx = jnp.clip(t[0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[1] / tz, -limy, limy) * tz
    fx, fy = cam.focal_x, cam.focal_y
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    J = jnp.array(
        [
            [fx * inv_tz, 0.0, -fx * tx * inv_tz2],
            [0.0, fy * inv_tz, -fy * ty * inv_tz2],
        ]
    )
    sig = jnp.array(
        [
            [cov3d[0], cov3d[1], cov3d[2]],
            [cov3d[1], cov3d[3], cov3d[4]],
            [cov3d[2], cov3d[4], cov3d[5]],
        ]
    )
    V = W @ sig @ W.T
    cov2d = J @ V @ J.T
    cxx, cxy, cyy = cov2d[0, 0] + 0.3, cov2d[0, 1], cov2d[1, 1] + 0.3
    det = cxx * cyy - cxy * cxy
    det_inv = 1.0 / det
    return jnp.stack([x, y, cyy * det_inv, -cxy * det_inv, cxx * det_inv])


def render_fisher(
    params: Dict[str, jax.Array],
    active: jax.Array,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    cam: Camera,
    cfg: RasterConfig,
    seed_value: float = 1e-3,
) -> jax.Array:
    """Diagonal Fisher H = [F(means3D) || F(opacity)] per gaussian, (N, 4).

    `compute_Hessian` parity (`ros_handler.py:839-902`): the RGB render is
    seeded with `seed_value` * ones; per-pixel parameter gradients are
    squared before accumulation (the whole point of the fused power=2 CUDA
    backward, SURVEY.md §7 hard-part #7).
    """
    iso = params["log_scales"].shape[1] == 1
    log_scales = (
        jnp.tile(params["log_scales"], (1, 3)) if iso else params["log_scales"]
    )
    pts, rots, _ = transform_to_frame(
        params["means3D"],
        params["unnorm_rotations"],
        cam_rot,
        cam_tran,
        transform_rots=not iso,
        gaussians_grad=False,
        camera_grad=False,
    )
    rots = normalize(rots)
    scales = jnp.exp(log_scales)
    opac = jax.nn.sigmoid(params["logit_opacities"]).reshape(-1)
    colors = params["rgb_colors"]

    proj = preprocess(pts, scales, rots, cam, active=active)
    # the fisher kernel runs on the aligned-window layout regardless of the
    # caller's production layout (it bins per candidate pose itself, so the
    # packed layout's step savings don't compound with a frozen rebin here)
    import dataclasses as _dc

    cfg_fisher = (
        _dc.replace(cfg, layout="aligned") if cfg.layout != "aligned" else cfg
    )
    binned = bin_gaussians_csr(proj, cam, cfg_fisher, opacities=opac)
    attrs = pack_attrs(proj.means2d, proj.conic, opac, proj.depths, colors)

    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    seed = jnp.zeros(NFEAT_PAD, jnp.float32).at[:3].set(seed_value)
    mom = fisher_moments(
        attrs, binned, grid_x * grid_y, grid_x, cfg.chunk, seed
    )  # (N, 16)

    # close the chain to 3D means: F_d = (J^T M J)_dd per gaussian
    cov3d = compute_cov3d(scales, rots)
    jac = jax.vmap(
        lambda m, c: jax.jacfwd(_screen_quantities)(m, c, cam)
    )(pts, cov3d)  # (N, 5, 3)

    M = jnp.zeros((pts.shape[0], 5, 5), jnp.float32)
    for row, (a, b) in enumerate(_TRI_PAIRS):
        M = M.at[:, a, b].set(mom[:, row])
        if a != b:
            M = M.at[:, b, a].set(mom[:, row])
    f_mean = jnp.einsum(
        "nad,nab,nbe->nde", jac, M, jac, precision=jax.lax.Precision.HIGHEST
    )
    f_mean = jnp.diagonal(f_mean, axis1=1, axis2=2)  # (N, 3)
    f_op = mom[:, 15:16]  # (N, 1)
    h = jnp.concatenate([f_mean, f_op], axis=-1)
    return jnp.where(active[:, None], h, 0.0)


def h_train_inverse(
    hessians: Sequence[np.ndarray],
    monte_carlo: int | None = 40,
    rng: np.random.Generator | None = None,
    eps: float = 0.1,
) -> np.ndarray:
    """`compute_H_visited_inv` parity (`ros_handler.py:807-829`).

    Sums per-pose Hessians (Monte-Carlo subsampled to <= monte_carlo poses)
    and returns the elementwise inverse 1 / (H + eps).
    """
    hessians = list(hessians)
    if monte_carlo is not None and len(hessians) > monte_carlo:
        rng = rng or np.random.default_rng(0)
        idx = rng.choice(len(hessians), monte_carlo, replace=False)
        hessians = [hessians[i] for i in idx]
    h_train = np.sum(np.stack(hessians, axis=0), axis=0)
    return 1.0 / (h_train + eps)


def eig_score(h_pose: jax.Array, h_train_inv: jax.Array) -> jax.Array:
    """Expected information gain: sum(H_pose * H_train_inv)
    (`ros_handler.py:832-836`)."""
    return jnp.sum(h_pose * h_train_inv)


def silhouette_gain(silhouette: jax.Array, k_sil: float = 1.0) -> jax.Array:
    """Fraction of un-mapped pixels (sil < 0.5) scaled by k_sil
    (`ros_handler.py:299-311`)."""
    h, w = silhouette.shape[-2:]
    return jnp.sum(silhouette < 0.5) / (h * w) * k_sil


def nonlinear_gain(x, scale: float = 3400.0, rate: float = 0.002):
    """Optional sigmoid squashing of the EIG score (`ros_handler.py:314-318`)."""
    return scale / (1.0 + jnp.exp(-rate * x)) - scale / 2.0
