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

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from splatam_tpu.core.transforms import normalize, transform_to_frame
from splatam_tpu.render.binning import (
    RasterConfig,
    bin_gaussians_csr,
    sized_config,
)
from splatam_tpu.render.camera import Camera
from splatam_tpu.render.geometry import TILE, compute_cov3d, preprocess
from splatam_tpu.render.pallas_raster import (
    NFEAT_PAD,
    fisher_moments,
    pack_attrs,
)

# upper-triangle index pairs matching _fisher_kernel's moment rows
_TRI_PAIRS = [(a, b) for a in range(5) for b in range(a, 5)]


def _gaussian_frame(params: Dict[str, jax.Array], cam_rot, cam_tran):
    """Camera-frame gaussians (pts, rots, scales, opacities) from raw params."""
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
    return pts, normalize(rots), jnp.exp(log_scales), jax.nn.sigmoid(
        params["logit_opacities"]
    ).reshape(-1)


def _projection_jacobian(pts, cov3d, cam: Camera, active):
    """(N, 5, 3) d(x, y, conic_a, conic_b, conic_c)/d(mean3d), per gaussian.

    Three jvp tangent passes through the BATCHED `preprocess` (elementwise
    math), replacing the round-3 `vmap(jacfwd)` over per-gaussian (3, 3)
    matmuls — batched tiny dot_generals tile terribly on TPU (CLAUDE.md),
    and the jvp-of-elementwise form is a handful of fused (N,) ops. cov3d is
    held fixed: it does not depend on the mean, so this is the exact same
    Jacobian the per-point closure computed.
    """

    def quantities(p):
        pr = preprocess(p, None, None, cam, active=active, cov3d_precomp=cov3d)
        return jnp.concatenate([pr.means2d, pr.conic], axis=1)  # (N, 5)

    _, lin = jax.linearize(quantities, pts)
    basis = jnp.eye(3, dtype=pts.dtype)
    return jnp.stack(
        [lin(jnp.broadcast_to(basis[d], pts.shape)) for d in range(3)], axis=2
    )


def fisher_config(cfg: RasterConfig) -> RasterConfig:
    """The layout render_fisher actually bins with.

    Always aligned windows: the fisher kernels are single-call (no split
    interior/tail pair), and the fisher path bins per candidate pose so a
    layout change would buy little over a frozen rebin anyway.
    """
    return (
        dataclasses.replace(cfg, layout="aligned")
        if cfg.layout != "aligned" else cfg
    )


def render_fisher(
    params: Dict[str, jax.Array],
    active: jax.Array,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    cam: Camera,
    cfg: RasterConfig,
    seed_value: float = 1e-3,
    binned=None,
    with_overflow: bool = False,
    tile_color=None,
):
    """Diagonal Fisher H = [F(means3D) || F(opacity)] per gaussian, (N, 4).

    `compute_Hessian` parity (`ros_handler.py:839-902`): the RGB render is
    seeded with `seed_value` * ones; per-pixel parameter gradients are
    squared before accumulation (the whole point of the fused power=2 CUDA
    backward, SURVEY.md §7 hard-part #7).

    ``binned`` lets a caller share one binning between this and a same-pose
    silhouette render (realtime/handler.py); ``tile_color`` additionally
    shares that render's forward tile blocks (fisher_moments docstring), so
    the fused gains program runs ONE fwd pass per candidate instead of two.
    ``with_overflow=True`` returns ``(h, overflow)`` so callers running at
    snug `sized_fisher_config` capacities can detect truncation and retry
    bigger.
    """
    pts, rots, scales, opac = _gaussian_frame(params, cam_rot, cam_tran)
    colors = params["rgb_colors"]

    cov3d = compute_cov3d(scales, rots, cam.scale_modifier)
    proj = preprocess(pts, None, None, cam, active=active, cov3d_precomp=cov3d)
    cfg_fisher = fisher_config(cfg)
    if binned is None:
        binned = bin_gaussians_csr(proj, cam, cfg_fisher, opacities=opac)
    attrs = pack_attrs(proj.means2d, proj.conic, opac, proj.depths, colors)

    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    seed = jnp.zeros(NFEAT_PAD, jnp.float32).at[:3].set(seed_value)
    mom = fisher_moments(
        attrs, binned, grid_x * grid_y, grid_x, cfg.chunk, seed,
        tile_color=tile_color,
    )  # (N, 16)

    # close the chain to 3D means: F_d = (J^T M J)_dd per gaussian, folded
    # as sum_{a<=b} (2 - [a==b]) M_ab jac_a_d jac_b_d — 15 fused (N, 3)
    # multiply-adds, no (N, 5, 5) intermediate and no batched einsum
    jac = _projection_jacobian(pts, cov3d, cam, active)  # (N, 5, 3)
    f_mean = jnp.zeros((pts.shape[0], 3), jnp.float32)
    for row, (a, b) in enumerate(_TRI_PAIRS):
        w = mom[:, row] if a == b else 2.0 * mom[:, row]
        f_mean = f_mean + w[:, None] * jac[:, a, :] * jac[:, b, :]
    f_op = mom[:, 15:16]  # (N, 1)
    h = jnp.concatenate([f_mean, f_op], axis=-1)
    h = jnp.where(active[:, None], h, 0.0)
    if with_overflow:
        return h, binned.overflow
    return h


def sized_fisher_config(
    params: Dict[str, jax.Array],
    active: jax.Array,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    cam: Camera,
    base: RasterConfig,
    margin: float = 1.6,
) -> RasterConfig:
    """Snug per-pose Fisher capacities from an eager probe binning.

    The safe `max_instances`-derived shapes size the kernel grid, stream
    gather and moment reduction at the worst case — ~2x device time at SLAM
    scale (PROFILE.md). One probe at a representative pose + a generous
    margin (candidate poses see different instance counts) buys that back;
    `render_fisher(with_overflow=True)` still catches a pose that outgrows
    the margin, so callers can double and re-jit (handler overflow retry).
    """
    base = fisher_config(base)
    pts, rots, scales, opac = _gaussian_frame(params, cam_rot, cam_tran)
    proj = preprocess(pts, scales, rots, cam, active=active)
    total = int(jnp.sum(proj.tiles_touched))
    binned = bin_gaussians_csr(proj, cam, base, opacities=opac)
    return sized_config(
        total,
        base,
        margin=margin,
        num_kept=int(binned.num_instances),
        chunks_used=int(binned.padded_total) // base.chunk,
    )


def fisher_h_train(
    params: Dict[str, jax.Array],
    active: jax.Array,
    rots: jax.Array,  # (P, 4) w2c rotations as quaternions
    trans: jax.Array,  # (P, 3)
    weights: jax.Array,  # (P,) f32 0/1 — padded slots carry weight 0
    cam: Camera,
    cfg: RasterConfig,
    seed_value: float = 1e-3,
):
    """sum_i weights[i] * Fisher(pose_i) in ONE compiled program.

    `compute_H_visited_inv`'s Monte-Carlo sum (`ros_handler.py:807-829`)
    as a device-side lax.scan: the round-3 host loop paid one dispatch +
    fetch per pose (~35 ms tunnel each); this pays one. P is padded to a
    fixed cap (the monte_carlo setting) so the program compiles once, not
    once per visited-pose count. Returns (h_train, overflow) — overflow
    only counts weighted poses.
    """

    def body(carry, rt):
        h_acc, over_acc = carry
        r, t, wgt = rt
        h, over = render_fisher(
            params, active, r, t, cam, cfg,
            seed_value=seed_value, with_overflow=True,
        )
        return (h_acc + wgt * h, over_acc | (over & (wgt > 0))), None

    n = params["means3D"].shape[0]
    init = (jnp.zeros((n, 4), jnp.float32), jnp.zeros((), bool))
    (h_train, over), _ = jax.lax.scan(body, init, (rots, trans, weights))
    return h_train, over


def render_gains(
    params: Dict[str, jax.Array],
    active: jax.Array,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    cam: Camera,
    cfg: RasterConfig,
    h_train_inv: jax.Array | None = None,
    seed_value: float = 1e-3,
):
    """One candidate pose -> (g_sil_raw, g_eig_raw, overflow), one program.

    Fuses the per-candidate work of `send_gains` (`ros_handler.py:251-359`):
    the silhouette render (`ros_handler.py:299-311`) and, when
    ``h_train_inv`` is given, the Fisher render + EIG dot
    (`ros_handler.py:832-836`) — sharing ONE binning AND ONE forward pass
    between the two renders (the sil count runs in tile layout against a
    static valid-pixel mask, and the fwd tile blocks seed fisher_moments
    directly), fetching three scalars instead of a full silhouette image
    plus an (N, 4) Hessian per candidate (~35 ms/dispatch tunnel tax each,
    tools/fisher_bench.py).
    """
    from splatam_tpu.core.losses import depth_silhouette_colors
    from splatam_tpu.render.render_tiled import rasterize_tiled_blocks

    cfg_fisher = fisher_config(cfg)
    pts, rots, scales, opac = _gaussian_frame(params, cam_rot, cam_tran)
    proj = preprocess(pts, scales, rots, cam, active=active)
    binned = bin_gaussians_csr(proj, cam, cfg_fisher, opacities=opac)

    use_blocks = (
        cfg_fisher.backend == "pallas"
        or (cfg_fisher.backend == "auto" and jax.default_backend() == "tpu")
    ) and cfg_fisher.chunk % 128 == 0
    if use_blocks:
        feats = jnp.concatenate(
            [params["rgb_colors"],
             depth_silhouette_colors(pts, cam.viewmatrix)],
            axis=-1,
        )
        res, raux, _ = rasterize_tiled_blocks(
            pts, feats, opac, scales, rots, cam, cfg_fisher, active=active,
            binned=binned,
        )
        sil_blk = res.color[:, 4, :]  # (T, NPIX) tile-layout silhouette
        g_sil = jnp.sum(
            (sil_blk < 0.5) & _valid_pixel_mask(cam)
        ) / (cam.image_width * cam.image_height)
        overflow = binned.overflow | raux.overflow
        tile_color = res.color
    else:
        # jnp / odd-chunk configs: image-path sil render, no block sharing
        from splatam_tpu.core.losses import render_for_loss

        out, aux = render_for_loss(
            params, active, cam_rot, cam_tran, cam, cfg_fisher,
            gaussians_grad=False, camera_grad=False, binned=binned,
        )
        sil = out.color[4]
        g_sil = jnp.sum(sil < 0.5) / (cam.image_width * cam.image_height)
        overflow = binned.overflow | aux.overflow
        tile_color = None

    if h_train_inv is None:
        g_eig = jnp.zeros((), jnp.float32)
    else:
        h, over_f = render_fisher(
            params, active, cam_rot, cam_tran, cam, cfg,
            seed_value=seed_value, binned=binned, with_overflow=True,
            tile_color=tile_color,
        )
        g_eig = jnp.sum(h * h_train_inv)
        overflow = overflow | over_f
    return g_sil.astype(jnp.float32), g_eig, overflow


def _valid_pixel_mask(cam: Camera) -> jax.Array:
    """(T, NPIX) bool: which tile-block pixels land inside the image.

    Tile blocks pad the image up to the 16x16 grid; a tile-layout pixel
    count must exclude the pad pixels (an image-layout compose crops them,
    but composing costs a full blocks->image shuffle per candidate).
    """
    gx = (cam.image_width + TILE - 1) // TILE
    gy = (cam.image_height + TILE - 1) // TILE
    t = np.arange(gx * gy, dtype=np.int32)[:, None]
    p = np.arange(TILE * TILE, dtype=np.int32)[None, :]
    gx_pix = (t % gx) * TILE + (p % TILE)
    gy_pix = (t // gx) * TILE + (p // TILE)
    return jnp.asarray(
        (gx_pix < cam.image_width) & (gy_pix < cam.image_height)
    )


def fisher_gains_batch(
    params: Dict[str, jax.Array],
    active: jax.Array,
    rots: jax.Array,  # (P, 4) w2c rotations as quaternions
    trans: jax.Array,  # (P, 3)
    weights: jax.Array,  # (P,) f32 0/1 — padded slots carry weight 0
    cam: Camera,
    cfg: RasterConfig,
    h_train_inv: jax.Array | None = None,
    seed_value: float = 1e-3,
):
    """Score a whole candidate PoseArray in ONE compiled program.

    `send_gains` scores every candidate in one planner callback
    (`ros_handler.py:251-359`); a host loop over `render_gains` pays the
    ~35 ms tunnel dispatch + per-pose binning dispatch chain per candidate
    (132.6 ms each, PROFILE.md r4). This is the same device-side padded
    lax.scan as `fisher_h_train`: one dispatch, one (P,)+(P,)+() fetch.
    Returns (g_sil, g_eig, overflow) — overflow only counts weighted poses.
    """

    def body(over_acc, rt):
        r, t, wgt = rt
        g_sil, g_eig, over = render_gains(
            params, active, r, t, cam, cfg, h_train_inv, seed_value
        )
        return over_acc | (over & (wgt > 0)), (g_sil, g_eig)

    over, (sils, eigs) = jax.lax.scan(
        body, jnp.zeros((), bool), (rots, trans, weights)
    )
    return sils, eigs, over


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
