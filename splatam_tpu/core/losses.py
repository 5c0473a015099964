"""SLAM losses: silhouette-masked L1 photometric + depth, SSIM.

Parity targets:
  * `get_loss` (`scripts/splatam.py:220-353`) — tracking/mapping modes,
    silhouette/outlier masking, sum-vs-mean reductions.
  * `calc_ssim` (`utils/slam_external.py:54-98`) — 11x11 Gaussian window,
    sigma 1.5, zero padding.

Unlike the reference (two full rasterizer calls per iteration), the RGB and
depth/silhouette channels are rendered in ONE fused 6-channel pass — the
compositing weights are identical, so results match while halving the
rasterization work per optimization step.
"""
from __future__ import annotations

import functools
from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from splatam_tpu.core.transforms import normalize, transform_to_frame
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import Camera
from splatam_tpu.render.render_tiled import rasterize_tiled


def l1_loss_v1(x, y):
    return jnp.abs(x - y).mean()


def calc_psnr(img1, img2):
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


@functools.lru_cache(maxsize=8)
def _band_matrix(n: int, window_size: int, sigma: float):
    """(n, n) banded Gaussian-blur matrix: B[i, j] = g[j - i + pad].

    Multiplying by B IS the 1-D 'same'-zero-padded Gaussian conv (band
    clipped at the edges, no renormalization — torch F.conv2d parity), but
    runs on the MXU: XLA lowers the depthwise convs this replaces to a
    VPU/layout path that cost ~0.6 ms per call at SLAM resolution, ~100x
    the matmul's FLOP-equivalent time. Returns a HOST numpy array (a cached
    jnp constant would leak tracers across jit scopes); callers embed it.
    """
    import numpy as np

    pad = window_size // 2
    g = np.exp(
        -((np.arange(window_size) - pad) ** 2) / (2.0 * sigma**2)
    )
    g = (g / g.sum()).astype(np.float32)
    i = np.arange(n)
    d = i[None, :] - i[:, None] + pad
    return np.where(
        (d >= 0) & (d < window_size), g[np.clip(d, 0, window_size - 1)], 0.0
    ).astype(np.float32)


def calc_ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """SSIM over (C, H, W) images, torch-conv parity (zero 'same' padding).

    The separable Gaussian filter is applied as two banded-matrix matmuls
    (see _band_matrix) so the 10 filtering passes ride the MXU instead of
    XLA's depthwise-conv path."""
    h, w = img1.shape[-2:]
    bh = jnp.asarray(_band_matrix(h, window_size, 1.5))
    bw = jnp.asarray(_band_matrix(w, window_size, 1.5))

    def conv(x):
        # HIGH (3-pass bf16 split, ~2^-22 relative) — the band matmuls are
        # MXU-bound at SLAM resolution (~2.3 ms/iter incl. AD at HIGHEST's
        # 6 passes); operands sit in [0, 1] so the split error is ~1e-7 on
        # the SSIM value, well inside the 1e-5 torch-parity pin
        y = jnp.einsum(
            "chw,wv->chv", x, bw, precision=jax.lax.Precision.HIGH
        )
        return jnp.einsum(
            "ih,chv->civ", bh, y, precision=jax.lax.Precision.HIGH
        )

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def depth_silhouette_colors(pts_cam: jax.Array, viewmatrix: jax.Array) -> jax.Array:
    """Per-Gaussian [z, 1, z^2] channels (`utils/slam_helpers.py:196-213`).

    ``pts_cam`` are already in the render camera's world frame; viewmatrix is
    the render camera's w2c (identity-relative in SLAM).
    """
    z = (
        jnp.matmul(pts_cam, viewmatrix[2, :3], precision=jax.lax.Precision.HIGHEST)
        + viewmatrix[2, 3]
    )
    return jnp.stack([z, jnp.ones_like(z), z * z], axis=-1)


class LossOutput(NamedTuple):
    loss: jax.Array
    losses: Dict[str, jax.Array]
    radius: jax.Array  # (N,) int32 (seen = radius > 0)
    overflow: jax.Array
    im: jax.Array  # rendered rgb (3, H, W)
    depth: jax.Array  # rendered depth channel (1, H, W)
    silhouette: jax.Array  # (H, W)
    # (num_tiles,) per-tile saturation depth from the render (pallas backend;
    # None on the jnp path) — pass to the next compute_binned(depth_cap=)
    sat_depth: jax.Array | None = None


def render_for_loss(
    params: Dict[str, jax.Array],
    active: jax.Array,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    cam: Camera,
    cfg: RasterConfig,
    gaussians_grad: bool,
    camera_grad: bool,
    means2d_dummy: jax.Array | None = None,
    binned=None,
):
    """Transform to frame + fused 6-channel render (rgb, z, sil, z^2 ...)."""
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
        gaussians_grad=gaussians_grad,
        camera_grad=camera_grad,
    )
    dsil = depth_silhouette_colors(pts, cam.viewmatrix)
    feats = jnp.concatenate([params["rgb_colors"], dsil], axis=-1)  # (N, 6)
    out, aux = rasterize_tiled(
        pts,
        feats,
        jax.nn.sigmoid(params["logit_opacities"]),
        jnp.exp(log_scales),
        normalize(rots),
        cam,
        cfg=cfg,
        active=active,
        means2d_dummy=means2d_dummy,
        binned=binned,
    )
    return out, aux


@partial(jax.jit, static_argnames=("cfg",))
def compute_binned(
    params: Dict[str, jax.Array],
    active: jax.Array,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    cam: Camera,
    cfg: RasterConfig,
    depth_cap: jax.Array | None = None,
    tile_rank: jax.Array | None = None,
):
    """Bin the scene at the given pose/params (pallas backend).

    The result can be passed back to `slam_loss(binned=...)` for several
    optimization iterations: Adam steps move poses millimeters and Gaussians
    micro-distances, so tile membership and depth order are coherent across
    nearby iterations while the blend geometry (means2d/conic/opacity per
    iteration) stays exact. Callers re-bin every `rebin_every` steps and
    after any prune/densify mutation (see slam/pipeline.py); the drift this
    admits is bounded by tests/test_fixed_binning.py.
    """
    from splatam_tpu.render.binning import bin_gaussians_csr
    from splatam_tpu.render.geometry import preprocess

    iso = params["log_scales"].shape[1] == 1
    log_scales = (
        jnp.tile(params["log_scales"], (1, 3)) if iso else params["log_scales"]
    )
    pts, rots, _ = transform_to_frame(
        params["means3D"], params["unnorm_rotations"], cam_rot, cam_tran,
        transform_rots=not iso, gaussians_grad=False, camera_grad=False,
    )
    proj = preprocess(
        pts, jnp.exp(log_scales), normalize(rots), cam, active=active
    )
    return bin_gaussians_csr(
        jax.tree.map(jax.lax.stop_gradient, proj), cam, cfg,
        opacities=jax.nn.sigmoid(params["logit_opacities"]),
        depth_cap=depth_cap,
        tile_rank=tile_rank,
    )


def count_instances(
    params: Dict[str, jax.Array],
    active: jax.Array,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    cam: Camera,
) -> jax.Array:
    """() int32 — total (gaussian, tile) pairs the render at this pose emits.

    Cheap (projection only, no rasterization); feeds
    `render.binning.sized_config` so callers can pre-size instance capacity
    to the scene instead of paying for a worst-case default.
    """
    from splatam_tpu.render.geometry import preprocess

    iso = params["log_scales"].shape[1] == 1
    log_scales = (
        jnp.tile(params["log_scales"], (1, 3)) if iso else params["log_scales"]
    )
    pts, rots, _ = transform_to_frame(
        params["means3D"], params["unnorm_rotations"], cam_rot, cam_tran,
        transform_rots=not iso, gaussians_grad=False, camera_grad=False,
    )
    proj = preprocess(
        pts, jnp.exp(log_scales), normalize(rots), cam, active=active
    )
    return jnp.sum(proj.tiles_touched)


def slam_loss(
    params: Dict[str, jax.Array],
    active: jax.Array,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    frame_im: jax.Array,  # (3, H, W) in [0, 1]
    frame_depth: jax.Array,  # (1, H, W)
    cam: Camera,
    cfg: RasterConfig,
    *,
    tracking: bool,
    do_ba: bool = False,
    loss_w_im: float,
    loss_w_depth: float,
    use_sil_for_loss: bool,
    sil_thres: float,
    ignore_outlier_depth_loss: bool,
    means2d_dummy: jax.Array | None = None,
    median_scale: float = 50.0,
    median_thr: float | None = None,
    binned=None,
) -> LossOutput:
    """`get_loss` parity (`scripts/splatam.py:220-353`).

    tracking=True: pose-only grads, per-pixel sums over the silhouette mask.
    tracking=False (mapping): gaussian-only grads, mean L1 depth +
    0.8 L1 / 0.2 DSSIM RGB. ``do_ba=True`` (bundle adjustment,
    `scripts/splatam.py:232-238`) additionally lets the mapping loss
    carry camera-pose gradients.

    ``median_scale`` / ``median_thr`` parametrize the outlier-depth mask as
    in the realtime fork (`scripts/splatam_realtime.py:306-317`):
    mask = depth_error < (median_scale / 5) * median(depth_error), with the
    median capped at ``median_thr`` (cap active -> scale resets to 10x). The
    defaults (50, None) reproduce the offline rule `error < 10 * median`.

    On the pallas backend the whole loss runs in TILE layout (the kernels'
    native channel-major blocks): the ground-truth frame is shuffled into
    tiles instead of the render into an image, so the gt shuffle is
    AD-transpose-free and the rendered side never leaves block layout
    except for the 3 RGB channels SSIM needs — eliminating ~200 MB/iter of
    tiles<->image HBM traffic at SLAM resolution.
    """
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "pallas" and cfg.shard_axis is None:
        return _slam_loss_blocks(
            params, active, cam_rot, cam_tran, frame_im, frame_depth, cam,
            cfg, tracking=tracking, do_ba=do_ba, loss_w_im=loss_w_im,
            loss_w_depth=loss_w_depth, use_sil_for_loss=use_sil_for_loss,
            sil_thres=sil_thres,
            ignore_outlier_depth_loss=ignore_outlier_depth_loss,
            means2d_dummy=means2d_dummy, median_scale=median_scale,
            median_thr=median_thr, binned=binned,
        )
    out, aux = render_for_loss(
        params, active, cam_rot, cam_tran, cam, cfg,
        gaussians_grad=not tracking, camera_grad=tracking or do_ba,
        means2d_dummy=means2d_dummy, binned=binned,
    )
    im = out.color[:3]
    depth = out.color[3:4]
    silhouette = out.color[4]
    depth_sq = out.color[5:6]
    uncertainty = jax.lax.stop_gradient(depth_sq - depth**2)

    nan_mask = (~jnp.isnan(depth)) & (~jnp.isnan(uncertainty))
    if ignore_outlier_depth_loss:
        depth_error = jnp.abs(frame_depth - depth) * (frame_depth > 0)
        median = jnp.median(depth_error)
        if median_thr is not None:
            capped = median > median_thr
            scale = jnp.where(capped, 10.0, median_scale / 5.0)
            median = jnp.minimum(median, median_thr)
        else:
            scale = median_scale / 5.0
        mask = (depth_error < scale * median) & (frame_depth > 0)
    else:
        mask = frame_depth > 0
    mask = mask & nan_mask
    if tracking and use_sil_for_loss:
        mask = mask & (silhouette > sil_thres)[None]
    mask = jax.lax.stop_gradient(mask)

    losses = {}
    depth_abs = jnp.abs(frame_depth - depth)
    if tracking:
        losses["depth"] = jnp.sum(depth_abs * mask)
    else:
        losses["depth"] = jnp.sum(depth_abs * mask) / jnp.maximum(
            jnp.sum(mask), 1
        )

    rgb_abs = jnp.abs(frame_im - im)
    if tracking and (use_sil_for_loss or ignore_outlier_depth_loss):
        losses["im"] = jnp.sum(rgb_abs * mask)  # mask broadcasts over channels
    elif tracking:
        losses["im"] = jnp.sum(rgb_abs)
    else:
        losses["im"] = 0.8 * l1_loss_v1(im, frame_im) + 0.2 * (
            1.0 - calc_ssim(im, frame_im)
        )

    loss = loss_w_im * losses["im"] + loss_w_depth * losses["depth"]
    losses["loss"] = loss
    return LossOutput(
        loss=loss,
        losses=losses,
        radius=out.radius,
        overflow=aux.overflow,
        im=im,
        depth=depth,
        silhouette=silhouette,
        sat_depth=aux.sat_depth,
    )


def _slam_loss_blocks(
    params, active, cam_rot, cam_tran, frame_im, frame_depth, cam, cfg,
    *, tracking, do_ba, loss_w_im, loss_w_depth, use_sil_for_loss, sil_thres,
    ignore_outlier_depth_loss, means2d_dummy, median_scale, median_thr,
    binned,
) -> LossOutput:
    """slam_loss evaluated in the pallas kernels' native TILE layout.

    Semantically identical to the image path (tests pin it against the jnp
    oracle): the gt frame is tiled (no AD transpose — it's constant), all
    masked depth/sil terms run on (T, C, 256) blocks, and only the 3 RGB
    channels are shuffled to image layout (mapping needs SSIM's spatial
    filter; that one conversion also serves LossOutput.im). Out-of-image
    pad pixels carry gt_depth = 0, so every gt-masked term excludes them
    for free; the unmasked RGB terms and the outlier median mask them
    explicitly (valid_pixel_blocks / +inf).
    """
    from splatam_tpu.render.render_tiled import (
        _blocks_to_image,
        image_to_blocks,
        rasterize_tiled_blocks,
        valid_pixel_blocks,
    )
    from splatam_tpu.render.geometry import TILE

    gaussians_grad = not tracking
    camera_grad = tracking or do_ba
    iso = params["log_scales"].shape[1] == 1
    log_scales = (
        jnp.tile(params["log_scales"], (1, 3)) if iso else params["log_scales"]
    )
    pts, rots, _ = transform_to_frame(
        params["means3D"], params["unnorm_rotations"], cam_rot, cam_tran,
        transform_rots=not iso, gaussians_grad=gaussians_grad,
        camera_grad=camera_grad,
    )
    dsil = depth_silhouette_colors(pts, cam.viewmatrix)
    feats = jnp.concatenate([params["rgb_colors"], dsil], axis=-1)  # (N, 6)
    # grad_feats=4 / carry_depth_grad=False: this loss backprops only the
    # RGB + blended-depth channels — the sil / z^2 channels feed
    # stop_gradient'd masks and the median-depth output is not in the loss
    # at all, so their cotangents are structurally zero and their reduction
    # rows can be dropped (~0.6 ms each at SLAM scale in sort mode)
    res, aux, proj = rasterize_tiled_blocks(
        pts, feats, jax.nn.sigmoid(params["logit_opacities"]),
        jnp.exp(log_scales), normalize(rots), cam, cfg,
        active=active, means2d_dummy=means2d_dummy, binned=binned,
        grad_feats=4, carry_depth_grad=False,
    )
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE

    blocks = res.color  # (T, 8, NPIX) channel-major
    t_fin = res.aux[:, 1]  # (T, NPIX)
    bg = cam.bg[:3]
    im_t = blocks[:, :3] + t_fin[:, None, :] * bg[None, :, None]
    depth_t = blocks[:, 3]
    sil_t = blocks[:, 4]
    z2_t = blocks[:, 5]
    uncertainty_t = jax.lax.stop_gradient(z2_t - depth_t * depth_t)

    valid_t = valid_pixel_blocks(cam)  # (T, NPIX) f32
    gt_im_t = image_to_blocks(frame_im, cam)  # (T, 3, NPIX); pads 0
    gt_depth_t = image_to_blocks(frame_depth, cam)[:, 0]  # (T, NPIX)

    nan_mask = (~jnp.isnan(depth_t)) & (~jnp.isnan(uncertainty_t))
    depth_error = jnp.abs(gt_depth_t - depth_t) * (gt_depth_t > 0)
    if ignore_outlier_depth_loss:
        # exact masked median: pad pixels sort to the end as +inf and the
        # middle two of the H*W REAL pixels are averaged — identical to
        # jnp.median over the image-layout depth_error
        hw = cam.image_height * cam.image_width
        flat = jnp.sort(
            jnp.where(valid_t > 0, depth_error, jnp.inf).ravel()
        )
        median = 0.5 * (flat[(hw - 1) // 2] + flat[hw // 2])
        if median_thr is not None:
            capped = median > median_thr
            scale = jnp.where(capped, 10.0, median_scale / 5.0)
            median = jnp.minimum(median, median_thr)
        else:
            scale = median_scale / 5.0
        mask = (depth_error < scale * median) & (gt_depth_t > 0)
    else:
        mask = gt_depth_t > 0
    mask = mask & nan_mask
    if tracking and use_sil_for_loss:
        mask = mask & (sil_t > sil_thres)
    mask = jax.lax.stop_gradient(mask)

    losses = {}
    depth_abs = jnp.abs(gt_depth_t - depth_t)
    if tracking:
        losses["depth"] = jnp.sum(depth_abs * mask)
    else:
        losses["depth"] = jnp.sum(depth_abs * mask) / jnp.maximum(
            jnp.sum(mask), 1
        )

    rgb_abs = jnp.abs(gt_im_t - im_t)  # (T, 3, NPIX)
    if tracking and (use_sil_for_loss or ignore_outlier_depth_loss):
        losses["im"] = jnp.sum(rgb_abs * mask[:, None, :])
    elif tracking:
        losses["im"] = jnp.sum(rgb_abs * valid_t[:, None, :])
    else:
        # mapping RGB needs SSIM's spatial filter — the ONE image-layout
        # conversion (3 channels); it doubles as LossOutput.im
        im_img = _blocks_to_image(im_t, grid_x, grid_y, cam)
        losses["im"] = 0.8 * l1_loss_v1(im_img, frame_im) + 0.2 * (
            1.0 - calc_ssim(im_img, frame_im)
        )

    loss = loss_w_im * losses["im"] + loss_w_depth * losses["depth"]
    losses["loss"] = loss
    if tracking:
        im_img = _blocks_to_image(im_t, grid_x, grid_y, cam)
    return LossOutput(
        loss=loss,
        losses=losses,
        radius=proj.radius,
        overflow=aux.overflow,
        im=im_img,
        depth=_blocks_to_image(depth_t[:, None, :], grid_x, grid_y, cam),
        silhouette=_blocks_to_image(sil_t[:, None, :], grid_x, grid_y, cam)[0],
        sat_depth=aux.sat_depth,
    )
