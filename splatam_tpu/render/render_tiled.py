"""Production tile-binned rasterizer (jnp path, XLA-autodiff backward).

Static-shape re-expression of the CUDA render kernel
(`cuda_rasterizer/forward.cu:261-393`): per-tile depth-sorted instance lists
(from `binning.py`) are blended front-to-back in fixed-size chunks under a
`lax.scan`, with the sequential transmittance recursion expressed in closed
form per chunk (exclusive cumprod). Gradients — including the full chain to
3D means/covariance/scale/rotation/opacity/color that the reference computes
by hand in `cuda_rasterizer/backward.cu` — come from XLA reverse-mode AD
through this function; the Pallas kernels (render_pallas.py) are validated
against it.

The chunk body is rematerialized (jax.checkpoint) so the backward pass
recomputes alphas instead of storing O(T * 256 * chunk) activations per step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatam_tpu.render.camera import Camera
from splatam_tpu.render.geometry import (
    ALPHA_CAP,
    ALPHA_MIN,
    MEDIAN_DEPTH_INIT,
    T_STOP,
    TILE,
    preprocess,
)
from splatam_tpu.render.binning import (
    RasterConfig,
    bin_gaussians,
    bin_gaussians_csr,
)
from splatam_tpu.render.reference import RenderOutput


class RenderAux(NamedTuple):
    overflow: jax.Array  # () bool
    num_instances: jax.Array  # () int32
    # (num_tiles,) f32 per-tile saturation depth (+inf where the tile never
    # went fully opaque) — feed back to binning's ``depth_cap`` to trim the
    # next rebin's instance stream. Pallas backend only (None on jnp path).
    sat_depth: jax.Array | None = None


def _tile_pixel_coords(cam: Camera):
    """Global (x, y) pixel coordinates per (tile, pixel-in-tile)."""
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    t = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    tx, ty = t % grid_x, t // grid_x
    p = jnp.arange(TILE * TILE, dtype=jnp.int32)
    lx, ly = p % TILE, p // TILE
    px = tx[:, None] * TILE + lx[None, :]
    py = ty[:, None] * TILE + ly[None, :]
    return px.astype(jnp.float32), py.astype(jnp.float32), grid_x, grid_y


def rasterize_tiled(
    means3d: jax.Array,
    colors: jax.Array | None,
    opacities: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    cam: Camera,
    cfg: RasterConfig = RasterConfig(),
    active: jax.Array | None = None,
    means2d_dummy: jax.Array | None = None,
    binned=None,
    shs: jax.Array | None = None,
    sh_degree: int = 0,
) -> tuple[RenderOutput, RenderAux]:
    """Render RGB (or arbitrary 3-channel features) + median depth.

    ``shs`` ((N, K, 3) spherical-harmonics coefficients, K >= (deg+1)^2)
    replaces or prepends to ``colors``: view-dependent RGB is evaluated per
    Gaussian at ``cam.campos`` before binning, matching the reference's
    shs-xor-colors_precomp contract (`__init__.py:170-187`,
    `forward.cu:20-71`). Pass ``colors=None`` with shs for a pure SH render,
    or extra feature channels in ``colors`` to blend alongside.

    ``binned`` optionally reuses a precomputed BinnedCSR (pallas backend
    only): during tracking the pose moves millimeters per iteration, so the
    tile assignment and depth order can be frozen per frame while the blend
    geometry stays exact — see slam/tracking.py `fixed_binning`.

    ``means2d_dummy`` is an all-zeros (N, 2) array in NDC units whose gradient
    equals the reference's returned dL/dmeans2D (`backward.cu:705-709` NDC
    scaling) — used by Inria-style densification thresholds.

    ``colors`` may have any number F of feature channels (N, F) — e.g. 6 for
    a fused RGB + depth/silhouette pass; the first 3 background channels come
    from ``cam.bg``, extras blend against 0.
    """
    opacities = opacities.reshape(-1)
    if shs is not None:
        from splatam_tpu.render.sh import eval_sh

        sh_rgb = eval_sh(sh_degree, shs, means3d, cam.campos)
        colors = (
            sh_rgb if colors is None
            else jnp.concatenate([sh_rgb, colors], axis=-1)
        )
    nfeat = colors.shape[-1]
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "pallas" and cfg.shard_axis is None:
        res, aux, proj = rasterize_tiled_blocks(
            means3d, colors, opacities, scales, rotations, cam, cfg,
            active=active, means2d_dummy=means2d_dummy, binned=binned,
        )
        grid_x = (cam.image_width + TILE - 1) // TILE
        grid_y = (cam.image_height + TILE - 1) // TILE
        return _assemble_image(res, aux, proj, colors.shape[-1], cam, grid_x, grid_y)

    proj = preprocess(means3d, scales, rotations, cam, active=active)
    proj_ng = jax.tree.map(jax.lax.stop_gradient, proj)

    blend_xy = proj.means2d
    if means2d_dummy is not None:
        scale_ndc = jnp.array(
            [0.5 * cam.image_width, 0.5 * cam.image_height], dtype=jnp.float32
        )
        blend_xy = blend_xy + means2d_dummy * scale_ndc

    px, py, grid_x, grid_y = _tile_pixel_coords(cam)
    num_tiles = grid_x * grid_y
    npix = TILE * TILE

    binned = bin_gaussians(proj_ng, cam, cfg, opacities=opacities)

    def chunk_body(carry, idx_chunk):
        t_run, dead, color_acc, depth_acc = carry
        empty = idx_chunk < 0
        g = jnp.maximum(idx_chunk, 0)

        xy = blend_xy[g]  # (T, C, 2)
        con = proj.conic[g]  # (T, C, 3)
        op = opacities[g]  # (T, C)
        col = colors[g]  # (T, C, 3)
        dep = proj.depths[g]  # (T, C)

        dx = xy[..., 0][:, None, :] - px[:, :, None]  # (T, P, C)
        dy = xy[..., 1][:, None, :] - py[:, :, None]
        a = con[..., 0][:, None, :]
        b = con[..., 1][:, None, :]
        c = con[..., 2][:, None, :]
        # power clamped to <= 0 (not dropped when > 0): see reference.py —
        # identical for PD conics, robust to matmul-evaluated power noise
        power = jnp.minimum(
            -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy, 0.0
        )
        alpha = jnp.minimum(ALPHA_CAP, op[:, None, :] * jnp.exp(power))
        alpha = jnp.where(
            (alpha < ALPHA_MIN) | empty[:, None, :], 0.0, alpha
        )

        one_minus = 1.0 - alpha
        t_cum = t_run[..., None] * jnp.cumprod(one_minus, axis=-1)  # (T, P, C)
        t_before = jnp.concatenate([t_run[..., None], t_cum[..., :-1]], axis=-1)
        live = (t_cum >= T_STOP) & ~dead[..., None]

        w = alpha * t_before * live
        color_acc = color_acc + jnp.einsum(
            "tpc,tcf->tpf", w, col, precision=jax.lax.Precision.HIGHEST
        )
        crossing = (t_before > 0.5) & (t_cum < 0.5) & live
        depth_acc = depth_acc + jnp.sum(
            jnp.where(crossing, dep[:, None, :], 0.0), axis=-1
        )

        t_run = t_run * jnp.prod(jnp.where(live, one_minus, 1.0), axis=-1)
        dead = dead | (t_cum[..., -1] < T_STOP)
        return (t_run, dead, color_acc, depth_acc), None

    carry0 = (
        jnp.ones((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.bool_),
        jnp.zeros((num_tiles, npix, nfeat), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
    )
    idx_chunks = binned.bucket.reshape(num_tiles, cfg.num_chunks, cfg.chunk)
    idx_chunks = jnp.moveaxis(idx_chunks, 1, 0)  # (num_chunks, T, C)
    if cfg.shard_axis is not None:
        # Tile data-parallelism: partition the compositing over devices; the
        # per-Gaussian gather stays replicated, and GSPMD inserts the psum
        # over parameter gradients in the backward pass.
        from jax.sharding import PartitionSpec as P

        idx_chunks = jax.lax.with_sharding_constraint(
            idx_chunks, P(None, cfg.shard_axis, None)
        )
        carry0 = (
            jax.lax.with_sharding_constraint(carry0[0], P(cfg.shard_axis)),
            jax.lax.with_sharding_constraint(carry0[1], P(cfg.shard_axis)),
            jax.lax.with_sharding_constraint(carry0[2], P(cfg.shard_axis)),
            jax.lax.with_sharding_constraint(carry0[3], P(cfg.shard_axis)),
        )
    (t_final, _, color_acc, depth_acc), _ = jax.lax.scan(
        jax.checkpoint(chunk_body), carry0, idx_chunks
    )

    bg = cam.bg
    if nfeat != bg.shape[0]:
        bg = jnp.concatenate([bg, jnp.zeros(nfeat - bg.shape[0], bg.dtype)])[:nfeat]
    color_acc = color_acc + t_final[..., None] * bg[None, None, :]
    depth_acc = jnp.where(depth_acc > 0.0, depth_acc, MEDIAN_DEPTH_INIT)

    def to_image(tiles_flat, channels=None):
        if channels is None:
            img = tiles_flat.reshape(grid_y, grid_x, TILE, TILE)
            img = img.transpose(0, 2, 1, 3).reshape(grid_y * TILE, grid_x * TILE)
            return img[: cam.image_height, : cam.image_width]
        img = tiles_flat.reshape(grid_y, grid_x, TILE, TILE, channels)
        img = img.transpose(4, 0, 2, 1, 3).reshape(
            channels, grid_y * TILE, grid_x * TILE
        )
        return img[:, : cam.image_height, : cam.image_width]

    out = RenderOutput(
        color=to_image(color_acc, nfeat),
        radius=proj.radius,
        depth=to_image(depth_acc)[None],
        final_t=to_image(t_final),
    )
    aux = RenderAux(overflow=binned.overflow, num_instances=binned.num_instances)
    return out, aux


def _tiles_to_image(tiles_flat, grid_x, grid_y, cam, channels=None):
    if channels is None:
        img = tiles_flat.reshape(grid_y, grid_x, TILE, TILE)
        img = img.transpose(0, 2, 1, 3).reshape(grid_y * TILE, grid_x * TILE)
        return img[: cam.image_height, : cam.image_width]
    img = tiles_flat.reshape(grid_y, grid_x, TILE, TILE, channels)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        channels, grid_y * TILE, grid_x * TILE
    )
    return img[:, : cam.image_height, : cam.image_width]


def _blocks_to_image(blocks, grid_x, grid_y, cam):
    """(T, C, 256) channel-major tile blocks -> (C, H, W) image."""
    c = blocks.shape[1]
    img = blocks.reshape(grid_y, grid_x, c, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(c, grid_y * TILE, grid_x * TILE)
    return img[:, : cam.image_height, : cam.image_width]


def image_to_blocks(img: jax.Array, cam: Camera) -> jax.Array:
    """(C, H, W) image -> (T, C, 256) channel-major tile blocks (zero-padded).

    The inverse of _blocks_to_image; used to bring GROUND-TRUTH frames into
    tile layout so losses can run tile-space (core/losses.py). Constant
    inputs pay this shuffle once with no AD transpose — the rendered side
    then never round-trips through image layout at all.
    """
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    c = img.shape[0]
    pad_h = grid_y * TILE - img.shape[1]
    pad_w = grid_x * TILE - img.shape[2]
    img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w)))
    img = img.reshape(c, grid_y, TILE, grid_x, TILE)
    return img.transpose(1, 3, 0, 2, 4).reshape(grid_y * grid_x, c, TILE * TILE)


def valid_pixel_blocks(cam: Camera) -> jax.Array:
    """(T, 256) f32 1/0 mask of tile-block pixels inside the image bounds."""
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    t = jnp.arange(grid_y * grid_x, dtype=jnp.int32)
    p = jnp.arange(TILE * TILE, dtype=jnp.int32)
    px = (t % grid_x)[:, None] * TILE + (p % TILE)[None, :]
    py = (t // grid_x)[:, None] * TILE + (p // TILE)[None, :]
    return ((px < cam.image_width) & (py < cam.image_height)).astype(
        jnp.float32
    )


def rasterize_tiled_blocks(
    means3d: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    cam: Camera,
    cfg: RasterConfig = RasterConfig(),
    active: jax.Array | None = None,
    means2d_dummy: jax.Array | None = None,
    binned=None,
    grad_feats: int | None = None,
    carry_depth_grad: bool = True,
):
    """Pallas render returning raw CHANNEL-MAJOR tile blocks (no image).

    ``grad_feats`` / ``carry_depth_grad`` narrow the gradient rows carried
    through the instance->gaussian reduction — legal ONLY when the caller's
    loss provably has zero cotangents for the dropped channels (see
    rasterize_tiles_pallas). ``carry_depth_grad=False`` additionally ZEROES
    the median-depth primal (res.aux row 0) and skips its per-pair math in
    the kernels — callers under that flag must not read aux row 0 (the SLAM
    losses use the blended depth channel and aux rows 1/2 only).

    Returns (res: PallasRasterOut, aux: RenderAux, proj). The custom-vjp
    boundary sits at the blocks, so a loss computed in tile layout
    backpropagates straight into the kernels with zero tiles<->image
    shuffles (each full 8-channel shuffle + its AD transpose costs ~26 MB of
    HBM traffic at SLAM resolution). `rasterize_tiled` (image API) wraps
    this; `core/losses.py slam_loss` consumes it directly.
    """
    from splatam_tpu.render.binning import bin_gaussians_csr
    from splatam_tpu.render.pallas_raster import (
        SAT_INF,
        pack_attrs,
        rasterize_tiles_pallas,
    )

    opacities = opacities.reshape(-1)
    if cfg.chunk % 128 != 0:
        raise ValueError("pallas backend needs chunk % 128 == 0")
    proj = preprocess(means3d, scales, rotations, cam, active=active)
    proj_ng = jax.tree.map(jax.lax.stop_gradient, proj)
    blend_xy = proj.means2d
    if means2d_dummy is not None:
        scale_ndc = jnp.array(
            [0.5 * cam.image_width, 0.5 * cam.image_height], dtype=jnp.float32
        )
        blend_xy = blend_xy + means2d_dummy * scale_ndc
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    if binned is None:
        binned = bin_gaussians_csr(proj_ng, cam, cfg, opacities=opacities)
    nfeat = colors.shape[-1]
    attrs = pack_attrs(blend_xy, proj.conic, opacities, proj.depths, colors)
    res = rasterize_tiles_pallas(
        attrs, binned, grid_x * grid_y, grid_x, cfg.chunk,
        nfeat=nfeat if grad_feats is None else grad_feats,
        reduction=cfg.reduction, scan_impl=cfg.scan_impl,
        carry_depth=carry_depth_grad,
    )
    sat_raw = jax.lax.stop_gradient(res.aux[:, 2, 0])
    aux = RenderAux(
        overflow=binned.overflow,
        num_instances=binned.num_instances,
        sat_depth=jnp.where(sat_raw < SAT_INF, sat_raw, jnp.inf),
    )
    return res, aux, proj


def _assemble_image(
    res, aux, proj, nfeat, cam, grid_x, grid_y
) -> tuple[RenderOutput, RenderAux]:
    """Raw pallas tile blocks -> image-layout RenderOutput.

    Converts the full 8-channel blocks to image layout FIRST and does all
    channel slicing / bg compose / masking there: the kernels emit
    channel-major (T, 8, NPIX) blocks (PallasRasterOut), so both the
    reshuffle and per-channel slices are lane-dense. Loss paths that don't
    need images at all should consume `rasterize_tiled_blocks` directly.
    """
    color_img = _blocks_to_image(res.color, grid_x, grid_y, cam)
    aux_img = _blocks_to_image(res.aux, grid_x, grid_y, cam)
    final_t = aux_img[1]

    bg = cam.bg
    if nfeat != bg.shape[0]:
        bg = jnp.concatenate([bg, jnp.zeros(nfeat - bg.shape[0], bg.dtype)])[:nfeat]
    color_out = color_img[:nfeat] + final_t[None] * bg[:, None, None]
    depth_out = jnp.where(aux_img[0] > 0.0, aux_img[0], MEDIAN_DEPTH_INIT)

    out = RenderOutput(
        color=color_out,
        radius=proj.radius,
        depth=depth_out[None],
        final_t=final_t,
    )
    return out, aux
