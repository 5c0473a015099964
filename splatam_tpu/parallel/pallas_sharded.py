"""Multi-chip Pallas rendering: image tile-rows sharded over a mesh axis.

The scaling design SURVEY.md §2.3 calls for (the reference is single-GPU):
every chip holds a replicated view of the Gaussian arrays, owns a contiguous
band of tile rows, bins ONLY the instances intersecting its band (rect
clipping before expansion, so the instance stream and the Pallas chunk grid
shrink ~1/n per chip), and rasterizes its band with the same flat-chunk-grid
kernels. Parameter gradients flow back through the replicated inputs and are
all-reduced over ICI by shard_map's transpose — the multi-chip analog of the
atomics-free segment-sum.

Differentiable end to end: wrap in jax.grad inside or outside shard_map.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from splatam_tpu.render.binning import RasterConfig, bin_gaussians_csr
from splatam_tpu.render.camera import Camera
from splatam_tpu.render.geometry import TILE, preprocess
from splatam_tpu.render.pallas_raster import (
    pack_attrs,
    rasterize_tiles_pallas,
)
from splatam_tpu.render.render_tiled import RenderAux, RenderOutput
from splatam_tpu.render.geometry import MEDIAN_DEPTH_INIT


def _local_band(proj, active, ty0: int, gyl: int):
    """Clip per-gaussian tile rects to this device's tile-row band and
    recount tiles_touched; shift rect rows AND means2d into band-local
    coordinates (binning's tile-alpha cull compares means2d against tile
    pixel boxes, so both must live in the same frame)."""
    rm, rx = proj.rect_min, proj.rect_max
    ry0 = jnp.clip(rm[:, 1] - ty0, 0, gyl)
    ry1 = jnp.clip(rx[:, 1] - ty0, 0, gyl)
    touched = (rx[:, 0] - rm[:, 0]) * (ry1 - ry0)
    touched = jnp.where(proj.tiles_touched > 0, touched, 0)
    if active is not None:
        touched = jnp.where(active, touched, 0)
    shift = jnp.stack(
        [jnp.zeros((), jnp.float32), jnp.float32(ty0 * TILE)]
    )
    return proj._replace(
        means2d=proj.means2d - shift[None, :],
        rect_min=jnp.stack([rm[:, 0], ry0], axis=-1),
        rect_max=jnp.stack([rx[:, 0], ry1], axis=-1),
        tiles_touched=touched,
    )


def rasterize_rows_sharded(
    means3d: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    cam: Camera,
    cfg: RasterConfig,
    mesh,
    axis_name: str = "tiles",
    active: jax.Array | None = None,
) -> tuple[RenderOutput, RenderAux]:
    """Render with tile rows sharded over ``axis_name`` of ``mesh``.

    Returns the same RenderOutput as rasterize_tiled; color/depth/final_t
    come back row-sharded (NamedSharding over H) and can be consumed
    locally or gathered.
    """
    opacities = opacities.reshape(-1)
    nfeat = colors.shape[-1]
    ndev = mesh.shape[axis_name]
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    gyl = (grid_y + ndev - 1) // ndev  # tile rows per device
    cfg_local = dataclasses.replace(
        cfg, max_instances=max(cfg.max_instances // ndev, 4 * cfg.chunk),
        shard_axis=None,
    )
    num_tiles_local = grid_x * gyl

    if active is None:
        active = jnp.ones(means3d.shape[0], bool)

    def per_device(m, c, o, s, r, a, vm, pm, cp, bg):
        idx = jax.lax.axis_index(axis_name)
        # projection/culling uses the GLOBAL camera (pixel coordinates and
        # rects are image-global); only binning sees the band-local grid
        cam_glob = dataclasses.replace(
            cam, viewmatrix=vm, projmatrix=pm, campos=cp, bg=bg
        )
        cam_band = dataclasses.replace(cam_glob, image_height=gyl * TILE)
        proj = preprocess(m, s, r, cam_glob, active=a)
        ty0 = idx * gyl
        local = _local_band(proj, None, ty0, gyl)
        local_ng = jax.tree.map(jax.lax.stop_gradient, local)
        binned = bin_gaussians_csr(local_ng, cam_band, cfg_local, opacities=o)

        # local.means2d is already band-local (see _local_band)
        attrs = pack_attrs(local.means2d, local.conic, o, local.depths, c)
        res = rasterize_tiles_pallas(
            attrs, binned, num_tiles_local, grid_x, cfg.chunk, nfeat=nfeat
        )

        bg_full = bg
        if nfeat != bg_full.shape[0]:
            bg_full = jnp.concatenate(
                [bg_full, jnp.zeros(nfeat - bg_full.shape[0], bg_full.dtype)]
            )[:nfeat]

        def to_image(blocks):  # (T, C, 256) channel-major, see PallasRasterOut
            channels = blocks.shape[1]
            img = blocks.reshape(gyl, grid_x, channels, TILE, TILE)
            return img.transpose(2, 0, 3, 1, 4).reshape(
                channels, gyl * TILE, grid_x * TILE
            )[:, :, : cam.image_width]

        # image layout first, channel slicing after (see PallasRasterOut)
        color_img = to_image(res.color)
        aux_img = to_image(res.aux)
        final_t = aux_img[1]
        color_out = color_img[:nfeat] + final_t[None] * bg_full[:, None, None]
        depth_out = jnp.where(aux_img[0] > 0.0, aux_img[0], MEDIAN_DEPTH_INIT)

        radius = proj.radius  # replicated (same on every device)
        overflow = jax.lax.pmax(
            binned.overflow.astype(jnp.int32), axis_name
        ).astype(bool)
        num_instances = jax.lax.psum(binned.num_instances, axis_name)
        return (
            color_out,
            depth_out[None],
            final_t,
            radius,
            overflow,
            num_instances,
        )

    specs_in = (P(), P(), P(), P(), P(), P(), P(), P(), P(), P())
    specs_out = (
        P(None, axis_name, None),  # color (F, H, W) rows sharded
        P(None, axis_name, None),  # depth (1, H, W)
        P(axis_name, None),  # final_t (H, W)
        P(),  # radius (replicated)
        P(),  # overflow
        P(),  # num_instances
    )
    color, depth, final_t, radius, overflow, num_instances = jax.shard_map(
        per_device, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
        check_vma=False,
    )(
        means3d, colors, opacities, scales, rotations, active,
        cam.viewmatrix, cam.projmatrix, cam.campos, cam.bg,
    )
    # strip tile-row padding
    color = color[:, : cam.image_height, :]
    depth = depth[:, : cam.image_height, :]
    final_t = final_t[: cam.image_height, :]
    out = RenderOutput(color=color, radius=radius, depth=depth, final_t=final_t)
    aux = RenderAux(overflow=overflow, num_instances=num_instances)
    return out, aux
