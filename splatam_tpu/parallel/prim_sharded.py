"""Gaussian-primitive sharding: parameters, preprocess and optimizer state
sharded over chips; only compact culled records ride the ICI.

The TP analog SURVEY.md §2.3 item 2 calls for (the reference is single-GPU
and has no equivalent). Each chip on a 1-D mesh axis:

  * owns 1/n of the Gaussian parameter arrays (and therefore 1/n of the
    Adam moments and 1/n of the per-Gaussian preprocess compute:
    transform_to_frame, covariance, projection, culling);
  * packs its survivors into COMPACT render records — the 16 pack_attrs
    rows (means2d, conic, opacity, depth, global gid, features) plus the
    5-int binning rect — and `all_gather`s only those to every chip
    (~21 f32+int per Gaussian vs ~12 f32 params + ~24 f32 Adam moments
    that full replication would copy/hold, and none of the preprocess);
  * owns a contiguous band of image tile rows and bins/rasterizes the
    gathered records for its band exactly like
    parallel/pallas_sharded.rasterize_rows_sharded.

Backward is automatic: shard_map's transpose turns the record all_gather
into a psum_scatter, so every chip receives exactly the gradient slice for
ITS parameter shard — per-Gaussian gradients, moments and the update never
materialize unsharded anywhere. tests/test_prim_sharded.py checks the
render and the parameter-shard gradients against the single-device path on
a virtual 8-device CPU mesh.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from splatam_tpu.core.transforms import normalize, transform_to_frame
from splatam_tpu.parallel.pallas_sharded import _local_band
from splatam_tpu.render.binning import RasterConfig, bin_gaussians_csr
from splatam_tpu.render.camera import Camera
from splatam_tpu.render.geometry import (
    MEDIAN_DEPTH_INIT,
    TILE,
    Projected,
    preprocess,
)
from splatam_tpu.render.pallas_raster import (
    ROW_GID,
    pack_attrs,
    rasterize_tiles_pallas,
)
from splatam_tpu.render.render_tiled import RenderAux, RenderOutput


def render_prim_sharded(
    params: dict,
    active: jax.Array,
    cam_rot: jax.Array,
    cam_tran: jax.Array,
    cam: Camera,
    cfg: RasterConfig,
    mesh,
    axis_name: str = "prims",
) -> tuple[RenderOutput, RenderAux]:
    """Fused 6-channel render with ``params`` sharded over ``axis_name``.

    ``params`` is the Gaussian dict (means3D, rgb_colors, unnorm_rotations,
    logit_opacities, log_scales); capacity must divide the axis size.
    Differentiable w.r.t. params and the pose: parameter grads come back
    SHARDED (each chip holds its slice), pose grads replicated.
    """
    ndev = mesh.shape[axis_name]
    n = params["means3D"].shape[0]
    assert n % ndev == 0, f"capacity {n} must divide mesh axis {ndev}"
    nloc = n // ndev
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    gyl = (grid_y + ndev - 1) // ndev
    num_tiles_local = grid_x * gyl
    cfg_local = dataclasses.replace(
        cfg, max_instances=max(cfg.max_instances // ndev, 4 * cfg.chunk),
        shard_axis=None,
    )
    iso = params["log_scales"].shape[1] == 1
    nfeat = 6

    def per_device(m3, col, qrot, lop, lsc, a, rot, tran, vm, pm, cp, bg):
        idx = jax.lax.axis_index(axis_name)
        cam_glob = dataclasses.replace(
            cam, viewmatrix=vm, projmatrix=pm, campos=cp, bg=bg
        )
        cam_band = dataclasses.replace(cam_glob, image_height=gyl * TILE)

        # --- per-shard preprocess (1/n of the per-Gaussian work) ---
        log_scales = jnp.tile(lsc, (1, 3)) if iso else lsc
        pts, rots, _ = transform_to_frame(
            m3, qrot, rot, tran, transform_rots=not iso,
            gaussians_grad=True, camera_grad=True,
        )
        proj = preprocess(
            pts, jnp.exp(log_scales), normalize(rots), cam_glob, active=a
        )
        z = (
            jnp.matmul(pts, vm[2, :3], precision=jax.lax.Precision.HIGHEST)
            + vm[2, 3]
        )
        feats = jnp.concatenate(
            [col, jnp.stack([z, jnp.ones_like(z), z * z], axis=-1)], axis=-1
        )
        opac = jax.nn.sigmoid(lop).reshape(-1)
        attrs = pack_attrs(
            proj.means2d, proj.conic, opac, proj.depths, feats
        )  # (nloc, 16) with LOCAL gid in ROW_GID
        # global gaussian ids so the gradient reduction keys stay unique
        attrs = attrs.at[:, ROW_GID].add((idx * nloc).astype(jnp.float32))

        # --- compact culled records to every tile-band owner (ICI) ---
        attrs_all = jax.lax.all_gather(attrs, axis_name, tiled=True)
        rect_all = jax.lax.all_gather(
            jnp.concatenate(
                [
                    proj.rect_min,
                    proj.rect_max,
                    proj.tiles_touched[:, None],
                ],
                axis=-1,
            ),
            axis_name,
            tiled=True,
        )  # (n, 5) int32

        proj_all = Projected(
            means2d=jnp.zeros((n, 2), jnp.float32),  # binning never reads
            depths=attrs_all[:, 6],
            conic=jnp.zeros((n, 3), jnp.float32),
            radius=jnp.zeros((n,), jnp.int32),
            rect_min=rect_all[:, 0:2],
            rect_max=rect_all[:, 2:4],
            tiles_touched=rect_all[:, 4],
        )
        ty0 = idx * gyl
        local = _local_band(proj_all, None, ty0, gyl)
        binned = bin_gaussians_csr(
            jax.tree.map(jax.lax.stop_gradient, local), cam_band, cfg_local
        )

        shift = jnp.zeros((1, attrs_all.shape[1]), jnp.float32).at[0, 1].set(
            (ty0 * TILE).astype(jnp.float32)
        )
        res = rasterize_tiles_pallas(
            attrs_all - shift, binned, num_tiles_local, grid_x, cfg.chunk,
            nfeat=nfeat,
        )

        bg_full = jnp.concatenate([bg, jnp.zeros(nfeat - bg.shape[0], bg.dtype)])

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
        color_out = (
            color_img[:nfeat] + final_t[None] * bg_full[:nfeat, None, None]
        )
        depth_out = jnp.where(aux_img[0] > 0.0, aux_img[0], MEDIAN_DEPTH_INIT)

        overflow = jax.lax.pmax(
            binned.overflow.astype(jnp.int32), axis_name
        ).astype(bool)
        num_instances = jax.lax.psum(binned.num_instances, axis_name)
        return (
            color_out,
            depth_out[None],
            final_t,
            proj.radius,  # SHARDED per-gaussian radius
            overflow,
            num_instances,
        )

    specs_in = (
        P(axis_name), P(axis_name), P(axis_name), P(axis_name), P(axis_name),
        P(axis_name), P(), P(), P(), P(), P(), P(),
    )
    specs_out = (
        P(None, axis_name, None),  # color rows band-sharded
        P(None, axis_name, None),
        P(axis_name, None),
        P(axis_name),  # radius sharded like the params
        P(),
        P(),
    )
    color, depth, final_t, radius, overflow, num_instances = jax.shard_map(
        per_device, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
        check_vma=False,
    )(
        params["means3D"], params["rgb_colors"], params["unnorm_rotations"],
        params["logit_opacities"], params["log_scales"], active,
        cam_rot, cam_tran, cam.viewmatrix, cam.projmatrix, cam.campos, cam.bg,
    )
    color = color[:, : cam.image_height, :]
    depth = depth[:, : cam.image_height, :]
    final_t = final_t[: cam.image_height, :]
    out = RenderOutput(color=color, radius=radius, depth=depth, final_t=final_t)
    aux = RenderAux(overflow=overflow, num_instances=num_instances)
    return out, aux


def gathered_bytes_per_gaussian() -> dict:
    """The communication note SURVEY §2.3 asks for: per-Gaussian bytes that
    ride the ICI all_gather vs what full replication would hold per chip."""
    record = 16 * 4 + 5 * 4  # pack_attrs rows + rect/touched ints
    replicated = (3 + 3 + 4 + 1 + 3) * 4  # params (aniso)
    moments = 2 * replicated  # Adam mu/nu
    return {
        "gathered_record_bytes": record,
        "replicated_param_bytes": replicated,
        "replicated_param_plus_opt_bytes": replicated + moments,
    }
