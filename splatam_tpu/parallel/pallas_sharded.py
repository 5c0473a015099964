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


def band_partition(row_loads, ndev: int):
    """Optimal contiguous partition of tile rows into ``ndev`` bands.

    Minimizes the max per-band load (classic linear-partition DP; grid_y is
    tiny so the exact O(ndev * grid_y^2) solve is free). Host-side, like
    `binning.alignment_order`'s rank: exactness of the render NEVER depends
    on the boundaries — stale loads only degrade balance. Returns an
    (ndev + 1,) int numpy array of tile-row boundaries (band d owns rows
    [b[d], b[d+1]); empty bands allowed).

    Replaces the round-3 equal-row-band split whose measured imbalance was
    1.643 with 2/8 bands at zero load (VERDICT r3 item 2 /
    MULTICHIP_r03.json tile_band_loads).
    """
    import numpy as np

    loads = np.asarray(row_loads, dtype=np.int64)
    g = loads.shape[0]
    pre = np.concatenate([[0], np.cumsum(loads)])
    inf = np.iinfo(np.int64).max
    dp = np.full((ndev + 1, g + 1), inf, dtype=np.int64)
    choice = np.zeros((ndev + 1, g + 1), dtype=np.int32)
    dp[0, 0] = 0
    for d in range(1, ndev + 1):
        for i in range(g + 1):
            # band d covers rows [j, i); cost = max(dp[d-1, j], load(j, i))
            j = np.arange(i + 1)
            cost = np.maximum(dp[d - 1, : i + 1], pre[i] - pre[: i + 1])
            best = int(np.argmin(cost))
            dp[d, i] = cost[best]
            choice[d, i] = j[best]
    bounds = [g]
    i = g
    for d in range(ndev, 0, -1):
        i = int(choice[d, i])
        bounds.append(i)
    return np.asarray(bounds[::-1], dtype=np.int32)


def row_loads_from_counts(counts, grid_x: int):
    """(grid_y,) per-tile-row instance loads from a binning's (T,) counts."""
    import numpy as np

    c = np.asarray(counts)
    return c.reshape(-1, grid_x).sum(axis=1)


def _axis_partition_minimax(band_loads, n: int):
    """Partition columns of ``band_loads`` (B, L) into ``n`` contiguous
    parts minimizing the max over (band, part) of the part's load within
    that band. Exact DP (everything here is tiny). Returns (n + 1,) bounds.
    """
    import numpy as np

    bl = np.asarray(band_loads, dtype=np.int64)
    b, g = bl.shape
    pre = np.concatenate([np.zeros((b, 1), np.int64), np.cumsum(bl, 1)], 1)
    inf = np.iinfo(np.int64).max
    dp = np.full((n + 1, g + 1), inf, dtype=np.int64)
    choice = np.zeros((n + 1, g + 1), dtype=np.int32)
    dp[0, 0] = 0
    for d in range(1, n + 1):
        for i in range(g + 1):
            cell = (pre[:, i : i + 1] - pre[:, : i + 1]).max(axis=0)  # (i+1,)
            cost = np.maximum(dp[d - 1, : i + 1], cell)
            best = int(np.argmin(cost))
            dp[d, i] = cost[best]
            choice[d, i] = best
    bounds = [g]
    i = g
    for d in range(n, 0, -1):
        i = int(choice[d, i])
        bounds.append(i)
    return np.asarray(bounds[::-1], dtype=np.int32)


def grid_partition(counts, grid_x: int, ndev: int):
    """2-D load-balanced tile partition over an (nr x nc) device grid.

    Searches every factorization nr * nc == ndev and both axis orders
    (rows-then-cols / cols-then-rows), each solved by exact minimax DP, and
    keeps the assignment with the smallest max cell load. Row-only bands
    quantize badly when grid_y is small relative to ndev (the round-3 scene
    has 12 tile rows for 8 devices — max/mean can't go below ~1.5); the
    second axis restores the balance headroom.

    Returns (row_bounds (nr+1,), col_bounds (nc+1,), cell_loads (nr, nc)).
    """
    import numpy as np

    loads = np.asarray(counts, dtype=np.int64).reshape(-1, grid_x)

    def cells(rb, cb):
        return np.array(
            [
                [
                    loads[rb[i] : rb[i + 1], cb[j] : cb[j + 1]].sum()
                    for j in range(len(cb) - 1)
                ]
                for i in range(len(rb) - 1)
            ]
        )

    best = None
    for nr in range(1, ndev + 1):
        if ndev % nr:
            continue
        nc = ndev // nr
        for order in ("rows_first", "cols_first"):
            if order == "rows_first":
                rb = band_partition(loads.sum(axis=1), nr)
                bands = np.stack(
                    [loads[rb[i] : rb[i + 1]].sum(axis=0) for i in range(nr)]
                )
                cb = _axis_partition_minimax(bands, nc)
            else:
                cb = band_partition(loads.sum(axis=0), nc)
                bands = np.stack(
                    [
                        loads[:, cb[j] : cb[j + 1]].sum(axis=1)
                        for j in range(nc)
                    ]
                )
                rb = _axis_partition_minimax(bands, nr)
            cl = cells(rb, cb)
            if best is None or cl.max() < best[2].max():
                best = (rb, cb, cl)
    return best


def _local_band(proj, active, ty0, gyl, tx0=None, gxl=None):
    """Clip per-gaussian tile rects to this device's tile band (rows, and
    columns too for a 2-D grid partition) and recount tiles_touched; shift
    rect indices AND means2d into band-local coordinates (binning's
    tile-alpha cull compares means2d against tile pixel boxes, so both must
    live in the same frame)."""
    rm, rx = proj.rect_min, proj.rect_max
    ry0 = jnp.clip(rm[:, 1] - ty0, 0, gyl)
    ry1 = jnp.clip(rx[:, 1] - ty0, 0, gyl)
    if tx0 is None:
        rx0, rx1 = rm[:, 0], rx[:, 0]
        sx = jnp.zeros((), jnp.float32)
    else:
        rx0 = jnp.clip(rm[:, 0] - tx0, 0, gxl)
        rx1 = jnp.clip(rx[:, 0] - tx0, 0, gxl)
        sx = (tx0 * TILE).astype(jnp.float32)
    touched = (rx1 - rx0) * (ry1 - ry0)
    touched = jnp.where(proj.tiles_touched > 0, touched, 0)
    if active is not None:
        touched = jnp.where(active, touched, 0)
    shift = jnp.stack([sx, (ty0 * TILE).astype(jnp.float32) * 1.0])
    return proj._replace(
        means2d=proj.means2d - shift[None, :],
        rect_min=jnp.stack([rx0, ry0], axis=-1),
        rect_max=jnp.stack([rx1, ry1], axis=-1),
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
    band_starts=None,
    col_starts=None,
    axis_name_x: str | None = None,
) -> tuple[RenderOutput, RenderAux]:
    """Render with tile rows sharded over ``axis_name`` of ``mesh``.

    Returns the same RenderOutput as rasterize_tiled; color/depth/final_t
    come back row-sharded (NamedSharding over H) and can be consumed
    locally or gathered.

    ``band_starts`` ((ndev + 1,) host int array from `band_partition`)
    assigns each device the tile rows [band_starts[d], band_starts[d + 1])
    instead of equal contiguous bands — load-balanced against per-row
    instance counts. Every device still compiles the same program over
    max(band height) tile rows (SPMD: one executable); short bands just run
    zero-lim init chunks for their padding rows, and the final image is
    reassembled with a constant row gather.

    ``col_starts`` + ``axis_name_x`` additionally split tile COLUMNS over a
    second mesh axis (a 2-D device grid from `grid_partition`) — row-only
    bands quantize badly when grid_y is small relative to the device count.
    """
    import numpy as np

    opacities = opacities.reshape(-1)
    nfeat = colors.shape[-1]
    ndev = mesh.shape[axis_name]
    ndev_x = mesh.shape[axis_name_x] if axis_name_x is not None else 1
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    if band_starts is not None:
        band_starts = np.asarray(band_starts, dtype=np.int32)
        assert band_starts.shape == (ndev + 1,)
        assert band_starts[0] == 0 and band_starts[-1] == grid_y
        gyl = max(int(np.diff(band_starts).max()), 1)  # static band height
    else:
        gyl = (grid_y + ndev - 1) // ndev  # tile rows per device
    if axis_name_x is not None:
        assert col_starts is not None, "2-D sharding needs col_starts"
        col_starts = np.asarray(col_starts, dtype=np.int32)
        assert col_starts.shape == (ndev_x + 1,)
        assert col_starts[0] == 0 and col_starts[-1] == grid_x
        gxl = max(int(np.diff(col_starts).max()), 1)  # static band width
    else:
        gxl = grid_x
    cfg_local = dataclasses.replace(
        cfg,
        max_instances=max(cfg.max_instances // (ndev * ndev_x), 4 * cfg.chunk),
        shard_axis=None,
    )
    num_tiles_local = gxl * gyl

    if active is None:
        active = jnp.ones(means3d.shape[0], bool)

    def per_device(m, c, o, s, r, a, vm, pm, cp, bg):
        idx = jax.lax.axis_index(axis_name)
        # projection/culling uses the GLOBAL camera (pixel coordinates and
        # rects are image-global); only binning sees the band-local grid
        cam_glob = dataclasses.replace(
            cam, viewmatrix=vm, projmatrix=pm, campos=cp, bg=bg
        )
        cam_band = dataclasses.replace(
            cam_glob, image_height=gyl * TILE, image_width=gxl * TILE
        )
        proj = preprocess(m, s, r, cam_glob, active=a)
        if band_starts is not None:
            bs = jnp.asarray(band_starts)
            ty0 = bs[idx]
            h_d = bs[idx + 1] - ty0  # this band's true height (traced)
        else:
            ty0 = idx * gyl
            h_d = gyl
        if axis_name_x is not None:
            idx_x = jax.lax.axis_index(axis_name_x)
            cs = jnp.asarray(col_starts)
            tx0 = cs[idx_x]
            w_d = cs[idx_x + 1] - tx0
            local = _local_band(proj, None, ty0, h_d, tx0, w_d)
        else:
            local = _local_band(proj, None, ty0, h_d)
        local_ng = jax.tree.map(jax.lax.stop_gradient, local)
        binned = bin_gaussians_csr(local_ng, cam_band, cfg_local, opacities=o)

        # local.means2d is already band-local (see _local_band)
        attrs = pack_attrs(local.means2d, local.conic, o, local.depths, c)
        res = rasterize_tiles_pallas(
            attrs, binned, num_tiles_local, gxl, cfg.chunk, nfeat=nfeat
        )

        bg_full = bg
        if nfeat != bg_full.shape[0]:
            bg_full = jnp.concatenate(
                [bg_full, jnp.zeros(nfeat - bg_full.shape[0], bg_full.dtype)]
            )[:nfeat]

        def to_image(blocks):  # (T, C, 256) channel-major, see PallasRasterOut
            channels = blocks.shape[1]
            img = blocks.reshape(gyl, gxl, channels, TILE, TILE)
            img = img.transpose(2, 0, 3, 1, 4).reshape(
                channels, gyl * TILE, gxl * TILE
            )
            if axis_name_x is None:
                img = img[:, :, : cam.image_width]
            return img

        # image layout first, channel slicing after (see PallasRasterOut)
        color_img = to_image(res.color)
        aux_img = to_image(res.aux)
        final_t = aux_img[1]
        color_out = color_img[:nfeat] + final_t[None] * bg_full[:, None, None]
        depth_out = jnp.where(aux_img[0] > 0.0, aux_img[0], MEDIAN_DEPTH_INIT)

        radius = proj.radius  # replicated (same on every device)
        axes = (
            axis_name if axis_name_x is None else (axis_name, axis_name_x)
        )
        overflow = jax.lax.pmax(
            binned.overflow.astype(jnp.int32), axes
        ).astype(bool)
        num_instances = jax.lax.psum(binned.num_instances, axes)
        return (
            color_out,
            depth_out[None],
            final_t,
            radius,
            overflow,
            num_instances,
        )

    specs_in = (P(), P(), P(), P(), P(), P(), P(), P(), P(), P())
    ax = axis_name_x  # None => W unsharded
    specs_out = (
        P(None, axis_name, ax),  # color (F, H, W) rows (and cols) sharded
        P(None, axis_name, ax),  # depth (1, H, W)
        P(axis_name, ax),  # final_t (H, W)
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
    def _src(starts, size, band):
        # constant gather indices: band d's pixels live at
        # [d * band * TILE, ...) of the padded stack along that axis
        r = np.arange(size)
        tr = r // TILE
        d = np.searchsorted(starts, tr, side="right") - 1
        return jnp.asarray(
            (d * band * TILE + (r - starts[d] * TILE)).astype(np.int32)
        )

    if band_starts is not None:
        src = _src(band_starts, cam.image_height, gyl)
        color = jnp.take(color, src, axis=1)
        depth = jnp.take(depth, src, axis=1)
        final_t = jnp.take(final_t, src, axis=0)
    else:
        # strip tile-row padding
        color = color[:, : cam.image_height, :]
        depth = depth[:, : cam.image_height, :]
        final_t = final_t[: cam.image_height, :]
    if axis_name_x is not None:
        srcx = _src(col_starts, cam.image_width, gxl)
        color = jnp.take(color, srcx, axis=2)
        depth = jnp.take(depth, srcx, axis=2)
        final_t = jnp.take(final_t, srcx, axis=1)
    out = RenderOutput(color=color, radius=radius, depth=depth, final_t=final_t)
    aux = RenderAux(overflow=overflow, num_instances=num_instances)
    return out, aux
