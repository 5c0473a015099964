"""Tile binning with static shapes.

TPU-native replacement for the reference's dynamic cub pipeline
(`cuda_rasterizer/rasterizer_impl.cu:33-339`): InclusiveSum + duplicateWithKeys
+ radix sort + identifyTileRanges become cumsum + a vectorized
searchsorted-based instance expansion + a stable multi-key `jax.lax.sort` +
scatter into a capacity-padded per-tile bucket matrix.

XLA needs static shapes, so the variable-length instance stream is bounded by
``max_instances`` and each tile's list by ``max_per_tile``; overflow is
reported (never silently truncated without a flag) so callers can re-run at a
higher capacity (SURVEY.md §7 hard-part #1).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatam_tpu.render.camera import Camera
from splatam_tpu.render.geometry import TILE, Projected


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer capacities (hashable: safe as a jit static arg)."""

    max_instances: int = 2**20  # cap on total (gaussian, tile) pairs
    max_per_tile: int = 1024  # cap on instances per tile
    chunk: int = 128  # instances blended per scan step
    backend: str = "auto"  # 'jnp' | 'pallas' | 'auto'
    # Mesh axis name to shard image tiles over (the DP analog for this
    # workload, SURVEY.md §2.3). None = single device. Requires an ambient
    # mesh (jax.sharding.use_mesh) with this axis; GSPMD partitions the
    # compositing scan over tiles and all-reduces parameter grads over ICI.
    shard_axis: str | None = None

    @property
    def num_chunks(self) -> int:
        return (self.max_per_tile + self.chunk - 1) // self.chunk


class Binned(NamedTuple):
    """Per-tile depth-sorted instance lists (static shapes)."""

    bucket: jax.Array  # (T, max_per_tile) int32 gaussian ids, -1 = empty
    counts: jax.Array  # (T,) int32 instances per tile (pre-clamp)
    num_instances: jax.Array  # () int32 total instances emitted
    overflow: jax.Array  # () bool: instance buffer or a tile bucket overflowed


def bin_gaussians(proj: Projected, cam: Camera, cfg: RasterConfig) -> Binned:
    n = proj.tiles_touched.shape[0]
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    num_tiles = grid_x * grid_y
    k = cfg.max_instances

    tiles_touched = proj.tiles_touched
    offsets = jnp.cumsum(tiles_touched)  # inclusive prefix sum
    total = offsets[-1]
    starts = offsets - tiles_touched

    # Expand to instances: slot -> owning gaussian via prefix-sum inversion.
    slot = jnp.arange(k, dtype=jnp.int32)
    gid = jnp.searchsorted(offsets, slot, side="right").astype(jnp.int32)
    in_use = slot < total
    gid_safe = jnp.clip(gid, 0, n - 1)
    local = slot - starts[gid_safe]

    rect_w = proj.rect_max[gid_safe, 0] - proj.rect_min[gid_safe, 0]
    rect_w_safe = jnp.maximum(rect_w, 1)
    ty = proj.rect_min[gid_safe, 1] + local // rect_w_safe
    tx = proj.rect_min[gid_safe, 0] + local % rect_w_safe
    tile_id = jnp.where(in_use, ty * grid_x + tx, num_tiles)

    # Sort by (tile, depth); stable => ties keep gaussian/rect emission order,
    # matching the radix sort of `rasterizer_impl.cu:301-309`.
    depth_key = jnp.where(in_use, proj.depths[gid_safe], jnp.inf)
    sorted_tile, _, sorted_gid = jax.lax.sort(
        (tile_id.astype(jnp.int32), depth_key, gid_safe),
        num_keys=2,
        is_stable=True,
    )

    # Per-tile ranges (identifyTileRanges analog) + bucket scatter.
    tile_start = jnp.searchsorted(sorted_tile, jnp.arange(num_tiles, dtype=jnp.int32), side="left")
    tile_end = jnp.searchsorted(sorted_tile, jnp.arange(num_tiles, dtype=jnp.int32), side="right")
    counts = (tile_end - tile_start).astype(jnp.int32)

    rank = jnp.arange(k, dtype=jnp.int32) - tile_start[jnp.minimum(sorted_tile, num_tiles - 1)]
    write_ok = (sorted_tile < num_tiles) & (rank < cfg.max_per_tile)
    # out-of-range index for masked slots => the write is dropped
    flat_idx = jnp.where(
        write_ok,
        jnp.minimum(sorted_tile, num_tiles - 1) * cfg.max_per_tile + rank,
        num_tiles * cfg.max_per_tile,
    )
    bucket = jnp.full((num_tiles * cfg.max_per_tile,), -1, dtype=jnp.int32)
    bucket = bucket.at[flat_idx].set(sorted_gid, mode="drop")
    bucket = bucket.reshape(num_tiles, cfg.max_per_tile)

    overflow = (total > k) | (counts.max() > cfg.max_per_tile)
    return Binned(
        bucket=bucket, counts=counts, num_instances=total, overflow=overflow
    )
