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
    # Unused since the aligned-window layout (chunk capacity is now exactly
    # max_instances/chunk + num_tiles and cannot overflow); kept so configs
    # that set it keep loading.
    pad_slack: float = 0.65
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


class BinnedCSR(NamedTuple):
    """Depth-sorted instance stream with chunk-ALIGNED window descriptors.

    Feeds the flat-chunk-grid Pallas kernels (pallas_raster.py): one Pallas
    grid step processes one (tile, chunk) pair. A tile's windows start at
    its segment start rounded DOWN to a chunk boundary, so every window is
    an aligned block of the SORTED stream and the kernels read it through a
    plain scalar-prefetched BlockSpec index map (``chunk_blk``) — no padded
    stream is ever materialized (its element gather costs ~6.5 ms at 1M
    instances on TPU: gathers are per-index bound). The up-to-chunk-1
    foreign rows at the head of a tile's first window (they belong to the
    previous tile) are masked by the per-chunk ``skip``; this wastes the
    same average chunk/2 slots per tile the old chunk-padding did, but as
    masked compute instead of gathered memory traffic.
    """

    sorted_gid: jax.Array  # (K,) int32 gaussian id per depth-sorted instance
    chunk_blk: jax.Array  # (NC,) int32 aligned block index of each chunk
    chunk_meta: jax.Array  # (NC,) int32 packed: tile << 1 | first
    chunk_lim: jax.Array  # (NC,) int32 packed: skip << 16 | lim; valid rows
    # of the window are [skip, lim)
    counts: jax.Array  # (T,) int32 instances per tile
    gid_hist: jax.Array  # (N,) int32 = tiles_touched: exact per-gaussian
    # valid-instance count, giving the gradient reduction its segment
    # boundaries analytically (no scatter-add histogram)
    num_instances: jax.Array  # () int32 total instances emitted
    padded_total: jax.Array  # () int32 windowed stream length (used chunks)
    overflow: jax.Array  # () bool: instance buffer overflowed


def sized_config(
    num_instances: int,
    base: RasterConfig = RasterConfig(),
    margin: float = 1.1,
) -> RasterConfig:
    """Pre-size ``max_instances`` from a measured (gaussian, tile) pair count.

    Sort, gather, and kernel-grid costs all scale with the instance-stream
    capacity, so snug buffers directly buy throughput (~15% at SLAM scale vs
    a 2^20 default at 780k instances). Like the SLAM driver's ``map_capacity``
    pre-sizing knob, this is an optimization only — the overflow flag still
    triggers a bigger re-run if the scene outgrows the estimate.
    """
    k = int(num_instances * margin) + base.chunk
    k = ((k + base.chunk - 1) // base.chunk) * base.chunk
    return dataclasses.replace(base, max_instances=k)


def _expand_instances(proj: Projected, cam: Camera, cfg: RasterConfig):
    """Instance expansion + (tile, depth) sort shared by both layouts.

    Replaces cub InclusiveSum + duplicateWithKeys + radix sort
    (`rasterizer_impl.cu:33-339`). jnp.repeat is the fast path on TPU —
    jnp.searchsorted's default 'scan' method lowers to a while-loop that
    costs ~300ms at this size.
    """
    n = proj.tiles_touched.shape[0]
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE
    num_tiles = grid_x * grid_y
    k = cfg.max_instances

    tiles_touched = proj.tiles_touched
    offsets = jnp.cumsum(tiles_touched)  # inclusive prefix sum
    total = offsets[-1]
    starts = offsets - tiles_touched

    slot = jnp.arange(k, dtype=jnp.int32)
    # gid = repeat(arange(n), tiles_touched) via scatter + cumsum: empty
    # groups collide on the same start slot, so the cumsum skips them.
    # jnp.repeat lowers to an extra 1-D int gather (~6 ms at this size on
    # TPU — 1-D int gathers hit a scalar path); this form is cumsum-bound.
    ind = jnp.zeros(k, jnp.int32).at[starts].add(1, mode="drop")
    in_use = slot < total
    gid_safe = jnp.clip(jnp.cumsum(ind) - 1, 0, n - 1)

    # One ROW gather instead of six column gathers: TPU gathers whole rows
    # ~30x faster than repeated single-column gathers at this size. Depth
    # rides along bitcast to int32 (IEEE f32 order-preserving for z > 0).
    gtable = jnp.stack(
        [
            starts,
            proj.rect_min[:, 0],
            proj.rect_min[:, 1],
            jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 1),
            jax.lax.bitcast_convert_type(proj.depths, jnp.int32),
        ],
        axis=-1,
    )  # (N, 5) int32
    grow = gtable[gid_safe]  # (K, 5)
    local = slot - grow[:, 0]
    rect_w_safe = grow[:, 3]
    ty = grow[:, 2] + local // rect_w_safe
    tx = grow[:, 1] + local % rect_w_safe
    tile_id = jnp.where(in_use, ty * grid_x + tx, num_tiles)

    # Sort by (tile, depth); stable => ties keep gaussian/rect emission order,
    # matching the radix sort of `rasterizer_impl.cu:301-309`.
    depth_key = jnp.where(
        in_use,
        jax.lax.bitcast_convert_type(grow[:, 4], jnp.float32),
        jnp.inf,
    )
    sorted_tile, _, sorted_gid = jax.lax.sort(
        (tile_id.astype(jnp.int32), depth_key, gid_safe),
        num_keys=2,
        is_stable=True,
    )
    return sorted_tile, sorted_gid, tile_id, total, num_tiles


def bin_gaussians_csr(proj: Projected, cam: Camera, cfg: RasterConfig) -> BinnedCSR:
    """Chunk-aligned-window binning for the Pallas flat-chunk-grid kernels."""
    chunk = cfg.chunk
    sorted_tile, sorted_gid, tile_id, total, num_tiles = _expand_instances(
        proj, cam, cfg
    )
    k = cfg.max_instances
    # every non-empty tile adds at most one partially-foreign leading chunk,
    # so this static capacity can never overflow
    nc = k // chunk + num_tiles + 1

    # Per-tile ranges from the SORTED keys: a 3k-query searchsorted over the
    # sorted 1M array is cheap (binary-search scan on few queries), unlike a
    # 1M-element scatter-add histogram (~17ms).
    tq = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tq, side="left").astype(jnp.int32)
    counts = tile_start[1:] - tile_start[:-1]
    starts = tile_start[:-1]
    # window base = segment start rounded DOWN to a chunk boundary; the
    # first skip0 rows of the first window belong to the previous tile
    skip0 = starts % chunk
    aligned_blk = starts // chunk
    nchunks = jnp.where(counts > 0, (counts + skip0 + chunk - 1) // chunk, 0)
    chunk_off = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(nchunks)])
    used = chunk_off[-1]
    padded_total = used * chunk

    c_idx = jnp.arange(nc, dtype=jnp.int32)
    chunk_tile = jnp.repeat(
        jnp.arange(num_tiles, dtype=jnp.int32), nchunks, total_repeat_length=nc
    )
    # tail chunks (>= used) repeat the last tile id; lim = 0 there, so the
    # kernel skips them.
    in_use = c_idx < used
    local_chunk = c_idx - chunk_off[chunk_tile]
    blk = jnp.clip(aligned_blk[chunk_tile] + local_chunk, 0, k // chunk)
    skip = jnp.where(in_use & (local_chunk == 0), skip0[chunk_tile], 0)
    lim = jnp.clip(
        counts[chunk_tile] + skip0[chunk_tile] - local_chunk * chunk, 0, chunk
    )
    lim = jnp.where(in_use, lim, 0)
    prev_tile = jnp.concatenate([jnp.full(1, -1, jnp.int32), chunk_tile[:-1]])
    first = ((chunk_tile != prev_tile) & in_use).astype(jnp.int32)
    chunk_meta = (chunk_tile << 1) | first
    chunk_lim = (skip.astype(jnp.int32) << 16) | lim.astype(jnp.int32)
    gid_hist = proj.tiles_touched.astype(jnp.int32)

    return BinnedCSR(
        sorted_gid=sorted_gid,
        chunk_blk=blk,
        chunk_meta=chunk_meta,
        chunk_lim=chunk_lim,
        counts=counts,
        gid_hist=gid_hist,
        num_instances=total,
        padded_total=padded_total,
        overflow=total > k,
    )


def bin_gaussians(proj: Projected, cam: Camera, cfg: RasterConfig) -> Binned:
    sorted_tile, sorted_gid, tile_id, total, num_tiles = _expand_instances(
        proj, cam, cfg
    )
    k = cfg.max_instances

    # Per-tile ranges (identifyTileRanges analog) + bucket scatter. Counts by
    # histogram + exclusive-cumsum starts (no searchsorted, see above).
    counts = jnp.zeros(num_tiles + 1, jnp.int32).at[tile_id].add(1)[:num_tiles]
    tile_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)]
    )
    rank = jnp.arange(k, dtype=jnp.int32) - tile_start[jnp.minimum(sorted_tile, num_tiles)]
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
