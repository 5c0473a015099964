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
    # Fraction of tiles assumed to need chunk-alignment padding. Worst case
    # is 1.0 (every tile wastes up to chunk-1 slots); the expectation is 0.5.
    # Exceeding the budget sets the overflow flag (caller re-runs bigger).
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
    """Depth-sorted instance stream in chunk-aligned CSR layout.

    Feeds the flat-chunk-grid Pallas kernels (pallas_raster.py): each tile's
    instance segment starts at a multiple of ``chunk`` in the padded stream,
    so one Pallas grid step processes exactly one (tile, chunk) pair with no
    per-tile capacity padding and no bucket scatter (row scatters cost
    ~200ms at SLAM scale on TPU; this layout needs only gathers).
    """

    padded_gid: jax.Array  # (M_pad,) int32 gaussian id per padded stream slot
    chunk_meta: jax.Array  # (NC,) int32 packed: tile<<10 | nvalid<<1 | first
    counts: jax.Array  # (T,) int32 instances per tile
    gid_hist: jax.Array  # (N,) int32 instances per gaussian in the padded
    # stream (tiles_touched + pad rows on gaussian 0) — known analytically,
    # so the gradient segment-sum never needs a scatter-add histogram
    num_instances: jax.Array  # () int32 total instances emitted
    padded_total: jax.Array  # () int32 stream length incl. per-tile padding
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
    """Chunk-aligned CSR binning for the Pallas flat-chunk-grid kernels."""
    chunk = cfg.chunk
    sorted_tile, sorted_gid, tile_id, total, num_tiles = _expand_instances(
        proj, cam, cfg
    )
    k = cfg.max_instances
    nc = (k + chunk - 1) // chunk + int(cfg.pad_slack * num_tiles) + 1
    m_pad = nc * chunk

    # Per-tile ranges from the SORTED keys: a 3k-query searchsorted over the
    # sorted 1M array is cheap (binary-search scan on few queries), unlike a
    # 1M-element scatter-add histogram (~17ms).
    tq = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tq, side="left").astype(jnp.int32)
    counts = tile_start[1:] - tile_start[:-1]
    nchunks = (counts + chunk - 1) // chunk
    chunk_off = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(nchunks)])
    padded_start = chunk_off * chunk
    padded_total = padded_start[-1]

    # per-chunk metadata: owning tile, first-chunk flag, valid rows in chunk
    c_idx = jnp.arange(nc, dtype=jnp.int32)
    chunk_tile = jnp.repeat(
        jnp.arange(num_tiles, dtype=jnp.int32), nchunks, total_repeat_length=nc
    )
    # tail chunks (>= total used chunks) repeat the last tile id; nvalid = 0
    # there, so the kernel skips them.
    local_chunk = c_idx - chunk_off[chunk_tile]
    nvalid = jnp.clip(counts[chunk_tile] - local_chunk * chunk, 0, chunk)
    nvalid = jnp.where(c_idx < chunk_off[-1], nvalid, 0)
    prev_tile = jnp.concatenate([jnp.full(1, -1, jnp.int32), chunk_tile[:-1]])
    first = (chunk_tile != prev_tile).astype(jnp.int32)
    # nvalid needs 9 bits (chunk <= 512 supported); tile gets the rest
    chunk_meta = (chunk_tile << 10) | (nvalid.astype(jnp.int32) << 1) | first

    # padded stream <- sorted stream. Each chunk's sources are CONTIGUOUS
    # (chunk c of tile t reads sorted positions tile_start[t]+local*chunk
    # onward), so the expansion is NC windowed dynamic-slices — a gather of
    # 128-contiguous runs, ~15x faster than the equivalent 1-D random gather
    # sorted_gid[src] (1-D int gathers hit a scalar path on TPU).
    chunk_src = tile_start[:-1][chunk_tile] + local_chunk * chunk  # (NC,)
    gid_padded_tbl = jnp.concatenate(
        [sorted_gid, jnp.zeros(chunk, jnp.int32)]
    )  # windows never clamp: chunk_src <= total <= k
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    windows = jax.lax.gather(
        gid_padded_tbl, jnp.clip(chunk_src, 0, k)[:, None], dn,
        slice_sizes=(chunk,), mode=jax.lax.GatherScatterMode.CLIP,
    )
    # barrier keeps the validity mask out of the gather fusion (which lands
    # in scalar space). Measured equal to the vmap(dynamic_slice) form —
    # which serializes into an 8.8k-iteration while loop — but compiles to
    # one batched gather; the in-context ~7 ms (vs 1.9 ms isolated) for
    # this stream expansion remains a round-2 target.
    windows = jax.lax.optimization_barrier(windows)
    rel = local_chunk[:, None] * chunk + jnp.arange(chunk, dtype=jnp.int32)
    row_valid = (rel < counts[chunk_tile][:, None]).reshape(m_pad)
    padded_gid = jnp.where(row_valid, windows.reshape(m_pad), 0)
    gid_hist = proj.tiles_touched.astype(jnp.int32).at[0].add(m_pad - total)

    return BinnedCSR(
        padded_gid=padded_gid,
        chunk_meta=chunk_meta,
        counts=counts,
        gid_hist=gid_hist,
        num_instances=total,
        padded_total=padded_total,
        overflow=(total > k) | (padded_total > m_pad),
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
