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
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatam_tpu.render.camera import Camera
from splatam_tpu.render.geometry import TILE, Projected


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer capacities (hashable: safe as a jit static arg)."""

    max_instances: int = 2**20  # cap on total PRE-cull (gaussian, tile) pairs
    max_per_tile: int = 1024  # cap on instances per tile
    chunk: int = 128  # instances blended per scan step
    # Cap on the post-cull sorted stream (None = max_instances). The tile
    # cull drops 10-45% of rect instances, and every post-sort cost (stream
    # gather, kernel grid, gradient reduction sort) is sized by THIS, so a
    # snug post-cull capacity buys real throughput. Overflow-flagged.
    max_stream: int | None = None
    # Cap on aligned-window chunks (None = max_stream/chunk + num_tiles + 1,
    # the no-overflow worst case where every tile needs a partial leading
    # chunk). The backward's reduction sort runs at max_chunks * chunk rows,
    # so sizing this to a measured `padded_total` is another ~10%.
    max_chunks: int | None = None
    backend: str = "auto"  # 'jnp' | 'pallas' | 'auto'
    # Gradient-reduction strategy for the pallas backend (instance -> gaussian
    # segment sums in the backward):
    #   'sort'    — value-carrying sort by gaussian id + cumsum-diff (cost
    #               scales with carried row count, ~0.6 ms/row at 1.2M)
    #   'perm'    — binning precomputes each expansion slot's grid-output row
    #               (slot_pos); backward = one row gather + cumsum with
    #               analytic slot boundaries. No per-iteration sort; the
    #               inversion sort happens at binning time (amortized by
    #               rebin_every).
    #   'scatter' — row scatter-add keyed by the kernels' gid row.
    # All three are exact; see PROFILE.md for measurements.
    reduction: str = "sort"
    # In-kernel transmittance evaluation (pallas backend):
    #   'mxu'  — log1p -> bf16x3 triangular-matmul cumsum -> exp (3
    #            transcendentals per (pixel, gaussian) pair)
    #   'roll' — Hillis-Steele lane-roll cumprod in plain f32 products (the
    #            alpha exp is the only remaining transcendental per pair).
    # Both are exact re-associations of the same recursion (tests pin them
    # against the jnp oracle); see PROFILE.md for on-chip timings.
    scan_impl: str = "mxu"
    # Unused since the aligned-window layout (chunk capacity is now exactly
    # max_instances/chunk + num_tiles and cannot overflow); kept so configs
    # that set it keep loading.
    pad_slack: float = 0.65
    # Reorder tile segments in the sorted stream so window boundaries land
    # on chunk edges (alignment_order): ~13-18% fewer kernel grid steps on
    # SplaTAM scenes, render-exact. Drivers that carry counts between rebins
    # (slam/pipeline.py, bench.py) honor this; one-shot renders have no
    # previous counts and bin identity-ordered regardless.
    align_windows: bool = True
    # Mesh axis name to shard image tiles over (the DP analog for this
    # workload, SURVEY.md §2.3). None = single device. Requires an ambient
    # mesh (jax.sharding.use_mesh) with this axis; GSPMD partitions the
    # compositing scan over tiles and all-reduces parameter grads over ICI.
    shard_axis: str | None = None
    # Stream layout for the Pallas kernels:
    #   'split'   — DEFAULT. Per-tile WHOLE chunks laid out back-to-back
    #               with zero waste (the "interior" region), plus all
    #               tiles' sub-chunk residues PAIRED two-per-chunk into a
    #               shared "tail" region (bin_gaussians_split). Two Pallas
    #               calls per direction: the interior call runs the plain
    #               aligned-step math and hands each tile's end state to
    #               the tail call through an HBM carry block (routed
    #               pallas-to-pallas); the tail call composites the residue
    #               pairs with the segmented scan. ~34% fewer pair slots
    #               than 'aligned' on SplaTAM scenes (+7% over the K/chunk
    #               floor); 26.6 vs 25.6 Mpix/s on the r5 bench.
    #   'aligned' — each tile's segment is covered by chunk-ALIGNED windows
    #               of the sorted stream (skip-masked foreign head rows);
    #               wastes ~avg chunk/2 masked slots per tile. Single
    #               Pallas call per direction; the fisher path always uses
    #               it (fisher_config).
    # (A third layout, 'packed' — back-to-back segments with one boundary
    # per chunk — was deleted in r5 after losing to aligned for two rounds;
    # split composes the same segmented boundary step with zero-waste
    # interiors and wins.)
    layout: str = "split"
    # Cap on tail-region chunks for layout='split' (None = num_tiles + 1,
    # the one-residue-per-tile worst case). max_chunks caps the INTERIOR
    # region there (None = max_stream/chunk).
    max_chunks_tail: int | None = None
    # RETIRED (no-op, kept so configs that set it keep loading): grouped
    # G-chunks-per-backward-step kernels measured NULL in r4 — per-step
    # block DMAs are already hidden by Pallas's double buffering
    # (PROFILE.md) — and were deleted in r5.
    grid_group: int = 1

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
    gid_hist: jax.Array  # (N,) int32 exact per-gaussian SURVIVING instance
    # count (tiles_touched minus tile-cull drops), giving the gradient
    # reduction its segment boundaries analytically (no scatter-add)
    num_instances: jax.Array  # () int32 total instances emitted
    padded_total: jax.Array  # () int32 windowed stream length (used chunks)
    overflow: jax.Array  # () bool: instance buffer overflowed
    # reduction='perm' only (None otherwise): per pre-cull expansion SLOT
    # (gid-major contiguous), the grid-output row holding that instance's
    # gradients in the backward kernel's (ROWS, NC*chunk) output — NC*chunk
    # (the zero pad row) for culled/overflowed slots. Slot segment
    # boundaries come from ``slot_off`` (inclusive cumsum of tiles_touched).
    slot_pos: jax.Array | None = None  # (K,) int32
    slot_off: jax.Array | None = None  # (N,) int32


def sized_config(
    num_instances: int,
    base: RasterConfig = RasterConfig(),
    margin: float = 1.1,
    num_kept: int | None = None,
    chunks_used: int | None = None,
    chunks_tail: int | None = None,
) -> RasterConfig:
    """Pre-size capacities from measured instance counts.

    ``num_instances`` (rect-based pairs, `count_instances`) sizes the
    pre-cull expansion buffer. ``num_kept`` (a probe binning's
    `num_instances`) sizes the post-cull stream, and ``chunks_used`` (probe
    `padded_total / chunk`) the aligned-window grid — sort, gather,
    kernel-grid and gradient-reduction costs all scale with THOSE, so snug
    post-cull capacities directly buy throughput. Like the SLAM driver's
    ``map_capacity`` pre-sizing knob, this is an optimization only — the
    overflow flag still triggers a bigger re-run if the scene outgrows the
    estimate.
    """

    def rup(v):
        v = int(v * margin) + base.chunk
        return ((v + base.chunk - 1) // base.chunk) * base.chunk

    return dataclasses.replace(
        base,
        max_instances=rup(num_instances),
        max_stream=None if num_kept is None else rup(num_kept),
        max_chunks=None if chunks_used is None else int(chunks_used * margin) + 2,
        max_chunks_tail=None
        if chunks_tail is None
        else int(chunks_tail * margin) + 2,
    )


def shrink_binned(binned, chunk: int, max_stream: int, max_chunks: int,
                  max_chunks_tail: int | None = None):
    """Slice a binned result down to snug (quantized) capacities.

    Every post-binning cost — the stream gather, the kernel GRID, the
    gradient-reduction sort and its cumsum internals — scales with the
    binned arrays' STATIC shapes, which default to the safe worst case
    (max_instances-derived). A SLAM-scale render at the safe shapes wastes
    ~2x device time (measured 24 ms/iter in ONE reduction fusion at
    nc=19610 vs ~10k used — tools/slam_bench.py --profile_last). Slicing is
    exact as long as the caller verified `used_chunks <= max_chunks` and
    `stream rows <= max_stream` (host-fetch padded_total / num_instances /
    stream_rows first); render programs then compile once per quantum tier
    instead of once per scene size (slam/pipeline.py sizing cache).
    ``max_stream`` must be a chunk multiple.
    """
    nc = max_chunks
    if hasattr(binned, "tsl"):  # BinnedSplit: slice both regions
        assert max_chunks_tail is not None
        nci0 = binned.chunk_meta.shape[0]
        nci, nct = max_chunks, max_chunks_tail
        over = (binned.used_interior > nci) | (binned.used_tail > nct)
        gid = jnp.concatenate(
            [
                binned.sorted_gid[: nci * chunk],
                binned.sorted_gid[
                    nci0 * chunk : nci0 * chunk + nct * chunk
                ],
            ]
        )
        ct = jnp.arange(nct, dtype=jnp.int32)
        return binned._replace(
            sorted_gid=gid,
            chunk_meta=binned.chunk_meta[:nci],
            chunk_lim=binned.chunk_lim[:nci],
            chunk_blk=jnp.minimum(binned.chunk_blk[:nci], nci + nct - 1),
            tmeta=binned.tmeta[:nct],
            tsl=binned.tsl[:nct],
            tbt=binned.tbt[:nct],
            tblk=jnp.minimum(nci + ct, nci + nct - 1),
            tail_cid=jnp.minimum(binned.tail_cid, nct - 1),
            overflow=binned.overflow | over,
        )
    # valid stream BLOCK indices after the shrink: _build_stream pads one
    # extra chunk past max_stream, so blocks 0..max_stream//chunk exist
    blk_cap = jnp.int32(max_stream // chunk)
    slot_pad = nc * chunk
    rows = getattr(binned, "stream_rows", None)
    if rows is None:
        rows = binned.num_instances
    # a mid-phase rebin can outgrow a cached tier: flag it (TRACED — no
    # host sync) so the caller's phase-end overflow retry fires
    over = (binned.padded_total > nc * chunk) | (rows > max_stream)
    common = dict(
        chunk_meta=binned.chunk_meta[:nc],
        chunk_lim=binned.chunk_lim[:nc],
        chunk_blk=jnp.minimum(binned.chunk_blk[:nc], blk_cap),
        overflow=binned.overflow | over,
        slot_pos=None if binned.slot_pos is None else jnp.minimum(
            binned.slot_pos, slot_pad
        ),
    )
    return binned._replace(sorted_gid=binned.sorted_gid[:max_stream], **common)


# Safety slack on the tile-cull bound: the kernels recompute alpha with
# their own (differently fused) f32 arithmetic, so the analytic bound is
# backed off by this much in power units before dropping an instance.
CULL_EPS = 1e-3

# Multiplicative headroom on the per-tile saturation-depth cap (depth_cap):
# the cap comes from a render at slightly different params (the previous
# iteration / rebin point), so instances within this factor of the measured
# cap are kept even though that render never reached them.
SAT_MARGIN = 1.05


@partial(jax.jit, static_argnums=(1,))
def alignment_order(counts: jax.Array, chunk: int) -> jax.Array:
    """(T,) int32 sort rank per tile that chunk-aligns window boundaries.

    The flat-chunk-grid kernels pay one grid step per chunk of every tile's
    aligned window, so the grid size is ``K/chunk + #(tiles whose stream
    segment ends off a chunk boundary)`` — with tiles in raster order that
    second term is ~one extra step per non-empty tile (+30-50% grid steps on
    SplaTAM scenes). Reordering tiles in the (tile, depth) sort key changes
    NO render output (compositing is per tile; cross-tile stream order is
    arbitrary), but choosing the order so consecutive residues complement
    (r1 + r2 = chunk) aligns every pair boundary:

      1. tiles whose count % chunk == r pair with tiles of residue
         chunk - r (r == chunk/2 pairs within itself); each matched pair's
         combined segment ends chunk-aligned — one saved step per pair;
      2. residue-0 tiles ride directly after the paired block, staying
         aligned for free — one saved step each;
      3. unmatched tiles and empty tiles trail (their cost is
         position-independent).

    Feed ``counts`` from the previous rebin's `BinnedCSR.counts`: exactness
    never depends on the counts (ANY rank array is valid — stale counts only
    degrade the step savings). Cost: a few (T,)-sized sorts at bin time.
    """
    t_len = counts.shape[0]
    t = jnp.arange(t_len, dtype=jnp.int32)
    c = counts.astype(jnp.int32)
    r = c % chunk
    half = chunk // 2
    pairable = r > 0
    side = (r > half).astype(jnp.int32)
    b = jnp.where(side == 1, chunk - r, r)  # complement bucket, 1..half
    # sort pairable tiles by (bucket, side); non-pairable to the tail
    key = jnp.where(pairable, b * 2 + side, 2 * half + 2)
    skey, stile = jax.lax.sort((key, t), num_keys=1, is_stable=True)
    pos = jnp.arange(t_len, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones(1, bool), skey[1:] != skey[:-1]]
    )
    gstart = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, pos, 0)
    )
    grank = pos - gstart  # rank within the (bucket, side) group
    sb = skey // 2
    sside = skey % 2
    # the self-complementary bucket (r == chunk/2) alternates sides by parity
    is_half = (sb == half) & (skey < 2 * half + 2)
    sside = jnp.where(is_half, grank % 2, sside)
    grank = jnp.where(is_half, grank // 2, grank)
    # per-(bucket, side) sizes -> pairs per bucket (tiny histogram scatter)
    nbins = 2 * (half + 1)
    bin_id = jnp.where(skey < 2 * half + 2, sb * 2 + sside, nbins)
    hist = jnp.zeros(nbins + 1, jnp.int32).at[bin_id].add(1)[:nbins]
    mb = jnp.minimum(hist[0::2], hist[1::2])  # (half+1,) pairs per bucket
    pair_base = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(mb)[:-1]]
    )
    matched = (skey < 2 * half + 2) & (grank < mb[sb])
    pair_id = pair_base[sb] + grank
    # order: matched pairs (side0 then side1 inside a pair), then aligned
    # residue-0 tiles, then unmatched, then empty tiles
    sc = c[stile]
    aligned = (~matched) & (sc > 0) & (sc % chunk == 0)
    empty_t = sc == 0
    order_key = jnp.where(
        matched,
        pair_id * 2 + sside,
        jnp.where(
            aligned,
            t_len + stile,
            jnp.where(empty_t, 3 * t_len + stile, 2 * t_len + stile),
        ),
    )
    # rank[tile] = position of `tile` in the order
    _, otile = jax.lax.sort((order_key, stile), num_keys=1, is_stable=True)
    _, rank = jax.lax.sort((otile, pos), num_keys=1, is_stable=True)
    return rank


def _expand_instances(
    proj: Projected,
    cam: Camera,
    cfg: RasterConfig,
    opacities: jax.Array | None = None,
    carry_slot: bool = False,
    depth_cap: jax.Array | None = None,
    tile_rank: jax.Array | None = None,
):
    """Instance expansion + per-tile alpha cull + (tile, depth) sort.

    Replaces cub InclusiveSum + duplicateWithKeys + radix sort
    (`rasterizer_impl.cu:33-339`). jnp.repeat is the fast path on TPU —
    jnp.searchsorted's default 'scan' method lowers to a while-loop that
    costs ~300ms at this size.

    Unlike the reference (rect-only binning), each expanded (gaussian, tile)
    instance is also tested against the EXACT maximum alpha the gaussian can
    reach anywhere in the tile:

        alpha(p) = op * exp(-q(p)),  q(p) = 0.5 d^T C d
        max over tile = op * exp(-min_{d in box} q(d))

    where the box minimum of the PD quadratic is closed-form: 0 if the mean
    lies inside the tile's pixel-center box, else the minimum over the four
    clamped edge restrictions (each a 1-D quadratic). This is strictly
    tighter than the lam_min(C) * dist^2 Euclidean bound it replaced —
    anisotropic conics (every perspective-projected gaussian) decay much
    faster across their minor axis than lam_min admits.

    Instances whose bound falls below the kernels' ALPHA_MIN keep-threshold
    contribute exactly zero in both the jnp and Pallas paths, so dropping
    them here changes no output while cutting the instance stream ~25-45%
    (corner tiles of the bounding rect, low-opacity tails) — and every
    downstream cost (sort, stream gather, kernel grid, gradient reduction)
    scales with that stream. ``opacities=None`` assumes op=1 (distance-only
    cull). Returns per-gaussian SURVIVING instance counts alongside the
    sorted stream.

    ``depth_cap`` ((num_tiles,) f32, +inf = uncapped) additionally drops
    instances deeper than SAT_MARGIN x the tile's cap. Fed from a previous
    render's saturation depth (PallasRasterOut aux row 2): every pixel of
    the tile was opaque before the cap was reached, so at those params the
    dropped instances contributed exactly nothing (the per-pixel T_STOP
    dead mask — the analog of the reference CUDA's per-pixel `done`
    early-out, `forward.cu:314-328`); under drift the margin plus the
    caller's rebin cadence bound the error (tests/test_fixed_binning.py).
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

    # Per-gaussian cull headroom (in power units): an instance is dropped
    # when min_box q > headroom, i.e. op * exp(-q_min) < ALPHA_MIN (with
    # CULL_EPS backoff for the kernels' differently-fused arithmetic).
    from splatam_tpu.render.geometry import ALPHA_MIN

    ca, cb, cc = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    if opacities is None:
        log_op = jnp.zeros_like(ca)
    else:
        op = jax.lax.stop_gradient(opacities).reshape(-1)
        log_op = jnp.log(jnp.maximum(op, 1e-30))
    headroom = log_op - jnp.log(ALPHA_MIN) + CULL_EPS

    # One ROW gather instead of repeated column gathers: TPU gathers whole
    # rows ~30x faster than per-column at this size. Depth and the f32 cull
    # fields ride along bitcast to int32 (IEEE order irrelevant: bitcast
    # back before use; f32 depth order-preserving for z > 0).
    def _f(v):
        return jax.lax.bitcast_convert_type(v, jnp.int32)

    gtable = jnp.stack(
        [
            starts,
            proj.rect_min[:, 0],
            proj.rect_min[:, 1],
            jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 1),
            _f(proj.depths),
            _f(proj.means2d[:, 0]),
            _f(proj.means2d[:, 1]),
            _f(headroom),
            _f(ca),
            _f(cb),
            _f(cc),
        ],
        axis=-1,
    )  # (N, 11) int32
    # barriers keep the cull/rect arithmetic OUT of the gather fusion: XLA
    # fuses the consumers into the gather and lands it in S(1) scalar space
    # (~4 ms measured vs ~1.6 ms for the bare row gather — see CLAUDE.md on
    # profiling gathers in context)
    grow = gtable.at[jax.lax.optimization_barrier(gid_safe)].get(
        mode="promise_in_bounds"
    )  # indices pre-clipped; keep the fill/clamp fusion out of the gather
    grow = jax.lax.optimization_barrier(grow)  # (K, 8)
    local = slot - grow[:, 0]
    rect_w_safe = grow[:, 3]
    ty = grow[:, 2] + local // rect_w_safe
    tx = grow[:, 1] + local % rect_w_safe

    # exact min of q(d) = 0.5 ca dx^2 + cb dx dy + 0.5 cc dy^2 over the
    # tile's pixel-center box d in [x_lo - mx, x_lo + 15 - mx] x (same in y):
    # 0 if the mean is inside, else the least of the four edge restrictions,
    # each a 1-D quadratic minimized at its clamped stationary point
    def _g(col):
        return jax.lax.bitcast_convert_type(grow[:, col], jnp.float32)

    mx, my = _g(5), _g(6)
    ghead, gca, gcb, gcc = _g(7), _g(8), _g(9), _g(10)
    x_lo = (tx * TILE).astype(jnp.float32)
    y_lo = (ty * TILE).astype(jnp.float32)
    dxlo, dxhi = x_lo - mx, x_lo + (TILE - 1) - mx
    dylo, dyhi = y_lo - my, y_lo + (TILE - 1) - my

    def _q(dx, dy):
        return 0.5 * (gca * dx * dx + gcc * dy * dy) + gcb * dx * dy

    def _edge_x(x):  # dx fixed at x, dy free in [dylo, dyhi]
        return _q(x, jnp.clip(-gcb * x / gcc, dylo, dyhi))

    def _edge_y(y):  # dy fixed at y, dx free in [dxlo, dxhi]
        return _q(jnp.clip(-gcb * y / gca, dxlo, dxhi), y)

    inside = (dxlo <= 0.0) & (0.0 <= dxhi) & (dylo <= 0.0) & (0.0 <= dyhi)
    q_min = jnp.where(
        inside,
        0.0,
        jnp.minimum(
            jnp.minimum(_edge_x(dxlo), _edge_x(dxhi)),
            jnp.minimum(_edge_y(dylo), _edge_y(dyhi)),
        ),
    )
    dropped = q_min > ghead
    tid0 = jnp.clip(ty * grid_x + tx, 0, num_tiles - 1)
    rk_pre = None
    if depth_cap is not None and tile_rank is not None:
        # the SLAM/bench steady state: both per-tile lookups ride ONE
        # (T, 2) row gather — 1-D element gathers land on a ~3x slower
        # per-index path than row gathers (~6.6 vs ~2 ns/idx measured;
        # ~11 -> ~2 ms per rebin at 860k instances). f32 cap bitcast to
        # int32 for the shared table, back before use.
        ttab = jnp.stack(
            [_f(depth_cap), tile_rank.astype(jnp.int32)], axis=-1
        )  # (T, 2) int32
        trow = ttab.at[jax.lax.optimization_barrier(tid0)].get(
            mode="promise_in_bounds"
        )
        trow = jax.lax.optimization_barrier(trow)
        cap = jax.lax.bitcast_convert_type(trow[:, 0], jnp.float32)
        rk_pre = trow[:, 1]
        depth_f = jax.lax.bitcast_convert_type(grow[:, 4], jnp.float32)
        dropped = dropped | (depth_f > cap * SAT_MARGIN)
    elif depth_cap is not None:
        cap = depth_cap.at[jax.lax.optimization_barrier(tid0)].get(
            mode="promise_in_bounds"
        )
        cap = jax.lax.optimization_barrier(cap)
        depth_f = jax.lax.bitcast_convert_type(grow[:, 4], jnp.float32)
        dropped = dropped | (depth_f > cap * SAT_MARGIN)
    keep = in_use & ~dropped

    tile_id = jnp.where(keep, ty * grid_x + tx, num_tiles)
    if tile_rank is not None:
        # sort by the alignment rank instead of the raster tile id: changes
        # only the cross-tile stream order (render-exact for ANY rank array;
        # see alignment_order). Same barrier treatment as the depth_cap
        # lookup — keep the (T,)-table gather out of scalar-space fusions.
        if rk_pre is None:
            rk_pre = tile_rank.at[
                jax.lax.optimization_barrier(tid0)
            ].get(mode="promise_in_bounds")
            rk_pre = jax.lax.optimization_barrier(rk_pre)
        tile_key = jnp.where(keep, rk_pre, num_tiles)
    else:
        tile_key = tile_id
    total_kept = jnp.sum(keep.astype(jnp.int32))

    # surviving instances per gaussian = tiles_touched - dropped-in-group,
    # via cumsum over the (gid-major contiguous) pre-sort slot order
    dcum = jnp.cumsum((dropped & in_use).astype(jnp.int32))
    seg_end = dcum.at[jnp.clip(offsets - 1, 0, k - 1)].get(
        mode="promise_in_bounds"
    )
    # contiguous groups: starts[g] == offsets[g-1], so the start boundary
    # is seg_end shifted — one N-sized gather instead of two
    seg_start = jnp.where(
        starts > 0, jnp.pad(seg_end, (1, 0))[:-1], 0
    )
    kept_hist = jnp.where(
        tiles_touched > 0, tiles_touched - (seg_end - seg_start), 0
    ).astype(jnp.int32)

    # Sort by (tile, depth); stable => ties keep gaussian/rect emission order,
    # matching the radix sort of `rasterizer_impl.cu:301-309`.
    depth_key = jnp.where(
        keep,
        jax.lax.bitcast_convert_type(grow[:, 4], jnp.float32),
        jnp.inf,
    )
    operands = (tile_key.astype(jnp.int32), depth_key, gid_safe)
    if carry_slot:
        # reduction='perm' needs the sort permutation itself (slot index of
        # each sorted position) to precompute slot_pos; one extra carried
        # operand costs ~0.6 ms at 1M rows, amortized by rebin_every.
        out = jax.lax.sort(operands + (slot,), num_keys=2, is_stable=True)
        sorted_tile, _, sorted_gid, sorted_slot = out
    else:
        sorted_tile, _, sorted_gid = jax.lax.sort(
            operands, num_keys=2, is_stable=True
        )
        sorted_slot = None
    return (
        sorted_tile, sorted_gid, sorted_slot, tile_id, total, num_tiles,
        total_kept, kept_hist, offsets,
    )


class BinnedSplit(NamedTuple):
    """Split stream layout (layout='split'): zero-waste interiors + paired
    residue tails.

    Every tile's first ``chunk * (count // chunk)`` instances occupy WHOLE
    chunks in the interior region (one tile per chunk, no window masking,
    no pads — the K/chunk floor for that portion). The remaining
    ``count % chunk`` residues are packed two-per-chunk into the tail
    region, pairing large residues with small ones (sorted-halves) so most
    pairs fit one chunk. The interior Pallas call writes each tile's end
    state (transmittance / depth / prefix accumulators) to a per-tile HBM
    carry block; the tail call seeds its segments from those carries.

    On the bench scene this is 5522 grid steps vs 8374 aligned (floor
    5172) — a −34% pair-slot cut, which is the kernels' whole cost model
    (PROFILE.md: per-step fixed costs are pipeline-hidden; only pair slots
    and ops/pair matter).
    """

    sorted_gid: jax.Array  # ((NCi+NCt)*chunk,) int32 gid per split-stream
    # slot (pad slots arbitrary; kernels mask rows >= lim)
    # interior tables (NCi,): same formats as BinnedCSR, except the skip
    # bits (structurally 0 here) carry the SOLO flag
    chunk_meta: jax.Array  # tile << 1 | first
    chunk_lim: jax.Array  # solo << 16 | lim (chunk for used, 0 for pads)
    chunk_blk: jax.Array  # stream block index (== own index, capped)
    # tail tables (NCt,): rows [0, send) = tile A's residue, [send, lim) =
    # tile B's; flags say whether that tile HAS interiors (else the kernel
    # seeds from the initial state, ignoring the garbage carry block)
    tmeta: jax.Array  # tile_a << 1 | has_interior_a
    tsl: jax.Array  # send << 16 | lim (lim 0 for pads)
    tbt: jax.Array  # tile_b << 1 | has_interior_b (tile_b = tile_a when
    # the chunk holds a single residue)
    tblk: jax.Array  # stream block index (NCi_cap + own index)
    # (T,) compose masks: which output array owns each tile's final state
    mask_int: jax.Array  # tile has interior chunks
    mask_a: jax.Array  # tile is some tail chunk's A segment
    mask_b: jax.Array  # tile is some tail chunk's B segment
    counts: jax.Array  # (T,) int32 instances per tile
    gid_hist: jax.Array  # (N,) int32 surviving instances per gaussian
    num_instances: jax.Array  # () int32
    padded_total: jax.Array  # () int32 used chunks (both regions) * chunk
    overflow: jax.Array  # () bool
    stream_rows: jax.Array = None  # alias of padded_total (sizer metric)
    used_interior: jax.Array = None  # () int32 interior chunks in use
    used_tail: jax.Array = None  # () int32 tail chunks in use
    tail_cid: jax.Array = None  # (T,) tail chunk index per tile (0 when
    # the tile has no tail; gate with mask_a | mask_b)
    tail_role: jax.Array = None  # (T,) 0 = A segment, 1 = B segment
    slot_pos: jax.Array | None = None  # unsupported (reduction='sort' only)
    slot_off: jax.Array | None = None


def bin_gaussians_split(
    proj: Projected,
    cam: Camera,
    cfg: RasterConfig,
    opacities: jax.Array | None = None,
    depth_cap: jax.Array | None = None,
) -> BinnedSplit:
    """Split-stream binning (see BinnedSplit).

    Same expansion/cull/sort as the other layouts; only the placement
    differs. Fully vectorized: the residue pairing is "sorted halves"
    (sort residues descending, pair rank i with rank R-1-i, split the pair
    into two chunks when the sum exceeds ``chunk``) — within ~2% of greedy
    best-fit on SplaTAM scenes and free of sequential scans.
    """
    chunk = cfg.chunk
    (
        sorted_tile, sorted_gid, _, tile_id, total, num_tiles,
        total_kept, kept_hist, _,
    ) = _expand_instances(
        proj, cam, cfg, opacities, carry_slot=False,
        depth_cap=depth_cap, tile_rank=None,
    )
    k = cfg.max_instances
    ks = cfg.max_stream or k
    nci = cfg.max_chunks or (ks // chunk)
    nct = cfg.max_chunks_tail or (num_tiles + 1)
    t_len = num_tiles

    tq = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tq, side="left").astype(
        jnp.int32
    )
    counts = tile_start[1:] - tile_start[:-1]
    starts = tile_start[:-1]
    q = counts // chunk  # whole (interior) chunks per tile
    r = counts % chunk  # residue rows per tile

    # ---- interior chunk tables -------------------------------------------
    ioff = jnp.cumsum(q) - q  # exclusive: first interior chunk per tile
    used_i = jnp.sum(q)
    c_idx = jnp.arange(nci, dtype=jnp.int32)
    itile = jnp.repeat(
        jnp.arange(t_len, dtype=jnp.int32), q, total_repeat_length=nci
    )
    in_use_i = c_idx < used_i
    # repeat pads with arange's LAST element (tile T-1), which is usually
    # NOT the last tile with interiors — the _is_last aux/carry write for
    # the last real tile would land on tile T-1's blocks. Pin pads to the
    # last USED tile id instead (its lim stays 0, so only the write
    # placement changes).
    itile = jnp.where(
        in_use_i, itile, jnp.take(itile, jnp.clip(used_i - 1, 0, nci - 1))
    )
    # SOLO flag (residue 0: the interior call owns the tile's aux; no carry
    # is read) rides the skip bits — split interiors never skip. Pads
    # inherit their pinned tile's flag so the deferred _is_last write picks
    # the right array.
    solo_c = jnp.take((r == 0).astype(jnp.int32), itile)
    local = c_idx - jnp.take(ioff, itile)
    prev_it = jnp.concatenate([jnp.full(1, -1, jnp.int32), itile[:-1]])
    ifirst = ((itile != prev_it) & in_use_i).astype(jnp.int32)
    imeta = (itile << 1) | ifirst
    ilim = jnp.where(in_use_i, chunk, 0).astype(jnp.int32)
    ilim_packed = (solo_c << 16) | ilim
    iblk = jnp.minimum(c_idx, nci + nct - 1)
    isrc = jnp.take(starts, itile) + local * chunk

    # ---- tail pairing: OPTIMAL max matching of residues into chunks ------
    # Sort residues descending. m pairs are feasible iff the 2m SMALLEST
    # residues pair up in reverse order (rs[R-2m+i] + rs[R-1-i] <= chunk
    # for all i < m) — the classic "boats" certificate, monotone in m — so
    # a ~12-step binary search finds the optimal pair count M (== greedy
    # two-pointer), fully vectorized. The first-cut "sorted halves" pairing
    # measured 3133 tail chunks on the bench scene vs 2192 optimal: with
    # mean residue ~74, mirror pairs sum ~147 > 128 and nearly everything
    # split.
    tiles = jnp.arange(t_len, dtype=jnp.int32)
    key = jnp.where(r > 0, -r, 1)
    _, ord_tiles = jax.lax.sort(
        (key.astype(jnp.int32), tiles), num_keys=1, is_stable=True
    )
    rs = jnp.take(r, ord_tiles)  # residues descending; zeros at the end
    R = jnp.sum((r > 0).astype(jnp.int32))
    i_idx = jnp.arange(t_len, dtype=jnp.int32)

    def _feasible(m):
        lead = jnp.take(rs, jnp.clip(R - 2 * m + i_idx, 0, t_len - 1))
        part = jnp.take(rs, jnp.clip(R - 1 - i_idx, 0, t_len - 1))
        bad = (i_idx < m) & (lead + part > chunk)
        return jnp.logical_not(jnp.any(bad))

    def _bs(step, lohi):
        lo, hi = lohi  # invariant: feasible(lo), not feasible(hi + 1)
        mid = (lo + hi + 1) // 2
        good = _feasible(mid)
        return jnp.where(good, mid, lo), jnp.where(good, hi, mid - 1)

    bits = max((t_len // 2).bit_length(), 1)
    M, _ = jax.lax.fori_loop(0, bits, _bs, (jnp.int32(0), R // 2))
    # the R-2M LARGEST residues get single chunks (cid == rank); lead ranks
    # [R-2M, R-M) keep cid == rank; rank j in [R-M, R) is the B segment of
    # its mirror lead R-1-j
    used_t = R - M
    nsingle = R - 2 * M
    cid = jnp.where(i_idx < R - M, i_idx, nsingle + (R - 1 - i_idx))
    valid_rank = i_idx < R
    role_b = (i_idx >= R - M) & valid_rank  # second segment, shared chunk

    hasint_r = (jnp.take(q, ord_tiles) > 0).astype(jnp.int32)
    src_r = jnp.take(starts, ord_tiles) + jnp.take(q, ord_tiles) * chunk
    vals = jnp.stack([ord_tiles, rs, hasint_r, src_r], axis=-1)  # (T, 4)
    cid_a = jnp.where(valid_rank & ~role_b, cid, nct)
    cid_b = jnp.where(role_b, cid, nct)
    A = jnp.zeros((nct + 1, 4), jnp.int32).at[cid_a].set(vals, mode="drop")
    B = jnp.zeros((nct + 1, 4), jnp.int32).at[cid_b].set(vals, mode="drop")
    A, B = A[:nct], B[:nct]
    has_b = B[:, 1] > 0
    # single-residue chunks: point the B side at the A tile (carry/const
    # fetches need a valid block; send == lim keeps it inert)
    btile = jnp.where(has_b, B[:, 0], A[:, 0])
    bhas = jnp.where(has_b, B[:, 2], A[:, 2])
    ct_idx = jnp.arange(nct, dtype=jnp.int32)
    in_use_t = ct_idx < used_t
    # pads keep the LAST used chunk's tiles (so their output blocks never
    # move off the real data) with lim forced to 0 (no re-run, no
    # duplicate gradient rows)
    edge = jnp.clip(used_t - 1, 0, nct - 1)

    def _pad(v):
        return jnp.where(in_use_t, v, jnp.take(v, edge))

    tmeta = _pad((A[:, 0] << 1) | A[:, 2])
    tbt = _pad((btile << 1) | bhas)
    send_t = jnp.where(in_use_t, A[:, 1], 0)
    lim_t = jnp.where(in_use_t, A[:, 1] + jnp.where(has_b, B[:, 1], 0), 0)
    tsl = (send_t << 16) | lim_t
    tblk = jnp.minimum(nci + ct_idx, nci + nct - 1)
    srca_t = A[:, 3]
    srcb_t = jnp.where(has_b, B[:, 3], 0)

    # ---- compose masks ----------------------------------------------------
    mask_int = q > 0
    a_tiles = jnp.where(valid_rank & ~role_b, ord_tiles, t_len)
    b_tiles = jnp.where(role_b, ord_tiles, t_len)
    mask_a = (
        jnp.zeros(t_len + 1, jnp.bool_).at[a_tiles].set(True, mode="drop")
    )[:t_len]
    mask_b = (
        jnp.zeros(t_len + 1, jnp.bool_).at[b_tiles].set(True, mode="drop")
    )[:t_len]
    # per-TILE tail chunk / segment role (the pair-block outputs are
    # indexed by chunk; the compose gathers them back to tile order)
    rank_tiles = jnp.where(valid_rank, ord_tiles, t_len)
    tailtab = jnp.zeros((t_len + 1, 2), jnp.int32).at[rank_tiles].set(
        jnp.stack([cid, role_b.astype(jnp.int32)], axis=-1), mode="drop"
    )[:t_len]
    tail_cid = jnp.minimum(tailtab[:, 0], nct - 1)
    tail_role = tailtab[:, 1]

    # ---- split gid stream (chunk-table gather, no K-sized scatter) -------
    ncall = nci + nct
    send_all = jnp.concatenate([ilim, send_t.astype(jnp.int32)])
    lim_all = jnp.concatenate([ilim, lim_t.astype(jnp.int32)])
    offa_all = jnp.concatenate(
        [isrc - c_idx * chunk, srca_t - (nci + ct_idx) * chunk]
    )
    offb_all = jnp.concatenate(
        [jnp.zeros(nci, jnp.int32),
         srcb_t - send_t - (nci + ct_idx) * chunk]
    )
    ctable = jnp.stack([send_all, lim_all, offa_all, offb_all], axis=-1)
    pos = jnp.arange(ncall * chunk, dtype=jnp.int32)
    crow = ctable.at[jax.lax.optimization_barrier(pos // chunk)].get(
        mode="promise_in_bounds"
    )
    crow = jax.lax.optimization_barrier(crow)
    rr = pos % chunk
    src = jnp.clip(
        pos + jnp.where(rr < crow[:, 0], crow[:, 2], crow[:, 3]), 0, k - 1
    )
    gid_split = jnp.where(
        rr < crow[:, 1],
        sorted_gid.at[jax.lax.optimization_barrier(src)].get(
            mode="promise_in_bounds"
        ),
        0,
    )

    used = (used_i + used_t) * chunk
    return BinnedSplit(
        sorted_gid=gid_split,
        chunk_meta=imeta,
        chunk_lim=ilim_packed,  # solo << 16 | lim (skip is structurally 0)
        chunk_blk=iblk,
        tmeta=tmeta,
        tsl=tsl,
        tbt=tbt,
        tblk=tblk,
        mask_int=mask_int,
        mask_a=mask_a,
        mask_b=mask_b,
        counts=counts,
        gid_hist=kept_hist,
        num_instances=total_kept,
        padded_total=used,
        overflow=(total > k)
        | (total_kept > ks)
        | (used_i > nci)
        | (used_t > nct),
        stream_rows=used,
        used_interior=used_i,
        used_tail=used_t,
        tail_cid=tail_cid,
        tail_role=tail_role,
    )


def bin_gaussians_csr(
    proj: Projected,
    cam: Camera,
    cfg: RasterConfig,
    opacities: jax.Array | None = None,
    depth_cap: jax.Array | None = None,
    tile_rank: jax.Array | None = None,
) -> BinnedCSR:
    """Chunk-aligned-window binning for the Pallas flat-chunk-grid kernels.

    ``depth_cap`` ((num_tiles,) f32) trims each tile's list at its measured
    saturation depth — see `_expand_instances`. ``tile_rank`` ((num_tiles,)
    int32, a permutation rank per tile — see `alignment_order`) reorders
    tile segments within the sorted stream to chunk-align window boundaries;
    the window/chunk bookkeeping below then runs in RANK space while
    `chunk_meta` and `counts` keep true tile ids, so the kernels and their
    output index maps are unchanged.

    ``cfg.layout == 'split'`` dispatches to `bin_gaussians_split` (the
    tile order is then internal; ``tile_rank`` is ignored).
    """
    if cfg.layout == "split":
        return bin_gaussians_split(proj, cam, cfg, opacities, depth_cap)
    chunk = cfg.chunk
    (
        sorted_tile, sorted_gid, sorted_slot, tile_id, total, num_tiles,
        total_kept, kept_hist, slot_off,
    ) = _expand_instances(
        proj, cam, cfg, opacities, carry_slot=cfg.reduction == "perm",
        depth_cap=depth_cap, tile_rank=tile_rank,
    )
    k = cfg.max_instances
    ks = cfg.max_stream or k  # post-cull stream capacity
    # default chunk capacity = the no-overflow worst case (every non-empty
    # tile adds at most one partially-foreign leading chunk); a measured
    # max_chunks shrinks the kernel grid and the reduction-sort length
    nc = cfg.max_chunks or (ks // chunk + num_tiles + 1)

    # Per-tile ranges from the SORTED keys: a 3k-query searchsorted over the
    # sorted 1M array is cheap (binary-search scan on few queries), unlike a
    # 1M-element scatter-add histogram (~17ms).
    tq = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tq, side="left").astype(jnp.int32)
    counts = tile_start[1:] - tile_start[:-1]
    starts = tile_start[:-1]
    # window base = segment start rounded DOWN to a chunk boundary; the
    # first skip0 rows of the first window belong to the previous tile.
    # EMPTY tiles still get one zero-lim chunk: its `first` step initializes
    # the tile's output blocks (color 0, T 1) so the caller needs no
    # `counts > 0` select over the outputs — those selects on the 8-lane
    # (T, 256, 8) layout cost more than the extra no-op grid steps.
    skip0 = starts % chunk
    aligned_blk = starts // chunk
    nchunks = jnp.where(counts > 0, (counts + skip0 + chunk - 1) // chunk, 1)
    chunk_off = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(nchunks)])
    used = chunk_off[-1]
    padded_total = used * chunk

    c_idx = jnp.arange(nc, dtype=jnp.int32)
    # `chunk_tile` is a RANK when tile_rank is given (the searchsorted
    # ranges above segment the rank-sorted stream); perm maps rank -> true
    # tile id for the kernel-facing metadata
    chunk_tile = jnp.repeat(
        jnp.arange(num_tiles, dtype=jnp.int32), nchunks, total_repeat_length=nc
    )
    # tail chunks (>= used) repeat the last tile id; lim = 0 there, so the
    # kernel skips them.
    in_use = c_idx < used
    nonempty = counts[chunk_tile] > 0
    local_chunk = c_idx - chunk_off[chunk_tile]
    blk = jnp.clip(aligned_blk[chunk_tile] + local_chunk, 0, ks // chunk)
    skip = jnp.where(
        in_use & nonempty & (local_chunk == 0), skip0[chunk_tile], 0
    )
    lim = jnp.clip(
        counts[chunk_tile] + skip0[chunk_tile] - local_chunk * chunk, 0, chunk
    )
    lim = jnp.where(in_use & nonempty, lim, 0)
    prev_tile = jnp.concatenate([jnp.full(1, -1, jnp.int32), chunk_tile[:-1]])
    first = ((chunk_tile != prev_tile) & in_use).astype(jnp.int32)
    if tile_rank is not None:
        _, perm = jax.lax.sort(
            (tile_rank.astype(jnp.int32),
             jnp.arange(num_tiles, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )  # perm[rank] = true tile id
        chunk_true = jnp.take(perm, chunk_tile)
        counts_true = jnp.take(counts, tile_rank)
    else:
        chunk_true = chunk_tile
        counts_true = counts
    chunk_meta = (chunk_true << 1) | first
    chunk_lim = (skip.astype(jnp.int32) << 16) | lim.astype(jnp.int32)

    slot_pos = None
    if cfg.reduction == "perm":
        # Grid-output column of each SORTED stream position p: position p
        # lands in chunk c = chunk_off[tile] + (p//chunk - aligned_blk[tile])
        # at window row p % chunk (windows are aligned blocks of the stream).
        # Inverting through the sort permutation (sorted_slot) gives each
        # pre-cull expansion slot its column — the backward's gradient gather
        # indices — with culled / out-of-capacity slots sent to the zero pad
        # column nc*chunk. All of this runs at BINNING time (amortized by
        # rebin_every); the per-iteration reduction is then sort-free.
        p = jnp.arange(k, dtype=jnp.int32)
        t_safe = jnp.clip(sorted_tile, 0, num_tiles - 1)
        ttable = jnp.stack([chunk_off[:-1], aligned_blk], axis=-1)  # (T, 2)
        trow = ttable[t_safe]  # (K, 2) row gather from the small tile table
        cpos = trow[:, 0] + (p // chunk - trow[:, 1])
        outcol = jnp.where(
            (sorted_tile < num_tiles) & (p < ks) & (cpos < used),
            jnp.minimum(cpos * chunk + p % chunk, nc * chunk),
            nc * chunk,
        )
        # invert the permutation with a 2-operand sort (a 1M element scatter
        # costs ~15 ns/elem on TPU; the sort is ~2 ms)
        _, slot_pos = jax.lax.sort(
            (sorted_slot, outcol), num_keys=1, is_stable=False
        )

    return BinnedCSR(
        sorted_gid=sorted_gid[:ks],
        chunk_blk=blk,
        chunk_meta=chunk_meta,
        chunk_lim=chunk_lim,
        counts=counts_true,
        gid_hist=kept_hist,
        num_instances=total_kept,
        padded_total=padded_total,
        # max_instances bounds the PRE-cull expansion slots (rect-based,
        # count_instances' metric); the snugger stream/chunk capacities are
        # overflow-checked on what actually survived
        overflow=(total > k) | (total_kept > ks) | (used > nc),
        slot_pos=slot_pos,
        slot_off=slot_off if cfg.reduction == "perm" else None,
    )


def bin_gaussians(
    proj: Projected,
    cam: Camera,
    cfg: RasterConfig,
    opacities: jax.Array | None = None,
) -> Binned:
    (
        sorted_tile, sorted_gid, _, tile_id, total, num_tiles, total_kept,
        _, _,
    ) = _expand_instances(proj, cam, cfg, opacities)
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
        bucket=bucket, counts=counts, num_instances=total_kept, overflow=overflow
    )
