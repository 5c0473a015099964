"""Pallas TPU rasterization kernels: flat-chunk-grid alpha compositing.

TPU-native re-expression of the reference CUDA render kernels
(`cuda_rasterizer/forward.cu:261-423` forward, `backward.cu:586-748` +
`backward.cu:850-1224` fused backward). The CUDA design — one 16x16 thread
block per tile, shared-memory staging, per-pixel sequential front-to-back
blending, atomicAdd gradient scatter — maps to TPU as:

  * work list   = the depth-sorted instance stream (binning.bin_gaussians_csr
                  sorts (tile, depth, gid) once); each tile's segment is
                  covered by chunk-ALIGNED windows of the stream, so ONE
                  Pallas grid step = one (tile, window) pair.
  * staging     = each grid step's window is a plain aligned block of the
                  sorted stream, delivered by the Pallas pipeline through a
                  scalar-prefetched BlockSpec index map (``chunk_blk``) with
                  automatic double buffering — the `__shared__` analog.
                  This replaces a padded-stream materialization whose
                  element gather cost ~6.5 ms at 1M instances (TPU gathers
                  are per-index bound); the up-to-chunk-1 foreign rows at a
                  tile's first window are masked via the per-chunk ``skip``.
  * blending    = the order-dependent transmittance recursion is evaluated
                  in closed form per chunk on the MXU: a triangular matmul
                  computes the cumulative sum of log(1 - alpha) along the
                  gaussian axis; per-tile running state (T with death in
                  its sign bit, color accumulator) lives in VMEM scratch
                  across grid steps.
  * scatter     = the backward kernel writes per-instance gradients densely
                  to a per-chunk output block (no write conflicts, no
                  atomics) WITH the owning gaussian id as a key row; the
                  instance->gaussian reduction is then one value-carrying
                  `lax.sort` by that key + cumsum-difference (sort cost is
                  ~flat in operand count on TPU, ~2.3 ms at 1M) — the
                  TPU-native replacement for CUDA's atomicAdd scatter
                  (SURVEY.md §7 hard-part #2).

The backward is a SINGLE front-to-back pass (unlike the CUDA back-to-front
replay): the suffix sums S_i = sum_{j>i} w_j (c_j . g) it needs are obtained
from the forward's saved color accumulator as total minus a running prefix,
which the same triangular matmul produces per chunk.

Numerical semantics (alpha cap/floor, T stop, median-depth crossing) match
`render_tiled.py`, the jnp oracle path; tests assert fwd and grad agreement,
and tools/tpu_parity_check.py asserts the same for the Mosaic-compiled
kernels on the real chip.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatam_tpu.render.geometry import (
    ALPHA_CAP,
    ALPHA_MIN,
    T_STOP,
    TILE,
)

# instance-stream row layout (attribute-major: chunk slices are lane-contiguous)
ROW_X, ROW_Y, ROW_CA, ROW_CB, ROW_CC, ROW_OP, ROW_DEPTH, ROW_GID = range(8)
ROW_FEAT0 = 8
NFEAT_PAD = 8  # feature rows padded to 8 (RGB=3 or RGB+depth/sil/z2=6)
ROWS = ROW_FEAT0 + NFEAT_PAD  # 16

NPIX = TILE * TILE  # 256 pixels per tile

# key value marking invalid (masked) rows in the gradient key row; must
# exceed any gaussian id (ids are exact in f32 up to 2^24)
BIG_KEY = 1e9
# "never saturated" sentinel for the aux saturation-depth row. FINITE on
# purpose: the backward reads per-pixel aux columns through one-hot matmuls
# that contract over all 8 aux rows, and 0 * inf = NaN would poison them.
# Converted to +inf at the RenderAux boundary (render_tiled.py).
SAT_INF = 1e30
# fisher kernel output: 16 moment rows + key row + pad to a sublane multiple
FKEY_ROW = 16
FROWS = 24


def _triangular(chunk: int, strict: bool = False) -> jax.Array:
    """(chunk, chunk) upper-triangular ones (bf16-exact): x @ tri is an
    inclusive cumsum of x along its last axis, computed on the MXU.
    ``strict`` zeroes the diagonal -> EXCLUSIVE cumsum (the transmittance
    scans use it to get t_before directly, saving the per-pair
    ``incl - log1m`` subtract)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return ((i < j) if strict else (i <= j)).astype(jnp.bfloat16)


def _cumprod_roll(one_minus: jax.Array, chunk: int):
    """Inclusive + exclusive cumprod along lanes via Hillis-Steele doubling.

    log2(chunk) lane rolls + masked multiplies replace the log1p -> MXU
    cumsum -> exp chain: the transmittance recursion runs in plain f32
    products with ZERO per-pair transcendentals (RasterConfig
    scan_impl='roll'; the alpha exp remains the kernels' only one). Each
    step multiplies by the neighbor product rolled ``k`` lanes right, with
    the wrapped head lanes forced to the identity.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (NPIX, chunk), 1)
    x = one_minus
    k = 1
    while k < chunk:
        x = x * jnp.where(lane < k, 1.0, pltpu.roll(x, k, 1))
        k *= 2
    excl = jnp.where(lane < 1, 1.0, pltpu.roll(x, 1, 1))
    return x, excl


def _chunk_transmittance(alpha, t_run, scan_impl, chunk, terms=3):
    """Per-chunk transmittance state shared by the fwd/bwd kernels.

    Returns (t_before, t_cum, live, new_t_run). 'mxu' evaluates the
    cumulative product in log space on the MXU (bf16-split cumsum with
    ``terms`` mantissa terms; one exp per pair); 'roll' evaluates
    it directly with lane-roll doubling (see _cumprod_roll). BOTH recover
    the live-masked carry as the minimum live t_cum: t_cum is monotone
    non-increasing along the chunk (exactly for 'roll'; to split-cumsum
    rounding for 'mxu') and every carried value stays >= T_STOP by the
    carry invariant, so min(live ? t_cum : t_run) recovers the product of
    live factors — one select + lane-min instead of the where/sum/exp chain
    (a transcendental per pair saved on the mxu path).

    The fwd and bwd render kernels BOTH call this with terms=2 (~16
    mantissa bits, worst-case |log T_STOP| * 2^-17 ~ 7e-5 relative
    transmittance error, inside the pinned 1e-4 p99.9 fwd parity), so the
    primal and the gradient differentiate the SAME recursion and the
    live/saturation set (t_cum >= T_STOP) cannot diverge between them.
    The fisher kernel keeps terms=3 (second moments square the error).

    The carry encodes pixel DEATH in its sign: alive pixels carry the
    live-masked transmittance (>= T_STOP by the carry invariant); once the
    full-chunk product falls below T_STOP the carry flips negative with
    unchanged magnitude (the pre-crossing product — the value the CUDA
    `done` early-out leaves in T, `forward.cu:314-328`). A negative carry
    propagates through t_before/t_cum, so `live = t_cum >= T_STOP` needs
    NO separate per-pixel dead mask (that mask cost a VMEM scratch plus
    per-pair mask arithmetic in every kernel); tile outputs report
    abs(t_run), and "any pixel alive" is max(t_run) > 0.
    """
    if scan_impl == "roll":
        one_minus = 1.0 - alpha
        _, excl = _cumprod_roll(one_minus, chunk)
        t_before = t_run * excl
        t_cum = t_before * one_minus
    else:
        # log(1-a), NOT log1p(-a): Mosaic's log1p costs ~80 ns per
        # (256, 128) block vs ~20 for log (tools/vpu_probe.py), and the
        # subtraction is safe here — alpha <= 0.99 keeps 1-alpha >= 0.01,
        # so the pre-log rounding is <= 6e-6 in log space (the pinned
        # fwd parity tolerance is 1e-4). STRICT triangular -> exclusive
        # cumsum = t_before directly (no per-pair incl - log1m subtract).
        log1m = jnp.log(1.0 - alpha)
        excl = _cumsum_mxu(log1m, _triangular(chunk, strict=True), terms)
        t_before = t_run * jnp.exp(excl)
        t_cum = t_before * (1.0 - alpha)
    live = t_cum >= T_STOP
    m = jnp.min(jnp.where(live, t_cum, t_run), axis=1, keepdims=True)
    new_t_run = jnp.where(t_cum[:, -1:] < T_STOP, -jnp.abs(m), m)
    return t_before, t_cum, live, new_t_run


def _cumsum_mxu(x: jax.Array, tri: jax.Array, terms: int = 3) -> jax.Array:
    """Inclusive cumsum along axis -1 via triangular matmul (MXU).

    The operand is split into ``terms`` bf16 mantissa terms (3 => ~24 bits,
    i.e. f32 accuracy) and multiplied against the EXACT 0/1 triangular
    matrix with f32 accumulation — 3 MXU passes where precision=HIGHEST
    would burn 6 (Mosaic does not support the 3-pass HIGH setting).
    DEFAULT (1-pass bf16) is NOT enough: ~8 mantissa bits => ~1%
    transmittance error. The render kernels use terms=2 (~16 bits,
    ~1e-5 relative — inside the pinned fwd 1e-4-p99.9 and gradient
    5e-5-of-scale pallas-vs-jnp parities); the fisher kernel keeps
    terms=3. Verified by tools/tpu_parity_check.py against the
    sequential-cumprod jnp oracle on the real chip.
    """

    def term(t):
        return jax.lax.dot_general(
            t, tri, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    x1 = x.astype(jnp.bfloat16)
    r1 = x - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    if terms == 2:  # render fwd+bwd (see _chunk_transmittance docstring)
        # NOT one batched (512, chunk) dot: the isolated probe says batching
        # wins (tools/step_overhead.py mxu512 179 ns vs mxu2dep 253 ns), but
        # in the real kernel the concat materializes both bf16 terms into a
        # fresh buffer and the bench REGRESSED 25.7 -> 24.5 Mpix/s (r4).
        return term(x1) + term(x2)
    x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    return (term(x1) + term(x2)) + term(x3)


def _pixel_coords(t, grid_x: int):
    """Global pixel centers of tile ``t`` as (NPIX, 1) f32 columns."""
    tx = t % grid_x
    ty = t // grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px = (tx * TILE + p % TILE).astype(jnp.float32)
    py = (ty * TILE + p // TILE).astype(jnp.float32)
    return px, py


# tile-local pixel-center offset: coordinates are centered on the tile so
# every operand of the MXU quadratic form stays O(tile size) — global pixel
# coords (~1200) squared would eat the bf16-split mantissa (see _power_mxu)
_HALF = (TILE - 1) / 2.0


def _split3(x: jax.Array, axis: int) -> jax.Array:
    """f32 -> 3 stacked bf16 terms along ``axis`` (~24 mantissa bits).

    bf16 x bf16 products are EXACT in f32 (8+8 mantissa bits), so a matmul
    of two 3-way splits with f32 accumulation reproduces the f32 x f32
    product to accumulation-rounding accuracy.
    """
    x1 = x.astype(jnp.bfloat16)
    r1 = x - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([x1, x2, x3], axis=axis)


def _split2(x: jax.Array, axis: int) -> jax.Array:
    """f32 -> 2 stacked bf16 terms along ``axis`` (~16 mantissa bits)."""
    x1 = x.astype(jnp.bfloat16)
    x2 = (x - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([x1, x2], axis=axis)


def _local_pixels():
    """Tile-local pixel-center columns (NPIX, 1): pxl, pyl in [-7.5, 7.5]."""
    p = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    pxl = (p % TILE).astype(jnp.float32) - _HALF
    pyl = (p // TILE).astype(jnp.float32) - _HALF
    return pxl, pyl


def _np_local_pixels():
    import numpy as np

    p = np.arange(NPIX)
    return (p % TILE - _HALF).astype(np.float32), (
        p // TILE - _HALF
    ).astype(np.float32)


def _np_split3(x):
    import numpy as np
    from jax import numpy as _  # noqa: F401

    import ml_dtypes

    x1 = x.astype(ml_dtypes.bfloat16)
    r1 = x - x1.astype(np.float32)
    x2 = r1.astype(ml_dtypes.bfloat16)
    x3 = (r1 - x2.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return x1, x2, x3


@functools.lru_cache(maxsize=1)
def _phi_pow_host():
    """(NPIX, 27) bf16 constant for the in-kernel power matmul.

    Columns: the quadratic pixel basis [pxl^2, pxl*pyl, pyl^2] split into 3
    bf16 mantissa terms P1/P2/P3 and laid out [P1 P1 P1 P2 P2 P2 P3 P3 P3],
    so that against a rhs tiled [Q1;Q2;Q3]x3 the contraction covers all 9
    split cross-products. Passed to the kernels as a broadcast INPUT — an
    in-kernel construction costs Mosaic concat relayouts every grid step.
    """
    import numpy as np

    pxl, pyl = _np_local_pixels()
    quad = np.stack([pxl * pxl, pxl * pyl, pyl * pyl], axis=1)  # (NPIX, 3)
    p1, p2, p3 = _np_split3(quad)
    return np.concatenate([p1, p1, p1, p2, p2, p2, p3, p3, p3], axis=1)


@functools.lru_cache(maxsize=1)
def _phi_mom_host():
    """(NPIX, 24) bf16 constant for the backward's moment matmul.

    Columns: the full monomial basis [1, pxl, pyl, pxl^2, pxl*pyl, pyl^2]
    split into 3 bf16 terms, each block zero-padded from 6 to 8 columns so
    the (24, 2*chunk) matmul output can be reduced with 8-sublane-aligned
    slice adds (no Mosaic relayout).
    """
    import numpy as np

    pxl, pyl = _np_local_pixels()
    basis = np.stack(
        [np.ones(NPIX, np.float32), pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl],
        axis=1,
    )  # (NPIX, 6)
    b1, b2, b3 = _np_split3(basis)
    z = np.zeros((NPIX, 2), b1.dtype)
    return np.concatenate([b1, z, b2, z, b3, z], axis=1)


@functools.lru_cache(maxsize=1)
def _phi_pm_host():
    """(2*NPIX, 27) bf16: power basis stacked over the moment basis.

    The bwd kernel's two constant inputs merged into one block (sublane
    concat — both slices sit at 8-aligned offsets, so the kernel reads
    them relayout-free). The moment basis is zero-padded 24 -> 27 columns;
    its consumers ignore rows 24-26 of the matmul output."""
    import numpy as np

    pow_b = _phi_pow_host()  # (NPIX, 27)
    mom_b = _phi_mom_host()  # (NPIX, 24)
    mom_pad = np.concatenate(
        [mom_b, np.zeros((NPIX, 3), mom_b.dtype)], axis=1
    )
    return np.concatenate([pow_b, mom_pad], axis=0)


def _phi_pm() -> jax.Array:
    return jnp.asarray(_phi_pm_host())


def _chunk_alpha_mxu(blk, phi27, t, skip, lim, chunk, grid_x):
    """Per-(pixel, gaussian) alpha for one (ROWS, chunk) window — MXU form.

    The exponent is a quadratic in pixel coordinates, so the whole
    (NPIX, chunk) `power` array is ONE matmul against the constant monomial
    basis: power[p, j] = phi(p) . q_j, with per-gaussian coefficients q_j
    read off the conic/mean rows in tile-LOCAL coordinates (operands stay
    O(tile), keeping the bf16-split product accurate to ~1e-5). This moves
    ~40% of the kernels' per-pair VPU arithmetic onto the otherwise-idle
    MXU — the TPU answer to the CUDA kernel's per-thread FMA chain
    (`forward.cu:336-341`).

    Returns (alpha, raw, epow, op_m, xl, yl, keep, grad_ok) — xl/yl are the
    per-instance (1, chunk) tile-local mean offsets the backward's moment
    recombination uses in place of per-pair dx/dy; op_m is the window-masked
    opacity row (the backward rebuilds dpower = dop * op_m from it).
    """
    x = blk[ROW_X : ROW_X + 1, :]
    y = blk[ROW_Y : ROW_Y + 1, :]
    ca = blk[ROW_CA : ROW_CA + 1, :]
    cb = blk[ROW_CB : ROW_CB + 1, :]
    cc = blk[ROW_CC : ROW_CC + 1, :]
    op = blk[ROW_OP : ROW_OP + 1, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    xl = x - ((t % grid_x) * TILE + _HALF).astype(jnp.float32)
    yl = y - ((t // grid_x) * TILE + _HALF).astype(jnp.float32)
    # power = -0.5 ca dx^2 - cb dx dy - 0.5 cc dy^2 with dx = xl - pxl,
    # expanded in the monomial basis [1, pxl, pyl, pxl^2, pxl pyl, pyl^2].
    # The QUADRATIC part goes to the MXU; the constant and linear parts are
    # evaluated per-pair on the VPU, because their coefficients reach
    # O(1000) for distant/anisotropic instances and MXU partial-sum
    # rounding scales with the largest TERM (1e-3 power error measured on
    # chip) while per-pair f32 incurs one rounding each — the same
    # association the jnp oracle and the CUDA reference use.
    q0 = -0.5 * (ca * xl * xl + cc * yl * yl) - cb * xl * yl
    q1 = ca * xl + cb * yl
    q2 = cc * yl + cb * xl
    qq = jnp.concatenate([-0.5 * ca, -cb, -0.5 * cc], axis=0)  # (3, chunk)
    # full split cross-product along the CONTRACTED dim: K = 3 basis x 3
    # lhs-splits x 3 rhs-splits = 27 (one MXU pass; K pads to 128 anyway).
    # phi27 is the constant [P1 P1 P1 P2 P2 P2 P3 P3 P3] basis INPUT
    # (_phi_pow_host); the rhs tiles its split stack 3x to pair with it.
    q27 = jnp.tile(_split3(qq, axis=0), (3, 1))  # (27, chunk) = [Q123 x3]
    quad = jax.lax.dot_general(
        phi27,
        q27,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    pxl, pyl = _local_pixels()
    power_raw = (quad + q0) + (q1 * pxl + q2 * pyl)
    # clamp (not drop) positive power — see reference.py: identical for PD
    # conics, robust to the matmul's ~1e-5 noise at near-mean pixels
    epow = jnp.exp(jnp.minimum(power_raw, 0.0))
    # window rows outside [skip, lim) belong to a neighboring tile; zeroing
    # the (1, chunk) opacity row masks them through raw/alpha/keep with no
    # per-pair mask arithmetic
    op_m = jnp.where((row >= skip) & (row < lim), op, 0.0)
    raw = op_m * epow
    alpha = jnp.minimum(ALPHA_CAP, raw)
    keep = alpha >= ALPHA_MIN
    alpha = jnp.where(keep, alpha, 0.0)
    # positions where the clamp engaged get no position/conic gradient
    # (mirrors XLA-AD of jnp.minimum(power, 0))
    grad_ok = power_raw <= 0.0
    return alpha, raw, epow, op_m, xl, yl, keep, grad_ok


def _chunk_alpha(blk, px, py, skip, lim, chunk):
    """Per-(pixel, gaussian) alpha for one (16, chunk) instance window.

    Valid rows are [skip, lim); rows outside belong to a neighboring tile's
    segment (window alignment) and are masked out.
    """
    x = blk[ROW_X : ROW_X + 1, :]
    y = blk[ROW_Y : ROW_Y + 1, :]
    ca = blk[ROW_CA : ROW_CA + 1, :]
    cb = blk[ROW_CB : ROW_CB + 1, :]
    cc = blk[ROW_CC : ROW_CC + 1, :]
    op = blk[ROW_OP : ROW_OP + 1, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    dx = x - px  # (NPIX, C)
    dy = y - py
    power_raw = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    # clamp (not drop) positive power — see reference.py
    epow = jnp.exp(jnp.minimum(power_raw, 0.0))
    op_m = jnp.where((row >= skip) & (row < lim), op, 0.0)
    raw = op_m * epow
    alpha = jnp.minimum(ALPHA_CAP, raw)
    keep = alpha >= ALPHA_MIN
    alpha = jnp.where(keep, alpha, 0.0)
    grad_ok = power_raw <= 0.0
    return alpha, raw, epow, dx, dy, keep, grad_ok


def _meta(meta_ref, lim_ref, c):
    m = meta_ref[c]
    sl = lim_ref[c]
    return m >> 1, m & 1, sl >> 16, sl & 0xFFFF  # tile, first, skip, lim


# ---------------------------------------------------------------------------
# SEGMENTED-chunk helpers: a chunk holding TWO tiles' rows (split-layout
# residue tails; columns [0, send) belong to tile A, [send, lim) to tile B)
# runs a boundary-restarted MXU transmittance scan and per-column tile
# frames. (The standalone 'packed' stream layout that first introduced
# these was deleted in r5 — a measured loser vs aligned for two rounds,
# PROFILE.md; the split layout composes the same segmented step with
# zero-waste interior chunks and won.)
# ---------------------------------------------------------------------------


def _seg_mask(send, chunk: int, strict: bool = False) -> jax.Array:
    """(chunk, chunk) bf16 SEGMENTED prefix mask: M[k, j] = 1 iff k
    contributes to column j's segment-local inclusive prefix sum — plain
    triangular for columns before the boundary, boundary-restarted after.
    x @ M is a segmented cumsum on the MXU (exact 0/1 operand). ``strict``
    zeroes the diagonal (segmented EXCLUSIVE cumsum — see _triangular)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri = (i < j) if strict else (i <= j)
    return (tri & ((j < send) | (i >= send))).astype(jnp.bfloat16)


def _chunk_transmittance_split(alpha, t_a, t_b, send, chunk, terms=2):
    """Segmented transmittance for SPLIT-layout tail chunks.

    Boundary-restarted segmented scan where BOTH segments continue existing
    recursions: columns [0, send) seed from ``t_a`` (tile A's interior-end
    carry, death in its sign) and columns [send, lim) from ``t_b``. Both
    segments END their tiles here (residues are final), so the returned
    states are the tiles' final transmittances. An EMPTY b segment
    (send == lim) returns ``t_b`` unchanged.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    cola = col < send
    log1m = jnp.log(1.0 - alpha)
    excl = _cumsum_mxu(log1m, _seg_mask(send, chunk, strict=True), terms)
    base = jnp.where(cola, t_a, t_b)
    t_before = base * jnp.exp(excl)
    t_cum = t_before * (1.0 - alpha)
    live = t_cum >= T_STOP
    big = jnp.float32(3.0e38)

    def _state(seg_mask, t_in):
        m = jnp.min(
            jnp.where(seg_mask, jnp.where(live, t_cum, t_in), big),
            axis=1, keepdims=True,
        )
        t_end = jnp.min(
            jnp.where(seg_mask, t_cum, big), axis=1, keepdims=True
        )
        return jnp.where(
            t_end >= big * 0.5,  # empty segment: state unchanged
            t_in,
            jnp.where(t_end < T_STOP, -jnp.abs(m), m),
        )

    return t_before, t_cum, live, _state(cola, t_a), _state(~cola, t_b)


def _chunk_alpha_seg(blk, phi27, stile, btile, send, lim, chunk, grid_x):
    """_chunk_alpha_mxu with PER-COLUMN tile origins (segmented chunks).

    Columns before ``send`` evaluate in stile's tile-local frame, the rest
    in btile's; valid rows are [0, lim) (segmented chunks have no skip)."""
    x = blk[ROW_X : ROW_X + 1, :]
    y = blk[ROW_Y : ROW_Y + 1, :]
    ca = blk[ROW_CA : ROW_CA + 1, :]
    cb = blk[ROW_CB : ROW_CB + 1, :]
    cc = blk[ROW_CC : ROW_CC + 1, :]
    op = blk[ROW_OP : ROW_OP + 1, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    cola = col < send

    def _orig(t):
        ox = ((t % grid_x) * TILE + _HALF).astype(jnp.float32)
        oy = ((t // grid_x) * TILE + _HALF).astype(jnp.float32)
        return ox, oy

    axo, ayo = _orig(stile)
    bxo, byo = _orig(btile)
    xl = x - jnp.where(cola, axo, bxo)
    yl = y - jnp.where(cola, ayo, byo)
    q0 = -0.5 * (ca * xl * xl + cc * yl * yl) - cb * xl * yl
    q1 = ca * xl + cb * yl
    q2 = cc * yl + cb * xl
    qq = jnp.concatenate([-0.5 * ca, -cb, -0.5 * cc], axis=0)
    q27 = jnp.tile(_split3(qq, axis=0), (3, 1))
    quad = jax.lax.dot_general(
        phi27, q27, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    pxl, pyl = _local_pixels()
    power_raw = (quad + q0) + (q1 * pxl + q2 * pyl)
    epow = jnp.exp(jnp.minimum(power_raw, 0.0))
    op_m = jnp.where(col < lim, op, 0.0)
    raw = op_m * epow
    alpha = jnp.minimum(ALPHA_CAP, raw)
    keep = alpha >= ALPHA_MIN
    alpha = jnp.where(keep, alpha, 0.0)
    grad_ok = power_raw <= 0.0
    return alpha, raw, epow, op_m, xl, yl, keep, grad_ok


def _is_last(meta_ref, c, nc):
    """1 iff chunk ``c`` is its tile's last: the next chunk starts a new tile
    (its ``first`` bit is set) or there is no next chunk. Lets the kernels
    write per-tile outputs once per tile instead of every grid step."""
    nxt = meta_ref[jnp.minimum(c + 1, nc - 1)]
    return jnp.where(c == nc - 1, 1, nxt & 1)


def _row_key(blk, skip, lim, chunk):
    """Reduction key per window row: the gaussian id for valid rows, BIG_KEY
    for masked/foreign rows (they then sort past every real gaussian).

    Valid rows MUST carry their real gid even in chunks the saturation
    early-exit skips (their gradient rows are zero): the sort reduction's
    segment boundaries come analytically from the binning histogram
    (gid_hist), so every surviving instance has to appear exactly once in
    the key row or every later gaussian's segment misaligns — early-exited
    chunks once wrote BIG_KEY here and silently corrupted all gradients on
    scenes with fully saturated tiles."""
    row = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    return jnp.where(
        (row >= skip) & (row < lim),
        blk[ROW_GID : ROW_GID + 1, :],
        BIG_KEY,
    )


def _fwd_kernel(
    meta_ref,  # scalar-prefetch (NC,) int32 packed tile<<1|first
    lim_ref,  # scalar-prefetch (NC,) int32 packed skip<<16|lim
    blk_ref,  # scalar-prefetch (NC,) int32 stream block index per chunk
    inst_ref,  # (ROWS, chunk) VMEM window of the sorted stream
    phi_ref,  # (NPIX, 27) bf16 constant power basis (_phi_pow_host)
    color_ref,  # (1, NFEAT_PAD, NPIX) block of the owning tile (channel-major)
    aux_ref,  # (1, 8, NPIX): row 0=median depth, row 1=final T, row 2=sat depth
    *rest,  # [carry_ref when emit_carry] + scratch (t_run, depth, alive, satd)
    grid_x: int,
    chunk: int,
    scan_impl: str = "mxu",
    need_depth: bool = True,
    emit_carry: bool = False,
):
    if emit_carry:
        # split-layout interior call: carry_ref is a (1, NPIX, 8) per-tile
        # HBM block handing the tile's end state to the tail call — lane 0 =
        # t_run (SIGNED, death encoding intact), lane 1 = median-depth
        # accumulator, lane 2 = saturation-depth candidate (broadcast).
        # PIXEL-major (lane-select write/read, no relayout); the tail call
        # consumes it DIRECTLY as tile-indexed input blocks so XLA never
        # touches the 16x-padded HBM layout (_carry_col docstring).
        carry_ref, t_run_sc, depth_sc, alive_sc, satd_sc = rest
    else:
        t_run_sc, depth_sc, alive_sc, satd_sc = rest
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    t, first, skip, lim = _meta(meta_ref, lim_ref, c)
    if emit_carry:
        # split interiors have skip == 0 always; the skip bits carry the
        # SOLO flag instead (tile has no tail residue -> the interior call
        # owns its aux; otherwise the tail call rewrites aux and only the
        # carry is read)
        solo, skip = skip, 0

    @pl.when(first == 1)
    def _():
        t_run_sc[:] = jnp.ones((NPIX, 1), jnp.float32)
        depth_sc[:] = jnp.zeros((NPIX, 1), jnp.float32)
        color_ref[0] = jnp.zeros((NFEAT_PAD, NPIX), jnp.float32)
        alive_sc[0] = 1
        satd_sc[0] = 0.0

    # early exit once the whole tile is saturated — the CUDA kernel's
    # per-block __syncthreads_count done-ballot (`forward.cu:314-328`)
    @pl.when((lim > skip) & (alive_sc[0] == 1))
    def _():
        blk = inst_ref[:]
        alpha, _, _, _, _, _, _, _ = _chunk_alpha_mxu(
            blk, phi_ref[:], t, skip, lim, chunk, grid_x
        )
        t_run = t_run_sc[:]

        # terms=2 (~16 mantissa bits): worst-case transmittance error is
        # |log T_STOP| * 2^-17 ~ 7e-5 relative, inside the pinned 1e-4
        # p99.9 fwd parity — and it makes the fwd and bwd recursions
        # IDENTICAL, so the live/saturation set (t_cum >= T_STOP) can no
        # longer differ between primal and gradient
        t_before, t_cum, live, new_t_run = _chunk_transmittance(
            alpha, t_run, scan_impl, chunk, terms=2
        )

        w = jnp.where(live, alpha * t_before, 0.0)
        feats = blk[ROW_FEAT0:, :]  # (NFEAT_PAD, C)
        # channel-major accumulation: (F, C) @ (C, P) — same MXU work as the
        # old (P, C) @ (C, F) but the output block needs no layout fix-up
        # downstream (8-lane-minor blocks cost ~1 ms per XLA-side op)
        color_ref[0] += jax.lax.dot_general(
            feats, w, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if need_depth:
            # T-crossing-0.5 median depth: ~5 per-pair VPU ops, skipped when
            # the caller's loss provably never reads aux row 0 (the SLAM
            # losses use the BLENDED depth channel — carry_depth=False)
            dep = blk[ROW_DEPTH : ROW_DEPTH + 1, :]
            crossing = (t_before > 0.5) & (t_cum < 0.5) & live
            depth_sc[:] += jnp.sum(
                jnp.where(crossing, dep, 0.0), axis=1, keepdims=True
            )
        t_run_sc[:] = new_t_run
        alive_sc[0] = (jnp.max(new_t_run) > 0.0).astype(jnp.int32)
        # stream is depth-sorted, so the max valid depth of the latest chunk
        # actually processed is the tile's running saturation-depth candidate
        row = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        dep_valid = jnp.where(
            (row >= skip) & (row < lim), blk[ROW_DEPTH : ROW_DEPTH + 1, :], 0.0
        )
        satd_sc[0] = jnp.max(dep_valid)

    # one aux write + one (NPIX, 2) transpose per TILE, not per step
    last = _is_last(meta_ref, c, nc)

    @pl.when(last == 1 if not emit_carry else (last == 1) & (solo == 1))
    def _():
        # abs: the carry's sign encodes death (_chunk_transmittance); the
        # reported final T is the pre-crossing magnitude either way
        dt = jnp.concatenate(
            [depth_sc[:], jnp.abs(t_run_sc[:])], axis=1
        ).T  # (2, NPIX)
        # row 2 = saturation depth cap: every instance deeper than this
        # contributed exactly nothing (all pixels dead before it was reached),
        # so the next (re)binning may drop deeper instances outright
        # (binning.py depth_cap). SAT_INF when the tile never saturated —
        # later instances could still contribute after parameter drift.
        sat = jnp.where(alive_sc[0] == 0, satd_sc[0], SAT_INF)
        aux_ref[0] = jnp.concatenate(
            [
                dt,
                jnp.full((1, NPIX), sat, jnp.float32),
                jnp.zeros((5, NPIX), jnp.float32),
            ],
            axis=0,
        )

    if emit_carry:
        # tiles WITH a tail residue: the tail call owns their aux; only the
        # carry is read. Lane selects, no relayout (see carry_ref comment).
        @pl.when((last == 1) & (solo == 0))
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 8), 1)
            carry_ref[0] = jnp.where(
                lane == 0,
                t_run_sc[:],
                jnp.where(
                    lane == 1,
                    depth_sc[:],
                    jnp.where(lane == 2, satd_sc[0], 0.0),
                ),
            )


def _dot_b2(a, b, dims):
    """2x2-term bf16-split dot_general at DEFAULT precision (~16-bit
    mantissa: three cross terms, the bf16xbf16 residual term is ~2^-16 and
    dropped) — 3 MXU passes where precision=HIGHEST burns 6. Used for the
    BACKWARD's small-K gradient matmuls (gc, gfeat), matching the
    gradient-side terms=2 cumsum precedent (_cumsum_mxu docstring): only
    gradients flow through them, and 16 mantissa bits sit inside the pinned
    5e-5-of-scale pallas-vs-jnp gradient parity. The PRIMAL color matmuls
    stay HIGHEST."""
    a1 = a.astype(jnp.bfloat16)
    ar = (a - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    b1 = b.astype(jnp.bfloat16)
    br = (b - b1.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return (d(a1, b1) + d(a1, br)) + d(ar, b1)


def _colx(block, row):
    """(NPIX, 1) column `row` of a channel-major (R, NPIX) block via a tiny
    one-hot matmul — a row -> column relayout would otherwise be a Mosaic
    transpose. The one-hot is EXACT in bf16, so a 2-term split of the block
    (~16-bit mantissa; every _colx consumer is gradient-side) runs 2 MXU
    passes where HIGHEST burns 6."""
    e = (
        jax.lax.broadcasted_iota(jnp.int32, (block.shape[0], 1), 0) == row
    ).astype(jnp.bfloat16)
    b1 = block.astype(jnp.bfloat16)
    br = (block - b1.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x):
        return jax.lax.dot_general(
            x, e, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return d(b1) + d(br)


def _carry_col(carr, j):
    """(NPIX, 1) lane ``j`` of a pixel-major (NPIX, 8) carry block —
    two VPU ops on a (256, 8) array, no relayout (split-layout carries).

    Why the carries stay pixel-major: the kernel state lives as (NPIX, 1)
    columns, so pixel-major writes/reads are lane selects. The catch is the
    HBM layout — a (T, NPIX, 8) array pads its 8-wide minor dim to 128
    lanes (16x inflation), so any XLA-side gather/select/copy on it costs
    ~1.6 ms (r5 on-chip profile; ~7 ms/iter total across the split
    compose). The fix is routing: carries flow pallas-to-pallas as
    tile-indexed input blocks of the tail calls, so XLA never materializes
    an op on them. (An identity-matmul channel-major conversion was tried
    first — its (8,8)-contraction form lowers to the very Mosaic relayout
    it tried to avoid, and the tail kernels got 1.2 us/step SLOWER.)"""
    lane = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 8), 1)
    return jnp.sum(jnp.where(lane == j, carr, 0.0), axis=1, keepdims=True)


def _ga_gdep_blocks(g_color, g_aux, color, aux):
    """(T, 16, NPIX) MERGED per-tile backward input, computed ONCE XLA-side:
    rows 0-7 = the upstream dL/d color block, row 8 = dL/d median depth,
    row 9 = ga (the per-pixel channel sum of rescolor * gcolor plus the
    final-T gradient term — the only combination the kernel's dalpha ever
    reads). One input block per grid step instead of three (gaux /
    rescolor / resaux, r3) and then two (gcolor + gadep, r4 start): the
    kernel-ablation probe (tools/kernel_ablate.py) measured ~80-160 ns of
    fixed per-step cost PER INPUT BLOCK at 7.7k grid steps."""
    ga = g_aux[:, 1, :] * aux[:, 1, :] + jnp.sum(
        color * g_color, axis=1
    )  # (T, NPIX)
    t = ga.shape[0]
    return jnp.concatenate(
        [
            g_color,
            g_aux[:, 0:1, :],
            ga[:, None, :],
            jnp.zeros((t, 6, NPIX), jnp.float32),
        ],
        axis=1,
    )


def _bwd_chunk_body(
    cabs,  # absolute chunk-table index of this sub-step
    col0,  # static column offset of this chunk in the output block
    meta_ref,
    lim_ref,
    phipm_ref,  # (2*NPIX, 27) bf16 merged power+moment basis (_phi_pm_host)
    gct_ref,  # (1, 16, NPIX) merged per-tile input (_ga_gdep_blocks):
    #           rows 0-7 upstream dL/d color, row 8 dL/d median depth,
    #           row 9 ga
    inst_ref,  # (ROWS, chunk) this chunk's stream window
    ginst_ref,  # (ROWS, >= col0 + chunk) output block
    t_run_sc,
    accwgc_sc,  # (NPIX, 1) scratch: running prefix of w * gc
    alive_sc,
    gdep_sc,  # (NPIX, 1) per-tile constant: dL/d median depth column
    ga_sc,  # (NPIX, 1) per-tile constant (see _ga_gdep_blocks)
    *,
    grid_x: int,
    chunk: int,
    scan_impl: str = "mxu",
    need_depth: bool = True,
    ignore_skip: bool = False,
):
    """One chunk's backward step — shared by the aligned kernel and the
    split-layout interior kernel. ``ignore_skip``: split-layout interior
    tables repurpose the skip bits as the SOLO flag (skip is structurally
    0 there). (A grouped G-chunks-per-step variant existed through r4 and
    measured NULL — per-step block DMAs are already hidden by Pallas's
    double buffering, PROFILE.md — so it was deleted.)"""
    t, first, skip, lim = _meta(meta_ref, lim_ref, cabs)
    if ignore_skip:
        skip = 0

    @pl.when(first == 1)
    def _():
        t_run_sc[:] = jnp.ones((NPIX, 1), jnp.float32)
        accwgc_sc[:] = jnp.zeros((NPIX, 1), jnp.float32)
        alive_sc[0] = 1
        if need_depth:
            gdep_sc[:] = _colx(gct_ref[0], 8)
        ga_sc[:] = _colx(gct_ref[0], 9)

    run = (lim > skip) & (alive_sc[0] == 1)

    @pl.when(jnp.logical_not(run))
    def _():
        # two static-slice ref stores — a jnp .at[].set here traces to a
        # scatter, which Mosaic cannot lower (interpret mode hides this)
        ginst_ref[:, col0 : col0 + chunk] = jnp.zeros(
            (ROWS, chunk), jnp.float32
        )
        ginst_ref[ROW_GID : ROW_GID + 1, col0 : col0 + chunk] = _row_key(
            inst_ref[:], skip, lim, chunk
        )

    @pl.when(run)
    def _():
        blk = inst_ref[:]
        alpha, raw, epow, op_m, xl, yl, keep, grad_ok = _chunk_alpha_mxu(
            blk, phipm_ref[0:NPIX, :], t, skip, lim, chunk, grid_x
        )
        t_run = t_run_sc[:]

        g_color = gct_ref[0, 0:NFEAT_PAD]  # (NFEAT_PAD, NPIX) channel-major
        ga = ga_sc[:]

        # terms=2 on both gradient-side cumsums: only gradients flow
        # through the backward, and 16 mantissa bits sit well inside the
        # pinned 5e-5-of-scale pallas-vs-jnp gradient parity
        tri = _triangular(chunk)
        t_before, t_cum, live, new_t_run = _chunk_transmittance(
            alpha, t_run, scan_impl, chunk, terms=2
        )
        w = jnp.where(live, alpha * t_before, 0.0)

        feats = blk[ROW_FEAT0:, :]  # (NFEAT_PAD, C)
        # gc[p, j] = sum_f g[f, p] * feat[f, j] — gradient-side, so the
        # 3-pass bf16x2 split replaces the 6-pass HIGHEST (_dot_b2)
        gc = _dot_b2(g_color, feats, (((0,), (0,)), ((), ())))
        # suffix sums: S[p, j] = sum over every instance after j of w * gc
        wgc = w * gc
        # suffix = (ga - accwgc) - cumsum: the per-tile constant and the
        # cross-chunk accumulator combine in ONE (NPIX, 1) column op instead
        # of a full-block add-then-subtract (one (NPIX, chunk) op saved)
        rem = ga - accwgc_sc[:]
        suffix = rem - _cumsum_mxu(wgc, tri, terms=2)

        # 1 - alpha >= 1 - ALPHA_CAP = 0.01 by the cap: no epsilon guard
        dalpha = jnp.where(
            live,
            t_before * gc - suffix / (1.0 - alpha),
            0.0,
        )
        # clamp gates: d alpha/d raw = 1 only below the 0.99 cap; `keep`
        # excludes masked contributors entirely; grad_ok gates the power
        # clamp (no position/conic gradient where power was clamped to 0).
        # dpower = dalpha * alpha on the unclamped & grad_ok set, rebuilt
        # from dop_int (= dalpha * epow there) times the opacity row —
        # one select cheaper than gating dalpha * alpha separately.
        unclamped = keep & (raw < ALPHA_CAP)
        dop_int = jnp.where(unclamped, dalpha * epow, 0.0)
        dpower = jnp.where(grad_ok, dop_int, 0.0) * op_m

        # The five position/conic gradient rows are pixel sums of
        # dpower * poly(pxl, pyl), so ONE moment matmul against the
        # constant monomial basis yields S_b[j] = sum_p phi_b(p) dpower[p,j]
        # and each row is a per-instance recombination — replacing five
        # (NPIX, chunk) reductions (and the per-pair dx/dy chains the CUDA
        # backward runs per thread, `backward.cu:586-748`) with MXU work.
        # contraction is over pixels, so splits ride the FREE dims and the
        # output is all 3x2 cross blocks; blocks are 8-sublane / chunk-lane
        # aligned, so the reduction is plain slice adds (no relayout). The
        # rhs uses a 2-way split (~16 mantissa bits — plenty against the
        # 2e-2 gradient agreement the two f32 formulations have anyway).
        mom24 = jax.lax.dot_general(
            phipm_ref[NPIX:, :],  # (NPIX, 27) moment basis (cols 24-26 zero)
            _split2(dpower, axis=1),  # (NPIX, 2*chunk)
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )  # (27, 2*chunk); rows 24-26 are zero padding
        mom = (
            (mom24[0:8, :chunk] + mom24[0:8, chunk:])
            + (mom24[8:16, :chunk] + mom24[8:16, chunk:])
            + (mom24[16:24, :chunk] + mom24[16:24, chunk:])
        )  # (8, chunk); rows 6-7 are basis padding (zero)
        s0, sx, sy, sxx, sxy, syy = (mom[i : i + 1, :] for i in range(6))

        ca = blk[ROW_CA : ROW_CA + 1, :]
        cb = blk[ROW_CB : ROW_CB + 1, :]
        cc = blk[ROW_CC : ROW_CC + 1, :]
        # sum_p dpower * dx = xl * s0 - sx (dx = xl - pxl), etc.
        sdx = xl * s0 - sx
        sdy = yl * s0 - sy
        sdxx = xl * xl * s0 - 2.0 * xl * sx + sxx
        sdxy = xl * yl * s0 - xl * sy - yl * sx + sxy
        sdyy = yl * yl * s0 - 2.0 * yl * sy + syy

        if need_depth:
            crossing = (t_before > 0.5) & (t_cum < 0.5) & live
            gdep_row = jnp.sum(
                jnp.where(crossing, gdep_sc[:], 0.0), axis=0, keepdims=True
            )
        else:
            # carry_depth=False: the loss has a structurally zero median-
            # depth cotangent, so the crossing math (~5 per-pair VPU ops)
            # is skipped outright
            gdep_row = jnp.zeros((1, chunk), jnp.float32)
        # rows in instance-stream order: X, Y, CA, CB, CC, OP, DEPTH, KEY
        grows = jnp.concatenate(
            [
                -(ca * sdx + cb * sdy),
                -(cc * sdy + cb * sdx),
                -0.5 * sdxx,
                -sdxy,
                -0.5 * sdyy,
                jnp.sum(dop_int, axis=0, keepdims=True),
                gdep_row,
                _row_key(blk, skip, lim, chunk),
            ],
            axis=0,
        )
        # dL/dfeat[f, j] = sum_p g[f, p] * w[p, j] (gradient-side: _dot_b2)
        gfeat = _dot_b2(g_color, w, (((1,), (0,)), ((), ())))  # (NFEAT_PAD, C)
        ginst_ref[:, col0 : col0 + chunk] = jnp.concatenate(
            [grows, gfeat], axis=0
        )

        t_run_sc[:] = new_t_run
        alive_sc[0] = (jnp.max(new_t_run) > 0.0).astype(jnp.int32)
        accwgc_sc[:] = accwgc_sc[:] + jnp.sum(wgc, axis=1, keepdims=True)


def _bwd_kernel(
    meta_ref,
    lim_ref,
    blk_ref,
    inst_ref,  # (ROWS, chunk)
    phipm_ref,  # (2*NPIX, 27) bf16 merged basis block
    gct_ref,  # (1, 16, NPIX) merged per-tile input
    ginst_ref,  # (ROWS, chunk) out: grads; row ROW_GID = reduction key
    t_run_sc,
    accwgc_sc,
    alive_sc,
    gdep_sc,
    ga_sc,
    *,
    grid_x: int,
    chunk: int,
    scan_impl: str = "mxu",
    need_depth: bool = True,
):
    c = pl.program_id(0)
    _bwd_chunk_body(
        c, 0, meta_ref, lim_ref, phipm_ref, gct_ref, inst_ref, ginst_ref,
        t_run_sc, accwgc_sc, alive_sc, gdep_sc, ga_sc,
        grid_x=grid_x, chunk=chunk, scan_impl=scan_impl,
        need_depth=need_depth,
    )


def _bwd_kernel_interior(
    meta_ref,
    lim_ref,
    blk_ref,
    inst_ref,
    phipm_ref,
    gct_ref,
    ginst_ref,
    carry_ref,  # (1, NPIX, 8) out (pixel-major, see _carry_col):
    #             lane 0 = t_run (signed), lane 1 = accwgc
    t_run_sc,
    accwgc_sc,
    alive_sc,
    gdep_sc,
    ga_sc,
    *,
    grid_x: int,
    chunk: int,
    scan_impl: str = "mxu",
    need_depth: bool = True,
):
    """Split-layout interior backward: the plain aligned step plus a
    per-tile carry write (the tail call seeds its segments from it). The
    carry is (1, NPIX, 8) pixel-major — lane 0 = t_run, lane 1 = accwgc —
    routed pallas-to-pallas (see _carry_col), and is skipped for SOLO
    tiles (no residue, nobody reads it)."""
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    solo = lim_ref[c] >> 16
    _bwd_chunk_body(
        c, 0, meta_ref, lim_ref, phipm_ref, gct_ref, inst_ref, ginst_ref,
        t_run_sc, accwgc_sc, alive_sc, gdep_sc, ga_sc,
        grid_x=grid_x, chunk=chunk, scan_impl=scan_impl,
        need_depth=need_depth, ignore_skip=True,
    )

    @pl.when((_is_last(meta_ref, c, nc) == 1) & (solo == 0))
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 8), 1)
        carry_ref[0] = jnp.where(
            lane == 0,
            t_run_sc[:],
            jnp.where(lane == 1, accwgc_sc[:], 0.0),
        )


def _fwd_kernel_tail(
    tmeta_ref,  # scalar-prefetch (NCt,) int32: tile_a << 1 | has_interior_a
    tsl_ref,  # scalar-prefetch (NCt,) int32: send << 16 | lim
    tbt_ref,  # scalar-prefetch (NCt,) int32: tile_b << 1 | has_interior_b
    tblk_ref,  # scalar-prefetch (NCt,) int32 stream block per chunk
    inst_ref,  # (ROWS, chunk) residue-pair stream chunk
    phi_ref,  # (NPIX, 27) bf16 power basis
    carra_ref,  # (1, NPIX, 8) segment A's interior fwd carry — a TILE-
    #             indexed block of the interior call's carry output, DMA'd
    #             directly (pallas-to-pallas; XLA never touches the
    #             16x-padded pixel-major array — _carry_col docstring).
    #             Garbage where has_interior_a == 0 (replaced by the
    #             initial state in-kernel).
    carrb_ref,  # (1, NPIX, 8) same for segment B (== A's tile when the
    #             chunk holds a single residue)
    colorp_ref,  # (1, 2, NFEAT_PAD, NPIX) out: both residue contributions
    auxp_ref,  # (1, 2, 8, NPIX) out: both tiles' FINAL aux (CHANNEL-major
    #            — lane-dense HBM blocks for the XLA-side per-tile gather;
    #            written via the aligned kernel's concat + (NPIX, 2).T
    #            form, one small Mosaic transpose per segment)
    *,
    grid_x: int,
    chunk: int,
    need_depth: bool = True,
):
    """Split-layout tail forward: one chunk = up to two tiles' FINAL
    residues, seeded from the interior call's carries. Each tile finishes
    here, so this writes final color contributions AND final aux for both
    segments. Per-step varying blocks are indexed BY CHUNK with the (A, B)
    pair in one block where XLA builds the operand (per-block DMA issue
    cost ~150 ns each, tools/kernel_ablate.py — 6 tile-indexed blocks/step
    dominated the first tail cut); the two CARRY blocks are the exception,
    tile-indexed on purpose so the pixel-major carry array flows
    pallas-to-pallas and XLA never pays its 16x-padded layout
    (_carry_col docstring). The compose gathers tiles back out with one
    (T,)-row gather per array. Pads (lim == 0) write nothing."""
    c = pl.program_id(0)
    ma = tmeta_ref[c]
    ta, hia = ma >> 1, ma & 1
    mb = tbt_ref[c]
    tb, hib = mb >> 1, mb & 1
    sl = tsl_ref[c]
    send, lim = sl >> 16, sl & 0xFFFF

    boundary = send < lim
    init_t = jnp.ones((NPIX, 1), jnp.float32)
    zero_c = jnp.zeros((NPIX, 1), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    dep_row = inst_ref[ROW_DEPTH : ROW_DEPTH + 1, :]
    dep_v = jnp.where(col < lim, dep_row, 0.0)

    def _aux_pm(t_in, has_carry, carr, state, d_seg, segdep_max):
        # CHANNEL-major (8, NPIX) final aux: row 0 = median-depth accum,
        # row 1 = final T, row 2 = sat depth — the lane-dense HBM layout
        # that keeps the XLA-side per-tile gather off the 16x-padded
        # pixel-major form (~1.6 ms/op there, r5 profile). Same
        # concat + (NPIX, 2).T form as the aligned kernel's per-tile aux
        # write; one small Mosaic transpose per segment.
        entry_alive = jnp.max(t_in) > 0.0
        satd_carry = jnp.max(
            jnp.where(has_carry == 1, _carry_col(carr, 2), zero_c)
        )
        cand = jnp.where(entry_alive, segdep_max, satd_carry)
        sat = jnp.where(jnp.max(state) > 0.0, SAT_INF, cand)
        dt = jnp.concatenate([d_seg, jnp.abs(state)], axis=1).T  # (2, NPIX)
        return jnp.concatenate(
            [
                dt,
                jnp.full((1, NPIX), sat, jnp.float32),
                jnp.zeros((5, NPIX), jnp.float32),
            ],
            axis=0,
        )

    # single-residue chunk (~half the tail): the aligned step's math — one
    # color matmul, plain triangular scan — seeded from the carry
    @pl.when((lim > 0) & jnp.logical_not(boundary))
    def _():
        blk = inst_ref[:]
        alpha, _, _, _, _, _, _, _ = _chunk_alpha_mxu(
            blk, phi_ref[:], ta, 0, lim, chunk, grid_x
        )
        carr_a = carra_ref[0]
        t_a = jnp.where(hia == 1, _carry_col(carr_a, 0), init_t)
        t_before, t_cum, live, state_a = _chunk_transmittance(
            alpha, t_a, "mxu", chunk, terms=2
        )
        w = jnp.where(live, alpha * t_before, 0.0)
        feats = blk[ROW_FEAT0:, :]
        colorp_ref[0, 0] = jax.lax.dot_general(
            feats, w, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if need_depth:
            d_a = jnp.where(hia == 1, _carry_col(carr_a, 1), zero_c)
            crossing = (t_before > 0.5) & (t_cum < 0.5) & live
            d_a = d_a + jnp.sum(
                jnp.where(crossing, dep_row, 0.0), axis=1, keepdims=True
            )
        else:
            d_a = zero_c
        auxp_ref[0, 0] = _aux_pm(
            t_a, hia, carr_a, state_a, d_a, jnp.max(dep_v)
        )
        # the B halves stay untouched: no tile gathers role B from a
        # single-residue chunk

    # two-residue chunk: segmented scan, both tiles finalize here
    @pl.when((lim > 0) & boundary)
    def _():
        blk = inst_ref[:]
        alpha, _, _, _, _, _, _, _ = _chunk_alpha_seg(
            blk, phi_ref[:], ta, tb, send, lim, chunk, grid_x
        )
        carr_a = carra_ref[0]
        carr_b = carrb_ref[0]
        t_a = jnp.where(hia == 1, _carry_col(carr_a, 0), init_t)
        t_b = jnp.where(hib == 1, _carry_col(carr_b, 0), init_t)
        t_before, t_cum, live, state_a, state_b = (
            _chunk_transmittance_split(alpha, t_a, t_b, send, chunk, terms=2)
        )
        cola = col < send
        w = jnp.where(live, alpha * t_before, 0.0)
        wa = jnp.where(cola, w, 0.0)
        wb = w - wa
        feats = blk[ROW_FEAT0:, :]
        colorp_ref[0, 0] = jax.lax.dot_general(
            feats, wa, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        colorp_ref[0, 1] = jax.lax.dot_general(
            feats, wb, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if need_depth:
            d_a = jnp.where(hia == 1, _carry_col(carr_a, 1), zero_c)
            d_b = jnp.where(hib == 1, _carry_col(carr_b, 1), zero_c)
            crossing = (t_before > 0.5) & (t_cum < 0.5) & live
            cdep = jnp.where(crossing, dep_row, 0.0)
            d_a = d_a + jnp.sum(
                jnp.where(cola, cdep, 0.0), axis=1, keepdims=True
            )
            d_b = d_b + jnp.sum(
                jnp.where(cola, 0.0, cdep), axis=1, keepdims=True
            )
        else:
            d_a = d_b = zero_c
        auxp_ref[0, 0] = _aux_pm(
            t_a, hia, carr_a, state_a, d_a,
            jnp.max(jnp.where(cola, dep_v, 0.0)),
        )
        auxp_ref[0, 1] = _aux_pm(
            t_b, hib, carr_b, state_b, d_b,
            jnp.max(jnp.where(cola, 0.0, dep_v)),
        )


def _bwd_kernel_tail(
    tmeta_ref,
    tsl_ref,
    tbt_ref,
    tblk_ref,
    inst_ref,  # (ROWS, chunk)
    phipm_ref,  # (2*NPIX, 27) merged power+moment basis
    gcp_ref,  # (1, 2, 16, NPIX) BOTH tiles' backward inputs, gathered per
    #           chunk XLA-side (per-block DMA cost — see _fwd_kernel_tail)
    carra_ref,  # (1, NPIX, 8) segment A's interior BWD carry (pixel-major,
    #             tile-indexed pallas-to-pallas block — _carry_col
    #             docstring; lane 0 = t_run, lane 1 = accwgc)
    carrb_ref,  # (1, NPIX, 8) same for segment B
    ginst_ref,  # (ROWS, chunk) out: gradient rows; ROW_GID = reduction key
    *,
    grid_x: int,
    chunk: int,
    need_depth: bool = True,
):
    """Split-layout tail backward: segmented two-tile step seeded from the
    interior backward's carries (segmented two-tile analog of _bwd_chunk_body)."""
    c = pl.program_id(0)
    ma = tmeta_ref[c]
    ta, hia = ma >> 1, ma & 1
    mb = tbt_ref[c]
    tb, hib = mb >> 1, mb & 1
    sl = tsl_ref[c]
    send, lim = sl >> 16, sl & 0xFFFF

    @pl.when(lim == 0)
    def _():
        ginst_ref[:] = jnp.zeros((ROWS, chunk), jnp.float32)
        ginst_ref[ROW_GID : ROW_GID + 1, :] = jnp.full(
            (1, chunk), BIG_KEY, jnp.float32
        )

    boundary = send < lim
    init_t = jnp.ones((NPIX, 1), jnp.float32)
    zero_c = jnp.zeros((NPIX, 1), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def _rows_out(blk, xl, yl, dop_int, dpower, gdep_row, gfeat):
        # shared moment-matmul gradient-row assembly (see _bwd_chunk_body)
        mom24 = jax.lax.dot_general(
            phipm_ref[NPIX:, :],
            _split2(dpower, axis=1),
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        mom = (
            (mom24[0:8, :chunk] + mom24[0:8, chunk:])
            + (mom24[8:16, :chunk] + mom24[8:16, chunk:])
            + (mom24[16:24, :chunk] + mom24[16:24, chunk:])
        )
        s0, sx, sy, sxx, sxy, syy = (mom[i : i + 1, :] for i in range(6))
        ca = blk[ROW_CA : ROW_CA + 1, :]
        cb = blk[ROW_CB : ROW_CB + 1, :]
        cc = blk[ROW_CC : ROW_CC + 1, :]
        sdx = xl * s0 - sx
        sdy = yl * s0 - sy
        sdxx = xl * xl * s0 - 2.0 * xl * sx + sxx
        sdxy = xl * yl * s0 - xl * sy - yl * sx + sxy
        sdyy = yl * yl * s0 - 2.0 * yl * sy + syy
        grows = jnp.concatenate(
            [
                -(ca * sdx + cb * sdy),
                -(cc * sdy + cb * sdx),
                -0.5 * sdxx,
                -sdxy,
                -0.5 * sdyy,
                jnp.sum(dop_int, axis=0, keepdims=True),
                gdep_row,
                _row_key(blk, 0, lim, chunk),
            ],
            axis=0,
        )
        ginst_ref[:] = jnp.concatenate([grows, gfeat], axis=0)

    # single-residue chunk: the aligned step's math seeded from the carry
    @pl.when((lim > 0) & jnp.logical_not(boundary))
    def _():
        blk = inst_ref[:]
        alpha, raw, epow, op_m, xl, yl, keep, grad_ok = _chunk_alpha_mxu(
            blk, phipm_ref[0:NPIX, :], ta, 0, lim, chunk, grid_x
        )
        carr_a = carra_ref[0]
        t_a = jnp.where(hia == 1, _carry_col(carr_a, 0), init_t)
        acc_a = jnp.where(hia == 1, _carry_col(carr_a, 1), zero_c)
        t_before, t_cum, live, _ = _chunk_transmittance(
            alpha, t_a, "mxu", chunk, terms=2
        )
        w = jnp.where(live, alpha * t_before, 0.0)
        g_color_a = gcp_ref[0, 0, 0:NFEAT_PAD]
        feats = blk[ROW_FEAT0:, :]
        gc = _dot_b2(g_color_a, feats, (((0,), (0,)), ((), ())))
        wgc = w * gc
        rem = _colx(gcp_ref[0, 0], 9) - acc_a
        suffix = rem - _cumsum_mxu(wgc, _triangular(chunk), terms=2)
        dalpha = jnp.where(
            live, t_before * gc - suffix / (1.0 - alpha), 0.0
        )
        unclamped = keep & (raw < ALPHA_CAP)
        dop_int = jnp.where(unclamped, dalpha * epow, 0.0)
        dpower = jnp.where(grad_ok, dop_int, 0.0) * op_m
        if need_depth:
            crossing = (t_before > 0.5) & (t_cum < 0.5) & live
            gdep_row = jnp.sum(
                jnp.where(crossing, _colx(gcp_ref[0, 0], 8), 0.0),
                axis=0, keepdims=True,
            )
        else:
            gdep_row = jnp.zeros((1, chunk), jnp.float32)
        gfeat = _dot_b2(g_color_a, w, (((1,), (0,)), ((), ())))
        _rows_out(blk, xl, yl, dop_int, dpower, gdep_row, gfeat)

    # two-residue chunk: segmented scan, per-column tile constants
    @pl.when((lim > 0) & boundary)
    def _():
        blk = inst_ref[:]
        alpha, raw, epow, op_m, xl, yl, keep, grad_ok = _chunk_alpha_seg(
            blk, phipm_ref[0:NPIX, :], ta, tb, send, lim, chunk, grid_x
        )
        carr_a = carra_ref[0]
        carr_b = carrb_ref[0]
        t_a = jnp.where(hia == 1, _carry_col(carr_a, 0), init_t)
        t_b = jnp.where(hib == 1, _carry_col(carr_b, 0), init_t)
        acc_a = jnp.where(hia == 1, _carry_col(carr_a, 1), zero_c)
        acc_b = jnp.where(hib == 1, _carry_col(carr_b, 1), zero_c)
        t_before, t_cum, live, _, _ = _chunk_transmittance_split(
            alpha, t_a, t_b, send, chunk, terms=2
        )
        cola = col < send
        w = jnp.where(live, alpha * t_before, 0.0)

        g_color_a = gcp_ref[0, 0, 0:NFEAT_PAD]
        g_color_b = gcp_ref[0, 1, 0:NFEAT_PAD]
        feats = blk[ROW_FEAT0:, :]
        gc_a = _dot_b2(g_color_a, feats, (((0,), (0,)), ((), ())))
        gc_b = _dot_b2(g_color_b, feats, (((0,), (0,)), ((), ())))
        gc = jnp.where(cola, gc_a, gc_b)
        wgc = w * gc
        ga_a = _colx(gcp_ref[0, 0], 9)
        ga_b = _colx(gcp_ref[0, 1], 9)
        rem = jnp.where(cola, ga_a - acc_a, ga_b - acc_b)
        suffix = rem - _cumsum_mxu(wgc, _seg_mask(send, chunk), terms=2)

        dalpha = jnp.where(
            live,
            t_before * gc - suffix / (1.0 - alpha),
            0.0,
        )
        unclamped = keep & (raw < ALPHA_CAP)
        dop_int = jnp.where(unclamped, dalpha * epow, 0.0)
        dpower = jnp.where(grad_ok, dop_int, 0.0) * op_m

        if need_depth:
            gdep = jnp.where(
                cola, _colx(gcp_ref[0, 0], 8), _colx(gcp_ref[0, 1], 8)
            )
            crossing = (t_before > 0.5) & (t_cum < 0.5) & live
            gdep_row = jnp.sum(
                jnp.where(crossing, gdep, 0.0), axis=0, keepdims=True
            )
        else:
            gdep_row = jnp.zeros((1, chunk), jnp.float32)

        wa = jnp.where(cola, w, 0.0)
        wb = w - wa
        gfeat = _dot_b2(g_color_a, wa, (((1,), (0,)), ((), ()))) + _dot_b2(
            g_color_b, wb, (((1,), (0,)), ((), ()))
        )
        _rows_out(blk, xl, yl, dop_int, dpower, gdep_row, gfeat)


def _fisher_chunk_body(
    cabs,  # absolute chunk-table index of this sub-step
    col0,  # static column offset in the output block
    meta_ref,
    lim_ref,
    inst_ref,  # (ROWS, chunk)
    gct_ref,  # (1, 16, NPIX) merged per-tile input: rows 0-7 = seed
    #           dL/d color (e.g. 1e-3 on RGB), row 8 = gtot (the per-pixel
    #           channel sum of rescolor * seed, precomputed XLA-side) —
    #           one block instead of three (kernel_ablate: per-input-block
    #           fixed cost; the old resaux block was entirely unused)
    fish_ref,  # (FROWS, chunk) out: 15 moments + sum dop^2 + key row
    t_run_sc,
    accwgc_sc,
    alive_sc,
    gtot_sc,  # (NPIX, 1) per-tile constant: sum_f rescolor * gcolor
    *,
    grid_x: int,
    chunk: int,
):
    """Per-instance SQUARED per-pixel gradient moments (diagonal Fisher).

    The reference's fused `backward_power=2` kernel accumulates
    `atomicAdd(powf(grad, 2))` per (pixel, gaussian) pair for every
    parameter (`backward.cu:1093-1137`). Here: for the screen-space
    quantities v = (d/dx, d/dy, d/dconic_a, d/dconic_b, d/dconic_c) the
    kernel emits the per-pixel second-moment matrix M = sum_p v v^T (15
    unique entries) so the caller can push the square through the
    per-gaussian projection Jacobian J exactly: Fisher(mean3D)_d =
    (J^T M J)_dd, and for opacity it emits sum_p (dalpha * e^power)^2
    directly. This equals the CUDA per-pixel chain because J is
    per-gaussian, not per-pixel.
    """
    t, first, skip, lim = _meta(meta_ref, lim_ref, cabs)

    @pl.when(first == 1)
    def _():
        t_run_sc[:] = jnp.ones((NPIX, 1), jnp.float32)
        accwgc_sc[:] = jnp.zeros((NPIX, 1), jnp.float32)
        alive_sc[0] = 1
        gtot_sc[:] = _colx(gct_ref[0], 8)  # per-tile constant

    run = (lim > skip) & (alive_sc[0] == 1)

    @pl.when(jnp.logical_not(run))
    def _():
        # static-slice ref stores, not .at[].set — see _bwd_chunk_body
        fish_ref[:, col0 : col0 + chunk] = jnp.zeros(
            (FROWS, chunk), jnp.float32
        )
        fish_ref[FKEY_ROW : FKEY_ROW + 1, col0 : col0 + chunk] = _row_key(
            inst_ref[:], skip, lim, chunk
        )

    @pl.when(run)
    def _():
        px, py = _pixel_coords(t, grid_x)
        blk = inst_ref[:]
        alpha, raw, epow, dx, dy, keep, grad_ok = _chunk_alpha(
            blk, px, py, skip, lim, chunk
        )
        t_run = t_run_sc[:]

        g_color = gct_ref[0, 0:NFEAT_PAD]  # (NFEAT_PAD, NPIX)
        gtot = gtot_sc[:]

        tri = _triangular(chunk)
        t_before, t_cum, live, new_t_run = _chunk_transmittance(
            alpha, t_run, "mxu", chunk
        )
        w = jnp.where(live, alpha * t_before, 0.0)

        feats = blk[ROW_FEAT0:, :]
        # HIGHEST on purpose (unlike the render bwd's _dot_b2): the fisher
        # tests pin capacity-shape invariance at 1e-6 of scale, and the
        # bf16x2 split's truncation is chunk-partition-dependent
        gc = jax.lax.dot_general(
            g_color, feats, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        wgc = w * gc
        # (gtot - accwgc) folds to one (NPIX, 1) column op — see _bwd_kernel
        suffix = (gtot - accwgc_sc[:]) - _cumsum_mxu(wgc, tri)

        dalpha = jnp.where(
            live, t_before * gc - suffix / (1.0 - alpha), 0.0
        )
        unclamped = keep & (raw < ALPHA_CAP)
        dop = jnp.where(unclamped, dalpha * epow, 0.0)
        dpower = jnp.where(unclamped & grad_ok, dalpha * alpha, 0.0)

        ca = blk[ROW_CA : ROW_CA + 1, :]
        cb = blk[ROW_CB : ROW_CB + 1, :]
        cc = blk[ROW_CC : ROW_CC + 1, :]
        v = (
            dpower * -(ca * dx + cb * dy),  # d/dx
            dpower * -(cc * dy + cb * dx),  # d/dy
            dpower * (-0.5 * dx * dx),  # d/dconic_a
            dpower * (-dx * dy),  # d/dconic_b
            dpower * (-0.5 * dy * dy),  # d/dconic_c
        )

        def rsum(x):
            return jnp.sum(x, axis=0, keepdims=True)

        moments = [rsum(v[a] * v[b]) for a in range(5) for b in range(a, 5)]
        fish_ref[:, col0 : col0 + chunk] = jnp.concatenate(
            moments
            + [
                rsum(dop * dop),
                _row_key(blk, skip, lim, chunk),
                jnp.zeros((FROWS - 17, chunk), jnp.float32),
            ],
            axis=0,
        )

        t_run_sc[:] = new_t_run
        alive_sc[0] = (jnp.max(new_t_run) > 0.0).astype(jnp.int32)
        accwgc_sc[:] = accwgc_sc[:] + jnp.sum(wgc, axis=1, keepdims=True)




def _fisher_kernel(
    meta_ref, lim_ref, blk_ref, inst_ref, gct_ref, fish_ref,
    t_run_sc, accwgc_sc, alive_sc, gtot_sc, *, grid_x: int, chunk: int,
):
    c = pl.program_id(0)
    _fisher_chunk_body(
        c, 0, meta_ref, lim_ref, inst_ref, gct_ref, fish_ref,
        t_run_sc, accwgc_sc, alive_sc, gtot_sc, grid_x=grid_x, chunk=chunk,
    )


def _common_scratch():
    # t_run (sign = death), one per-kernel (NPIX, 1) accumulator, alive flag
    return [
        pltpu.VMEM((NPIX, 1), jnp.float32),
        pltpu.VMEM((NPIX, 1), jnp.float32),
        pltpu.SMEM((1,), jnp.int32),
    ]


def _tile_of(c, meta, lim, blk):
    return (meta[c] >> 1, 0, 0)


def _stream_spec(chunk):
    return pl.BlockSpec((ROWS, chunk), lambda c, meta, lim, blk: (0, blk[c]))


def _const_spec(cols):
    """Broadcast input: the same (NPIX, cols) block at every grid step."""
    return pl.BlockSpec((NPIX, cols), lambda c, meta, lim, blk: (0, 0))


def _out_chunk_spec(rows, chunk):
    return pl.BlockSpec((rows, chunk), lambda c, meta, lim, blk: (0, c))


@functools.lru_cache(maxsize=32)
def _make_fwd_call(nc, num_tiles, grid_x, chunk, interpret, scan_impl="mxu",
                   need_depth=True):
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, grid_x=grid_x, chunk=chunk, scan_impl=scan_impl,
            need_depth=need_depth,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nc,),
            in_specs=[_stream_spec(chunk), _const_spec(27)],
            out_specs=[
                pl.BlockSpec((1, NFEAT_PAD, NPIX), _tile_of),
                pl.BlockSpec((1, 8, NPIX), _tile_of),
            ],
            scratch_shapes=_common_scratch()
            + [pltpu.SMEM((1,), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, NFEAT_PAD, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, NPIX), jnp.float32),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _make_bwd_call(nc, num_tiles, grid_x, chunk, interpret, scan_impl="mxu",
                   need_depth=True):
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, grid_x=grid_x, chunk=chunk, scan_impl=scan_impl,
            need_depth=need_depth,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nc,),
            in_specs=[
                _stream_spec(chunk),
                pl.BlockSpec(
                    (2 * NPIX, 27), lambda c, meta, lim, blk: (0, 0)
                ),
                pl.BlockSpec((1, 16, NPIX), _tile_of),
            ],
            out_specs=[_out_chunk_spec(ROWS, chunk)],
            scratch_shapes=_common_scratch()
            + [pltpu.VMEM((NPIX, 1), jnp.float32)] * 2,
        ),
        out_shape=[jax.ShapeDtypeStruct((ROWS, nc * chunk), jnp.float32)],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _make_fwd_call_split_int(nci, num_tiles, grid_x, chunk, interpret,
                             scan_impl="mxu", need_depth=True):
    """Interior fwd call: the aligned kernel + a per-tile carry output."""
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, grid_x=grid_x, chunk=chunk, scan_impl=scan_impl,
            need_depth=need_depth, emit_carry=True,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nci,),
            in_specs=[_stream_spec(chunk), _const_spec(27)],
            out_specs=[
                pl.BlockSpec((1, NFEAT_PAD, NPIX), _tile_of),
                pl.BlockSpec((1, 8, NPIX), _tile_of),
                pl.BlockSpec((1, NPIX, 8), _tile_of),
            ],
            scratch_shapes=_common_scratch()
            + [pltpu.SMEM((1,), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, NFEAT_PAD, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, NPIX, 8), jnp.float32),
        ],
        interpret=interpret,
    )


def _pair_spec(*dims):
    """Per-CHUNK pair block (A and B halves in one DMA)."""
    nd = len(dims)
    return pl.BlockSpec(
        (1, 2) + dims,
        lambda c, tmeta, tsl, tbt, tblk: (c, 0) + (0,) * nd,
    )


def _carr_spec_a():
    """Segment A's (1, NPIX, 8) carry block, tile-indexed: the pixel-major
    carry array flows interior-call -> tail-call without any XLA op on its
    16x-padded HBM layout (_carry_col docstring)."""
    return pl.BlockSpec(
        (1, NPIX, 8), lambda c, tmeta, tsl, tbt, tblk: (tmeta[c] >> 1, 0, 0)
    )


def _carr_spec_b():
    return pl.BlockSpec(
        (1, NPIX, 8), lambda c, tmeta, tsl, tbt, tblk: (tbt[c] >> 1, 0, 0)
    )


@functools.lru_cache(maxsize=32)
def _make_fwd_call_tail(nct, num_tiles, grid_x, chunk, interpret,
                        need_depth=True):
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_tail, grid_x=grid_x, chunk=chunk,
            need_depth=need_depth,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nct,),
            in_specs=[
                pl.BlockSpec(
                    (ROWS, chunk),
                    lambda c, tmeta, tsl, tbt, tblk: (0, tblk[c]),
                ),
                pl.BlockSpec(
                    (NPIX, 27), lambda c, tmeta, tsl, tbt, tblk: (0, 0)
                ),
                _carr_spec_a(),
                _carr_spec_b(),
            ],
            out_specs=[
                _pair_spec(NFEAT_PAD, NPIX),
                _pair_spec(8, NPIX),
            ],
            scratch_shapes=[],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nct, 2, NFEAT_PAD, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((nct, 2, 8, NPIX), jnp.float32),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _make_bwd_call_split_int(nci, num_tiles, grid_x, chunk, interpret,
                             scan_impl="mxu", need_depth=True):
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_interior, grid_x=grid_x, chunk=chunk,
            scan_impl=scan_impl, need_depth=need_depth,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nci,),
            in_specs=[
                _stream_spec(chunk),
                pl.BlockSpec(
                    (2 * NPIX, 27), lambda c, meta, lim, blk: (0, 0)
                ),
                pl.BlockSpec((1, 16, NPIX), _tile_of),
            ],
            out_specs=[
                _out_chunk_spec(ROWS, chunk),
                pl.BlockSpec((1, NPIX, 8), _tile_of),
            ],
            scratch_shapes=_common_scratch()
            + [pltpu.VMEM((NPIX, 1), jnp.float32)] * 2,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, nci * chunk), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, NPIX, 8), jnp.float32),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _make_bwd_call_tail(nct, num_tiles, grid_x, chunk, interpret,
                        need_depth=True):
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_tail, grid_x=grid_x, chunk=chunk,
            need_depth=need_depth,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nct,),
            in_specs=[
                pl.BlockSpec(
                    (ROWS, chunk),
                    lambda c, tmeta, tsl, tbt, tblk: (0, tblk[c]),
                ),
                pl.BlockSpec(
                    (2 * NPIX, 27),
                    lambda c, tmeta, tsl, tbt, tblk: (0, 0),
                ),
                _pair_spec(16, NPIX),
                _carr_spec_a(),
                _carr_spec_b(),
            ],
            out_specs=[
                pl.BlockSpec(
                    (ROWS, chunk),
                    lambda c, tmeta, tsl, tbt, tblk: (0, c),
                )
            ],
            scratch_shapes=[],
        ),
        out_shape=[jax.ShapeDtypeStruct((ROWS, nct * chunk), jnp.float32)],
        interpret=interpret,
    )


# split-layout empty-tile aux: final T = 1, saturation depth = SAT_INF
def _empty_aux_np():
    import numpy as np

    a = np.zeros((8, NPIX), np.float32)
    a[1] = 1.0
    a[2] = SAT_INF
    return a


@functools.lru_cache(maxsize=32)
def _make_raster_fn_split(nci, nct, num_tiles, grid_x, chunk, nfeat,
                          interpret, scan_impl="mxu", carry_depth=True):
    """Split-layout raster: interior call + carry-seeded tail call, composed
    XLA-side with the binning's per-tile ownership masks (BinnedSplit)."""
    fwd_int = _make_fwd_call_split_int(
        nci, num_tiles, grid_x, chunk, interpret, scan_impl,
        need_depth=carry_depth,
    )
    fwd_tail = _make_fwd_call_tail(
        nct, num_tiles, grid_x, chunk, interpret, need_depth=carry_depth
    )
    bwd_int = _make_bwd_call_split_int(
        nci, num_tiles, grid_x, chunk, interpret, scan_impl,
        need_depth=carry_depth,
    )
    bwd_tail = _make_bwd_call_tail(
        nct, num_tiles, grid_x, chunk, interpret, need_depth=carry_depth
    )
    value_rows = tuple(
        i for i in range(ROW_GID) if carry_depth or i != ROW_DEPTH
    ) + tuple(range(ROW_FEAT0, ROW_FEAT0 + nfeat))

    def _pair_rows(x, tmeta, tbt):
        # (T, ...) per-tile array -> (NCt, 2, ...) per-chunk A/B pair rows.
        # mode="clip": indices are valid tile ids by construction, and the
        # default mode="fill" adds a full-array select pass (~1.7 ms on the
        # carry arrays, r5 profile).
        pt = jnp.stack([tmeta >> 1, tbt >> 1], axis=-1)  # (NCt, 2)
        rows = jnp.take(
            x, jax.lax.optimization_barrier(pt.ravel()), axis=0, mode="clip"
        )
        return jax.lax.optimization_barrier(rows).reshape(
            (pt.shape[0], 2) + x.shape[1:]
        )

    def _tail_rows(x, tcid, trole):
        # (NCt, 2, ...) pair output -> (T, ...) per-tile rows
        flat = x.reshape((-1,) + x.shape[2:])
        idx = jnp.minimum(tcid * 2 + trole, flat.shape[0] - 1)
        rows = jnp.take(
            flat, jax.lax.optimization_barrier(idx), axis=0, mode="clip"
        )
        return jax.lax.optimization_barrier(rows)

    def _forward(attrs, gid, imeta, ilim, iblk, tmeta, tsl, tbt, tblk,
                 mask_int, has_tail, tcid, trole):
        stream = _build_stream(attrs, gid, chunk)
        color_i, aux_i, carry = fwd_int(imeta, ilim, iblk, stream, _phi_pow())
        # carry flows pallas-to-pallas: the tail call DMAs tile-indexed
        # blocks of it directly (two operands, one per segment) — an
        # XLA-side pair gather on the pixel-major array paid its 16x-padded
        # layout (~1.6 ms + a fill-select, r5 profile)
        colorp, auxp = fwd_tail(
            tmeta, tsl, tbt, tblk, stream, _phi_pow(), carry, carry
        )
        mi = mask_int[:, None, None]
        ht = has_tail[:, None, None]
        zc = jnp.float32(0.0)
        color = jnp.where(mi, color_i, zc) + jnp.where(
            ht, _tail_rows(colorp, tcid, trole), zc
        )
        # tail aux arrives CHANNEL-major (8, NPIX) — lane-dense HBM blocks
        # (_aux_pm); the per-tile gather needs no transpose
        aux_t = _tail_rows(auxp, tcid, trole)
        aux = jnp.where(
            ht, aux_t,
            jnp.where(mi, aux_i, jnp.asarray(_empty_aux_np())[None]),
        )
        return stream, color, aux

    @jax.custom_vjp
    def raster(attrs, hist, gid, imeta, ilim, iblk, tmeta, tsl, tbt, tblk,
               mask_int, has_tail, tcid, trole):
        _, color, aux = _forward(
            attrs, gid, imeta, ilim, iblk, tmeta, tsl, tbt, tblk,
            mask_int, has_tail, tcid, trole,
        )
        return color, aux

    def raster_fwd(attrs, hist, gid, imeta, ilim, iblk, tmeta, tsl, tbt,
                   tblk, mask_int, has_tail, tcid, trole):
        stream, color, aux = _forward(
            attrs, gid, imeta, ilim, iblk, tmeta, tsl, tbt, tblk,
            mask_int, has_tail, tcid, trole,
        )
        return (color, aux), (
            stream, hist, imeta, ilim, iblk, tmeta, tsl, tbt, tblk, color,
            aux,
        )

    def raster_bwd(res, g):
        (stream, hist, imeta, ilim, iblk, tmeta, tsl, tbt, tblk, color,
         aux) = res
        g_color, g_aux = g
        gct = _ga_gdep_blocks(g_color, g_aux, color, aux)
        ginst_i, carry_b = bwd_int(
            imeta, ilim, iblk, stream, _phi_pm(), gct
        )
        (ginst_t,) = bwd_tail(
            tmeta, tsl, tbt, tblk, stream, _phi_pm(),
            _pair_rows(gct, tmeta, tbt), carry_b, carry_b,
        )
        ginst = jnp.concatenate([ginst_i, ginst_t], axis=1)
        per_gauss = segment_reduce_by_key(ginst, ROW_GID, hist, value_rows)
        return (per_gauss.T,) + (None,) * 13

    raster.defvjp(raster_fwd, raster_bwd)
    return raster


@functools.lru_cache(maxsize=32)
def _make_fisher_call(nc, num_tiles, grid_x, chunk, interpret):
    return pl.pallas_call(
        functools.partial(_fisher_kernel, grid_x=grid_x, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nc,),
            in_specs=[
                _stream_spec(chunk),
                pl.BlockSpec((1, 16, NPIX), _tile_of),
            ],
            out_specs=[_out_chunk_spec(FROWS, chunk)],
            scratch_shapes=_common_scratch()
            + [pltpu.VMEM((NPIX, 1), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((FROWS, nc * chunk), jnp.float32)],
        interpret=interpret,
    )


def _phi_pow() -> jax.Array:
    return jnp.asarray(_phi_pow_host())


def _phi_mom() -> jax.Array:
    return jnp.asarray(_phi_mom_host())


def _build_stream(attrs: jax.Array, sorted_gid: jax.Array, chunk: int) -> jax.Array:
    """(N, ROWS) attr rows -> (ROWS, Ks) depth-sorted column stream.

    One whole-row gather from the small per-gaussian table (the fast TPU
    gather path, ~2 ms at 1M instances) plus a layout transpose. The stream
    is padded by one extra chunk so the last aligned window never runs off
    the end. Barriers keep index arithmetic and downstream consumers out of
    the gather fusion (fused scalar arithmetic drags TPU gathers onto the
    serial S(1) path — see CLAUDE.md)."""
    k = sorted_gid.shape[0]
    ks = (k // chunk + 1) * chunk
    idx = jnp.concatenate([sorted_gid, jnp.zeros(ks - k, jnp.int32)])
    idx = jax.lax.optimization_barrier(idx)
    # promise_in_bounds: binning emits gids in [0, N) (pads carry 0), and
    # the default mode="fill" fuses a clamp + full-row select into the
    # gather — at SLAM scale (992k rows) that fusion is a first-order cost
    # (the r5 900k profile showed 6.3 ms here)
    rows = attrs.at[idx].get(mode="promise_in_bounds")  # (Ks, ROWS)
    return jax.lax.optimization_barrier(rows).T


def segment_reduce_by_key(
    vals: jax.Array,  # (R, M) per-instance rows, one row holding the key
    key_row: int,
    hist: jax.Array,  # (N,) exact per-key count among valid instances
    value_rows: tuple | None = None,  # rows to reduce (default: all but key)
) -> jax.Array:
    """Sum per-instance rows into per-key rows (R, N); key row zeroed.

    One value-carrying sort by the key row + cumsum + segment-boundary
    differences. Sort cost scales with operand count (~0.6 ms per carried
    value row at 1.2M), so ``value_rows`` should name only rows that carry
    real gradients. Invalid rows carry BIG_KEY and group past every real
    key, so ``hist`` gives exact boundaries with no pad accounting — the
    atomics-free replacement for CUDA's atomicAdd gradient scatter.
    """
    r, m = vals.shape
    if value_rows is None:
        value_rows = tuple(i for i in range(r) if i != key_row)
    key = vals[key_row]
    rows = tuple(vals[i] for i in value_rows)
    out = jax.lax.sort((key,) + rows, num_keys=1, is_stable=False)
    svals = jnp.stack(out[1:], axis=0)  # (len(value_rows), M) key-grouped
    cs = jnp.cumsum(svals, axis=1)
    ends = jnp.cumsum(hist)
    starts = ends - hist
    # clip only the lower bound (ends <= sum(hist) <= M by construction);
    # promise_in_bounds keeps the clamp/select fusion out of the gather
    # (5.5 ms at the 900k r5 profile under the default mode="fill")
    seg_end = cs.at[:, jnp.clip(ends - 1, 0, None)].get(
        mode="promise_in_bounds"
    )
    # segments are contiguous, so starts[g] == ends[g-1] by construction
    # and the start boundary is seg_end SHIFTED — a pad, not a second
    # M-sized gather (each 2M-element take costs ~1.3 ms at SLAM scale)
    seg_start = jnp.where(
        (starts > 0)[None, :],
        jnp.pad(seg_end, ((0, 0), (1, 0)))[:, :-1],
        0.0,
    )
    seg = jnp.where((hist > 0)[None, :], seg_end - seg_start, 0.0)
    n = hist.shape[0]
    full = [jnp.zeros((1, n), jnp.float32)] * r
    for j, i in enumerate(value_rows):
        full[i] = seg[j : j + 1]
    return jnp.concatenate(full, axis=0)


def segment_reduce_by_perm(
    vals: jax.Array,  # (R, M) per-instance grad rows (grid-output layout)
    slot_pos: jax.Array,  # (K,) grid-output column per pre-cull slot
    slot_off: jax.Array,  # (N,) inclusive cumsum of tiles_touched
    value_rows: tuple,
) -> jax.Array:
    """Sort-free instance->gaussian reduction using binning-precomputed
    gather indices (RasterConfig.reduction='perm').

    ``slot_pos`` holds, for each pre-cull expansion slot (gid-major
    contiguous), the grid-output column of that instance's gradients — M for
    culled/masked slots, which land on an appended zero row. One transpose +
    row gather brings the rows into gid-major order; per-gaussian sums are
    then cumsum + segment-boundary differences with ANALYTIC boundaries
    (slot_off). Exactly equal to the sort path; the per-iteration sort is
    replaced by gather traffic (~5.5 ns/idx), with the inversion sort paid
    once per (re)binning.
    """
    r, m = vals.shape
    v = len(value_rows)
    sel = jnp.stack([vals[i] for i in value_rows], axis=0)  # (V, M)
    gt = jnp.concatenate(
        [sel.T, jnp.zeros((1, v), jnp.float32)], axis=0
    )  # (M+1, V); row M = pad
    idx = jax.lax.optimization_barrier(slot_pos)
    rows = jnp.take(gt, idx, axis=0)  # (K, V) gid-major
    rows = jax.lax.optimization_barrier(rows)
    # transpose back to value-major for the scan: a lane-major cumsum +
    # boundary takes mirror segment_reduce_by_key's measured-fast layout
    # (a major-dim cumsum over a (K, V) array walks K in log steps on an
    # 11-lane-wide operand)
    cs = jnp.cumsum(rows.T, axis=1)  # (V, K)
    ends = slot_off
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), slot_off[:-1]])
    seg_end = jnp.take(cs, jnp.clip(ends - 1, 0, None), axis=1)  # (V, N)
    # contiguous segments: starts[g] == ends[g-1], so the start boundary is
    # seg_end shifted right by one — no second N-sized gather
    seg_start = jnp.where(
        (starts > 0)[None, :],
        jnp.pad(seg_end, ((0, 0), (1, 0)))[:, :-1],
        0.0,
    )
    seg = jnp.where((ends > starts)[None, :], seg_end - seg_start, 0.0)
    n = slot_off.shape[0]
    full = [jnp.zeros((1, n), jnp.float32)] * r
    for j, i in enumerate(value_rows):
        full[i] = seg[j : j + 1]
    return jnp.concatenate(full, axis=0)


def segment_reduce_by_scatter(
    vals: jax.Array,  # (R, M) per-instance rows, key row = gaussian id
    key_row: int,
    n: int,
    value_rows: tuple,
) -> jax.Array:
    """Row scatter-add keyed by the kernels' gid row (reduction='scatter').

    Measured ~15 ns/row at 1.2M on v5e — kept for the measurement matrix
    (PROFILE.md), not as a production path.
    """
    r, m = vals.shape
    key = vals[key_row]
    idx = jnp.where(key < BIG_KEY, key, float(n)).astype(jnp.int32)
    sel = jnp.stack([vals[i] for i in value_rows], axis=0)  # (V, M)
    acc = jnp.zeros((n + 1, len(value_rows)), jnp.float32)
    acc = acc.at[idx].add(sel.T, mode="drop")
    full = [jnp.zeros((1, n), jnp.float32)] * r
    for j, i in enumerate(value_rows):
        full[i] = acc[:n, j : j + 1].T
    return jnp.concatenate(full, axis=0)


@functools.lru_cache(maxsize=32)
def _make_raster_fn(nc, num_tiles, grid_x, chunk, nfeat, interpret,
                    reduction="sort", scan_impl="mxu", carry_depth=True):
    """custom-vjp'd rasterize: (N, ROWS) attrs -> (color, aux) per tile.

    The vjp boundary sits at the per-gaussian attribute table, so neither
    the sorted stream gather nor the instance->gaussian reduction ever
    round-trips through XLA autodiff (whose scatter-add transpose is
    serialized on TPU). ``nfeat`` bounds the feature rows carried through
    the reduction sort (each carried row costs ~0.6 ms at 1.2M instances;
    rows past nfeat are zero by construction)."""
    # carry_depth=False additionally ZEROES the median-depth output (aux
    # row 0) and skips its per-pair crossing math in BOTH kernels — legal
    # because the same contract that lets the gradient row drop (the loss
    # never reads median depth) covers the primal too
    fwd_call = _make_fwd_call(
        nc, num_tiles, grid_x, chunk, interpret, scan_impl,
        need_depth=carry_depth,
    )
    bwd_call = _make_bwd_call(
        nc, num_tiles, grid_x, chunk, interpret, scan_impl,
        need_depth=carry_depth,
    )
    # carry_depth=False drops the median-depth gradient row from the
    # reduction (callers whose loss provably has a zero median-depth
    # cotangent — the SLAM losses use the BLENDED depth channel); each
    # carried row costs ~0.6 ms at 1.2M instances in sort mode
    value_rows = tuple(
        i for i in range(ROW_GID) if carry_depth or i != ROW_DEPTH
    ) + tuple(range(ROW_FEAT0, ROW_FEAT0 + nfeat))

    @jax.custom_vjp
    def raster(attrs, hist, sorted_gid, meta, lim, blk, slot_pos, slot_off):
        stream = _build_stream(attrs, sorted_gid, chunk)
        return fwd_call(meta, lim, blk, stream, _phi_pow())

    def raster_fwd(attrs, hist, sorted_gid, meta, lim, blk, slot_pos, slot_off):
        stream = _build_stream(attrs, sorted_gid, chunk)
        color, aux = fwd_call(meta, lim, blk, stream, _phi_pow())
        return (color, aux), (
            stream, hist, meta, lim, blk, slot_pos, slot_off, color, aux,
        )

    def raster_bwd(res, g):
        stream, hist, meta, lim, blk, slot_pos, slot_off, color, aux = res
        g_color, g_aux = g
        gct = _ga_gdep_blocks(g_color, g_aux, color, aux)
        (ginst,) = bwd_call(meta, lim, blk, stream, _phi_pm(), gct)
        if reduction == "perm":
            per_gauss = segment_reduce_by_perm(
                ginst, slot_pos, slot_off, value_rows
            )
        elif reduction == "scatter":
            per_gauss = segment_reduce_by_scatter(
                ginst, ROW_GID, hist.shape[0], value_rows
            )
        else:
            per_gauss = segment_reduce_by_key(
                ginst, ROW_GID, hist, value_rows
            )  # (ROWS, N)
        return per_gauss.T, None, None, None, None, None, None, None

    raster.defvjp(raster_fwd, raster_bwd)
    return raster


class PallasRasterOut(NamedTuple):
    """Raw per-tile kernel outputs, CHANNEL-MAJOR.

    (T, 8, NPIX) blocks keep the 256 pixels on the minor (lane) dim, so
    per-channel slicing and the tiles->image reshuffle are lane-dense (the
    previous (T, NPIX, 8) layout used 8 of 128 lanes — each XLA-side
    slice/pad/transpose on it cost ~1 ms at SLAM scale).
    """

    color: jax.Array  # (T, NFEAT_PAD, NPIX) accumulated (no background)
    aux: jax.Array  # (T, 8, NPIX): row 0 = median-depth accum (0 where
    # unset), row 1 = final transmittance, row 2 = per-tile saturation depth
    # (+inf if the tile never fully saturated; see binning depth_cap), rest 0


def pack_attrs(
    blend_xy: jax.Array,  # (N, 2)
    conic: jax.Array,  # (N, 3)
    opacities: jax.Array,  # (N,)
    depths: jax.Array,  # (N,)
    feats: jax.Array,  # (N, F) F <= NFEAT_PAD
) -> jax.Array:
    """Per-gaussian attribute rows (N, ROWS) in instance-stream order.

    Row ROW_GID carries the gaussian's own index as f32 (exact to 2^24);
    the backward kernels copy it through as the reduction key, which is
    what lets the gradient segment-sum run without any padded-id gather.
    """
    n = blend_xy.shape[0]
    f = feats.shape[-1]
    if f < NFEAT_PAD:
        feats = jnp.concatenate(
            [feats, jnp.zeros((n, NFEAT_PAD - f), feats.dtype)], axis=-1
        )
    return jnp.concatenate(
        [
            jnp.stack(
                [
                    blend_xy[:, 0],
                    blend_xy[:, 1],
                    conic[:, 0],
                    conic[:, 1],
                    conic[:, 2],
                    opacities,
                    depths,
                    jnp.arange(n, dtype=jnp.float32),
                ],
                axis=-1,
            ),
            feats,
        ],
        axis=-1,
    )


def fisher_moments(
    attrs: jax.Array,  # (N, ROWS) from pack_attrs
    binned,  # BinnedCSR
    num_tiles: int,
    grid_x: int,
    chunk: int,
    seed: jax.Array,  # (NFEAT_PAD,) per-channel backward seed (e.g. 1e-3 RGB)
    interpret: bool | None = None,
    tile_color: jax.Array | None = None,
) -> jax.Array:
    """Per-gaussian (N, 16) squared-gradient moments (see _fisher_kernel).

    Cols 0-14: upper triangle of sum_p v v^T over screen quantities
    (x, y, conic a/b/c); col 15: sum_p (d opacity)^2. ``tile_color`` lets a
    caller that already ran the forward at this pose/binning (the gains
    path's silhouette render) pass its (T, NFEAT_PAD, NPIX) color blocks,
    skipping this function's own fwd pass — the seed only weights rows the
    two renders compute identically (RGB), so the moments are unchanged up
    to the two preprocess fusions' f32 rounding.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nc = binned.chunk_meta.shape[0]
    fish_call = _make_fisher_call(nc, num_tiles, grid_x, chunk, interpret)
    stream = _build_stream(attrs, binned.sorted_gid, chunk)
    if tile_color is None:
        fwd_call = _make_fwd_call(nc, num_tiles, grid_x, chunk, interpret)
        color, aux = fwd_call(
            binned.chunk_meta, binned.chunk_lim, binned.chunk_blk, stream,
            _phi_pow(),
        )
    else:
        color = tile_color
    g_color = jnp.broadcast_to(seed[None, :, None], color.shape)
    gtot = jnp.sum(color * g_color, axis=1)  # (T, NPIX)
    gct = jnp.concatenate(
        [
            g_color,
            gtot[:, None, :],
            jnp.zeros((color.shape[0], 7, NPIX), jnp.float32),
        ],
        axis=1,
    )
    (per_inst,) = fish_call(
        binned.chunk_meta, binned.chunk_lim, binned.chunk_blk, stream,
        gct,
    )
    mom = segment_reduce_by_key(
        per_inst, FKEY_ROW, binned.gid_hist, tuple(range(16))
    )
    return mom[:16].T  # (N, 16)


def rasterize_tiles_pallas(
    attrs: jax.Array,  # (N, ROWS) from pack_attrs
    binned,  # BinnedCSR
    num_tiles: int,
    grid_x: int,
    chunk: int,
    interpret: bool | None = None,
    nfeat: int = NFEAT_PAD - 2,
    reduction: str = "sort",
    scan_impl: str = "mxu",
    carry_depth: bool = True,
) -> PallasRasterOut:
    """Run the Pallas per-chunk compositing kernels (differentiable).

    ``nfeat`` bounds the FEATURE gradient rows carried through the
    reduction and ``carry_depth=False`` drops the median-depth row: callers
    may pass fewer than the rendered channel count ONLY when the upstream
    cotangents for the dropped rows are structurally zero (their per-
    gaussian grads then come back as exact zeros).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if reduction == "perm" and binned.slot_pos is None:
        # a cached BinnedCSR from a 'sort' config has no slot indices
        reduction = "sort"
    nc = binned.chunk_meta.shape[0]
    dummy = jnp.zeros(1, jnp.int32)
    if hasattr(binned, "tsl"):  # BinnedSplit stream
        nci = binned.chunk_meta.shape[0]
        nct = binned.tmeta.shape[0]
        fn = _make_raster_fn_split(
            nci, nct, num_tiles, grid_x, chunk, nfeat, interpret, scan_impl,
            carry_depth,
        )
        color, aux = fn(
            attrs, binned.gid_hist, binned.sorted_gid, binned.chunk_meta,
            binned.chunk_lim, binned.chunk_blk, binned.tmeta, binned.tsl,
            binned.tbt, binned.tblk, binned.mask_int,
            binned.mask_a | binned.mask_b, binned.tail_cid,
            binned.tail_role,
        )
        return PallasRasterOut(color=color, aux=aux)
    fn = _make_raster_fn(
        nc, num_tiles, grid_x, chunk, nfeat, interpret, reduction, scan_impl,
        carry_depth,
    )
    color, aux = fn(
        attrs, binned.gid_hist, binned.sorted_gid, binned.chunk_meta,
        binned.chunk_lim, binned.chunk_blk,
        binned.slot_pos if reduction == "perm" else dummy,
        binned.slot_off if reduction == "perm" else dummy,
    )
    # every tile (including empty ones) gets an initializing grid step
    # (binning emits a zero-lim chunk per empty tile), so the outputs are
    # fully defined — no counts>0 select needed here
    return PallasRasterOut(color=color, aux=aux)
