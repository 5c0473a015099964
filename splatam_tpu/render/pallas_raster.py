"""Pallas TPU rasterization kernels: flat-chunk-grid alpha compositing.

TPU-native re-expression of the reference CUDA render kernels
(`cuda_rasterizer/forward.cu:261-423` forward, `backward.cu:586-748` +
`backward.cu:850-1224` fused backward). The CUDA design — one 16x16 thread
block per tile, shared-memory staging, per-pixel sequential front-to-back
blending, atomicAdd gradient scatter — maps to TPU as:

  * work list   = the depth-sorted instance stream in chunk-aligned CSR
                  layout (binning.bin_gaussians_csr): each tile's segment is
                  padded to a multiple of ``chunk``, so ONE Pallas grid step
                  = one (tile, chunk) pair. Empty tiles consume zero steps
                  and there is no per-tile capacity padding.
  * staging     = instance attributes are row-gathered into a dense
                  (16, M_pad) stream by XLA (row gathers are ~30x faster
                  than column gathers on TPU) and streamed through VMEM by
                  the Pallas pipeline — the `__shared__` analog, pipelined.
  * blending    = the order-dependent transmittance recursion is evaluated
                  in closed form per chunk on the MXU: a triangular matmul
                  computes the cumulative sum of log(1 - alpha) along the
                  gaussian axis; per-tile running state (T, dead mask, color
                  accumulator) lives in VMEM scratch across grid steps.
  * scatter     = per-instance gradients are written densely to the stream
                  (one block per grid step — no write conflicts, no
                  atomics); the instance->gaussian segment reduction happens
                  in XLA as sort-by-gaussian + cumsum-difference, the
                  TPU-native replacement for CUDA's atomicAdd scatter
                  (SURVEY.md §7 hard-part #2).

The backward is a SINGLE front-to-back pass (unlike the CUDA back-to-front
replay): the suffix sums S_i = sum_{j>i} w_j (c_j . g) it needs are obtained
from the forward's saved color accumulator as total minus a running prefix,
which the same triangular matmul produces per chunk.

Numerical semantics (alpha cap/floor, T stop, median-depth crossing) match
`render_tiled.py`, the jnp oracle path; tests assert fwd and grad agreement.
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
ROW_X, ROW_Y, ROW_CA, ROW_CB, ROW_CC, ROW_OP, ROW_DEPTH, ROW_VALID = range(8)
ROW_FEAT0 = 8
NFEAT_PAD = 8  # feature rows padded to 8 (RGB=3 or RGB+depth/sil/z2=6)
ROWS = ROW_FEAT0 + NFEAT_PAD  # 16

NPIX = TILE * TILE  # 256 pixels per tile


def _triangular(chunk: int) -> jax.Array:
    """(chunk, chunk) upper-triangular ones: x @ tri is an inclusive cumsum
    of x along its last axis, computed on the MXU."""
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (i <= j).astype(jnp.float32)


def _cumsum_mxu(x: jax.Array, tri: jax.Array) -> jax.Array:
    """Inclusive cumsum along axis -1 via triangular matmul (f32 MXU)."""
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _pixel_coords(t, grid_x: int):
    """Global pixel centers of tile ``t`` as (NPIX, 1) f32 columns."""
    tx = t % grid_x
    ty = t // grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px = (tx * TILE + p % TILE).astype(jnp.float32)
    py = (ty * TILE + p // TILE).astype(jnp.float32)
    return px, py


def _chunk_alpha(blk, px, py, nvalid, chunk):
    """Per-(pixel, gaussian) alpha for one (16, chunk) instance block."""
    x = blk[ROW_X : ROW_X + 1, :]
    y = blk[ROW_Y : ROW_Y + 1, :]
    ca = blk[ROW_CA : ROW_CA + 1, :]
    cb = blk[ROW_CB : ROW_CB + 1, :]
    cc = blk[ROW_CC : ROW_CC + 1, :]
    op = blk[ROW_OP : ROW_OP + 1, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    dx = x - px  # (NPIX, C)
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    raw = op * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_CAP, raw)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & (row < nvalid)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, raw, power, dx, dy, keep


def _meta(meta_ref, c):
    m = meta_ref[c]
    return m >> 10, (m >> 1) & 0x1FF, m & 1  # tile, nvalid, first


def _fwd_kernel(
    meta_ref,  # scalar-prefetch (NC,) int32 packed tile<<9|nvalid<<1|first
    inst_ref,  # (ROWS, chunk) VMEM block
    color_ref,  # (1, NPIX, NFEAT_PAD) block of the owning tile
    aux_ref,  # (1, NPIX, 8): 0=median depth, 1=final T
    t_run_sc,  # (NPIX, 1) f32 scratch: running transmittance
    dead_sc,  # (NPIX, 1) f32 scratch: 0/1 dead mask
    depth_sc,  # (NPIX, 1) f32 scratch: median depth accumulator
    alive_sc,  # (1,) SMEM: 0 when every pixel of the tile is saturated
    *,
    grid_x: int,
    chunk: int,
):
    c = pl.program_id(0)
    t, nvalid, first = _meta(meta_ref, c)

    @pl.when(first == 1)
    def _():
        t_run_sc[:] = jnp.ones((NPIX, 1), jnp.float32)
        dead_sc[:] = jnp.zeros((NPIX, 1), jnp.float32)
        depth_sc[:] = jnp.zeros((NPIX, 1), jnp.float32)
        color_ref[0] = jnp.zeros((NPIX, NFEAT_PAD), jnp.float32)
        alive_sc[0] = 1

    # early exit once the whole tile is saturated — the CUDA kernel's
    # per-block __syncthreads_count done-ballot (`forward.cu:314-328`)
    @pl.when((nvalid > 0) & (alive_sc[0] == 1))
    def _():
        px, py = _pixel_coords(t, grid_x)
        blk = inst_ref[:]
        alpha, _, _, _, _, _ = _chunk_alpha(blk, px, py, nvalid, chunk)
        t_run = t_run_sc[:]
        dead = dead_sc[:]

        log1m = jnp.log1p(-alpha)
        incl = _cumsum_mxu(log1m, _triangular(chunk))
        t_cum = t_run * jnp.exp(incl)  # T after each gaussian
        t_before = t_run * jnp.exp(incl - log1m)
        live = (t_cum >= T_STOP) & (dead == 0.0)

        w = jnp.where(live, alpha * t_before, 0.0)
        feats = blk[ROW_FEAT0:, :]  # (NFEAT_PAD, C)
        color_ref[0] += jax.lax.dot_general(
            w, feats, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        dep = blk[ROW_DEPTH : ROW_DEPTH + 1, :]
        crossing = (t_before > 0.5) & (t_cum < 0.5) & live
        depth_sc[:] += jnp.sum(jnp.where(crossing, dep, 0.0), axis=1, keepdims=True)
        t_run_sc[:] = t_run * jnp.exp(
            jnp.sum(jnp.where(live, log1m, 0.0), axis=1, keepdims=True)
        )
        new_dead = jnp.maximum(dead, (t_cum[:, -1:] < T_STOP).astype(jnp.float32))
        dead_sc[:] = new_dead
        alive_sc[0] = (jnp.sum(new_dead) < NPIX).astype(jnp.int32)

    aux_ref[0] = jnp.concatenate(
        [depth_sc[:], t_run_sc[:], jnp.zeros((NPIX, 6), jnp.float32)], axis=1
    )


def _bwd_kernel(
    meta_ref,  # scalar-prefetch (NC,) int32
    inst_ref,  # (ROWS, chunk)
    gcolor_ref,  # (1, NPIX, NFEAT_PAD) upstream dL/d color accumulator
    gaux_ref,  # (1, NPIX, 8): 0=dL/d median depth, 1=dL/d final T
    rescolor_ref,  # (1, NPIX, NFEAT_PAD) forward color accumulator
    resaux_ref,  # (1, NPIX, 8) forward aux (final T at channel 1)
    ginst_ref,  # (ROWS, chunk) output: grads w.r.t. this instance chunk
    t_run_sc,  # (NPIX, 1) scratch
    dead_sc,  # (NPIX, 1) scratch
    accwgc_sc,  # (NPIX, 1) scratch: running prefix of w * gc
    alive_sc,  # (1,) SMEM
    *,
    grid_x: int,
    chunk: int,
):
    c = pl.program_id(0)
    t, nvalid, first = _meta(meta_ref, c)

    @pl.when(first == 1)
    def _():
        t_run_sc[:] = jnp.ones((NPIX, 1), jnp.float32)
        dead_sc[:] = jnp.zeros((NPIX, 1), jnp.float32)
        accwgc_sc[:] = jnp.zeros((NPIX, 1), jnp.float32)
        alive_sc[0] = 1

    run = (nvalid > 0) & (alive_sc[0] == 1)

    @pl.when(jnp.logical_not(run))
    def _():
        ginst_ref[:] = jnp.zeros((ROWS, chunk), jnp.float32)

    @pl.when(run)
    def _():
        px, py = _pixel_coords(t, grid_x)
        blk = inst_ref[:]
        alpha, raw, power, dx, dy, keep = _chunk_alpha(blk, px, py, nvalid, chunk)
        t_run = t_run_sc[:]
        dead = dead_sc[:]

        g_color = gcolor_ref[0]  # (NPIX, NFEAT_PAD)
        g_depth = gaux_ref[0][:, 0:1]
        g_tfin = gaux_ref[0][:, 1:2]
        t_final = resaux_ref[0][:, 1:2]
        gtot = jnp.sum(rescolor_ref[0] * g_color, axis=1, keepdims=True)

        tri = _triangular(chunk)
        log1m = jnp.log1p(-alpha)
        incl = _cumsum_mxu(log1m, tri)
        t_cum = t_run * jnp.exp(incl)
        t_before = t_run * jnp.exp(incl - log1m)
        live = (t_cum >= T_STOP) & (dead == 0.0)
        w = jnp.where(live, alpha * t_before, 0.0)

        feats = blk[ROW_FEAT0:, :]  # (NFEAT_PAD, C)
        # gc[p, j] = sum_f g[p, f] * feat[f, j]
        gc = jax.lax.dot_general(
            g_color, feats, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        # suffix sums: S[p, j] = sum over every instance after j of w * gc
        wgc = w * gc
        prefix = accwgc_sc[:] + _cumsum_mxu(wgc, tri)
        suffix = gtot - prefix

        one_minus = jnp.maximum(1.0 - alpha, 1e-12)
        dalpha = jnp.where(
            live,
            t_before * gc - (suffix + g_tfin * t_final) / one_minus,
            0.0,
        )
        # clamp gates: d alpha/d raw = 1 only below the 0.99 cap; `keep`
        # excludes masked contributors entirely
        unclamped = keep & (raw < ALPHA_CAP)
        dop_da = jnp.where(unclamped, jnp.exp(power), 0.0)
        dpower = jnp.where(unclamped, dalpha * alpha, 0.0)

        ca = blk[ROW_CA : ROW_CA + 1, :]
        cb = blk[ROW_CB : ROW_CB + 1, :]
        cc = blk[ROW_CC : ROW_CC + 1, :]
        ddx = dpower * -(ca * dx + cb * dy)
        ddy = dpower * -(cc * dy + cb * dx)
        crossing = (t_before > 0.5) & (t_cum < 0.5) & live

        def rsum(v):  # reduce over pixels -> (1, C)
            return jnp.sum(v, axis=0, keepdims=True)

        # rows in instance-stream order: X, Y, CA, CB, CC, OP, DEPTH, VALID
        grows = jnp.concatenate(
            [
                rsum(ddx),
                rsum(ddy),
                rsum(dpower * (-0.5 * dx * dx)),
                rsum(dpower * (-dx * dy)),
                rsum(dpower * (-0.5 * dy * dy)),
                rsum(dalpha * dop_da),
                rsum(jnp.where(crossing, g_depth, 0.0)),
                jnp.zeros((1, chunk), jnp.float32),
            ],
            axis=0,
        )
        # dL/dfeat[f, j] = sum_p g[p, f] * w[p, j]
        gfeat = jax.lax.dot_general(
            g_color, w, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (NFEAT_PAD, C)
        ginst_ref[:] = jnp.concatenate([grows, gfeat], axis=0)

        t_run_sc[:] = t_run * jnp.exp(
            jnp.sum(jnp.where(live, log1m, 0.0), axis=1, keepdims=True)
        )
        new_dead = jnp.maximum(dead, (t_cum[:, -1:] < T_STOP).astype(jnp.float32))
        dead_sc[:] = new_dead
        alive_sc[0] = (jnp.sum(new_dead) < NPIX).astype(jnp.int32)
        accwgc_sc[:] = accwgc_sc[:] + jnp.sum(wgc, axis=1, keepdims=True)


def _fisher_kernel(
    meta_ref,  # scalar-prefetch (NC,) int32
    inst_ref,  # (ROWS, chunk)
    gcolor_ref,  # (1, NPIX, NFEAT_PAD) seed dL/d color (e.g. 1e-3 on RGB)
    rescolor_ref,  # (1, NPIX, NFEAT_PAD) forward color accumulator
    resaux_ref,  # (1, NPIX, 8) forward aux
    fish_ref,  # (ROWS, chunk) out: 15 second moments of v + sum dop^2
    t_run_sc,
    dead_sc,
    accwgc_sc,
    alive_sc,  # (1,) SMEM
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
    c = pl.program_id(0)
    t, nvalid, first = _meta(meta_ref, c)

    @pl.when(first == 1)
    def _():
        t_run_sc[:] = jnp.ones((NPIX, 1), jnp.float32)
        dead_sc[:] = jnp.zeros((NPIX, 1), jnp.float32)
        accwgc_sc[:] = jnp.zeros((NPIX, 1), jnp.float32)
        alive_sc[0] = 1

    run = (nvalid > 0) & (alive_sc[0] == 1)

    @pl.when(jnp.logical_not(run))
    def _():
        fish_ref[:] = jnp.zeros((ROWS, chunk), jnp.float32)

    @pl.when(run)
    def _():
        px, py = _pixel_coords(t, grid_x)
        blk = inst_ref[:]
        alpha, raw, power, dx, dy, keep = _chunk_alpha(blk, px, py, nvalid, chunk)
        t_run = t_run_sc[:]
        dead = dead_sc[:]

        g_color = gcolor_ref[0]
        gtot = jnp.sum(rescolor_ref[0] * g_color, axis=1, keepdims=True)

        tri = _triangular(chunk)
        log1m = jnp.log1p(-alpha)
        incl = _cumsum_mxu(log1m, tri)
        t_cum = t_run * jnp.exp(incl)
        t_before = t_run * jnp.exp(incl - log1m)
        live = (t_cum >= T_STOP) & (dead == 0.0)
        w = jnp.where(live, alpha * t_before, 0.0)

        feats = blk[ROW_FEAT0:, :]
        gc = jax.lax.dot_general(
            g_color, feats, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        wgc = w * gc
        prefix = accwgc_sc[:] + _cumsum_mxu(wgc, tri)
        suffix = gtot - prefix

        one_minus = jnp.maximum(1.0 - alpha, 1e-12)
        dalpha = jnp.where(live, t_before * gc - suffix / one_minus, 0.0)
        unclamped = keep & (raw < ALPHA_CAP)
        dop = jnp.where(unclamped, dalpha * jnp.exp(power), 0.0)
        dpower = jnp.where(unclamped, dalpha * alpha, 0.0)

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
        fish_ref[:] = jnp.concatenate(
            moments + [rsum(dop * dop)], axis=0
        )

        t_run_sc[:] = t_run * jnp.exp(
            jnp.sum(jnp.where(live, log1m, 0.0), axis=1, keepdims=True)
        )
        new_dead = jnp.maximum(dead, (t_cum[:, -1:] < T_STOP).astype(jnp.float32))
        dead_sc[:] = new_dead
        alive_sc[0] = (jnp.sum(new_dead) < NPIX).astype(jnp.int32)
        accwgc_sc[:] = accwgc_sc[:] + jnp.sum(wgc, axis=1, keepdims=True)


@functools.lru_cache(maxsize=32)
def _make_fisher_op(
    nc: int, num_tiles: int, grid_x: int, chunk: int, interpret: bool
):
    def tile_of(c, meta):
        return (meta[c] >> 10, 0, 0)

    return pl.pallas_call(
        functools.partial(_fisher_kernel, grid_x=grid_x, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((ROWS, chunk), lambda c, meta: (0, c)),
                pl.BlockSpec((1, NPIX, NFEAT_PAD), tile_of),
                pl.BlockSpec((1, NPIX, NFEAT_PAD), tile_of),
                pl.BlockSpec((1, NPIX, 8), tile_of),
            ],
            out_specs=[
                pl.BlockSpec((ROWS, chunk), lambda c, meta: (0, c)),
            ],
            scratch_shapes=[
                pltpu.VMEM((NPIX, 1), jnp.float32),
                pltpu.VMEM((NPIX, 1), jnp.float32),
                pltpu.VMEM((NPIX, 1), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, nc * chunk), jnp.float32),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _make_raster_op(
    nc: int, num_tiles: int, grid_x: int, chunk: int, interpret: bool
):
    """Build the custom-vjp'd pallas op for one static configuration."""

    def tile_of(c, meta):
        return (meta[c] >> 10, 0, 0)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, grid_x=grid_x, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((ROWS, chunk), lambda c, meta: (0, c)),
            ],
            out_specs=[
                pl.BlockSpec((1, NPIX, NFEAT_PAD), tile_of),
                pl.BlockSpec((1, NPIX, 8), tile_of),
            ],
            scratch_shapes=[
                pltpu.VMEM((NPIX, 1), jnp.float32),
                pltpu.VMEM((NPIX, 1), jnp.float32),
                pltpu.VMEM((NPIX, 1), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, NPIX, NFEAT_PAD), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, NPIX, 8), jnp.float32),
        ],
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, grid_x=grid_x, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((ROWS, chunk), lambda c, meta: (0, c)),
                pl.BlockSpec((1, NPIX, NFEAT_PAD), tile_of),
                pl.BlockSpec((1, NPIX, 8), tile_of),
                pl.BlockSpec((1, NPIX, NFEAT_PAD), tile_of),
                pl.BlockSpec((1, NPIX, 8), tile_of),
            ],
            out_specs=[
                pl.BlockSpec((ROWS, chunk), lambda c, meta: (0, c)),
            ],
            scratch_shapes=[
                pltpu.VMEM((NPIX, 1), jnp.float32),
                pltpu.VMEM((NPIX, 1), jnp.float32),
                pltpu.VMEM((NPIX, 1), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, nc * chunk), jnp.float32),
        ],
        interpret=interpret,
    )

    @jax.custom_vjp
    def raster(inst, meta):
        color, aux = fwd_call(meta, inst)
        return color, aux

    def raster_fwd(inst, meta):
        color, aux = fwd_call(meta, inst)
        return (color, aux), (inst, meta, color, aux)

    def raster_bwd(res, g):
        inst, meta, color, aux = res
        g_color, g_aux = g
        (ginst,) = bwd_call(meta, inst, g_color, g_aux, color, aux)
        return ginst, None

    raster.defvjp(raster_fwd, raster_bwd)
    return raster


@jax.custom_vjp
def gather_instances(attrs: jax.Array, idx: jax.Array, hist: jax.Array) -> jax.Array:
    """(ROWS, N) per-gaussian attributes -> (ROWS, M_pad) instance stream.

    Forward is a fast axis-1 row gather. The custom backward replaces XLA's
    scatter-add transpose (slow and serialized on TPU) with sort-by-gaussian
    + cumsum + segment-boundary differences — the atomics-free reduction of
    SURVEY.md §7 hard-part #2. ``hist`` is the per-gaussian occurrence count
    of ``idx`` (analytically known from the binning rects), so the backward
    never histograms with a scatter-add (~11 ms at 1M instances).
    """
    return jnp.take(attrs, idx, axis=1)


def _gather_fwd(attrs, idx, hist):
    return jnp.take(attrs, idx, axis=1), (idx, hist)


def segment_sum_by_gaussian(
    g: jax.Array, idx: jax.Array, n: int, hist: jax.Array | None = None
) -> jax.Array:
    """Sum per-instance rows (R, M) into per-gaussian rows (R, n).

    Sort-by-gaussian + cumsum + segment-boundary differences: the TPU answer
    to CUDA's atomicAdd gradient scatter (`backward.cu:1093-1137`).

    Sorting (idx, iota) and applying the permutation with one row gather is
    ~27% faster than carrying all R gradient rows through the sort (TPU sort
    cost scales with operand count; gathers are cheap).
    """
    m = idx.shape[0]
    _, perm = jax.lax.sort(
        (idx, jnp.arange(m, dtype=jnp.int32)), num_keys=1, is_stable=False
    )
    gmat = jnp.take(g, perm, axis=1)  # (R, M), gaussian-grouped
    cs = jnp.cumsum(gmat, axis=1)
    if hist is None:
        hist = jnp.zeros(n + 1, jnp.int32).at[idx].add(1)[:n]
    ends = jnp.cumsum(hist)
    starts = ends - hist
    seg_end = cs[:, jnp.clip(ends - 1, 0, None)]
    seg_start = jnp.where(
        (starts > 0)[None, :], cs[:, jnp.clip(starts - 1, 0, None)], 0.0
    )
    return jnp.where((hist > 0)[None, :], seg_end - seg_start, 0.0)


def _gather_bwd(res, g):
    idx, hist = res
    return segment_sum_by_gaussian(g, idx, hist.shape[0], hist), None, None


gather_instances.defvjp(_gather_fwd, _gather_bwd)


class PallasRasterOut(NamedTuple):
    color: jax.Array  # (T, NPIX, NFEAT_PAD) accumulated (no background)
    depth: jax.Array  # (T, NPIX) median depth accumulator (0 where unset)
    final_t: jax.Array  # (T, NPIX)


def pack_attrs(
    blend_xy: jax.Array,  # (N, 2)
    conic: jax.Array,  # (N, 3)
    opacities: jax.Array,  # (N,)
    depths: jax.Array,  # (N,)
    feats: jax.Array,  # (N, F) F <= NFEAT_PAD
) -> jax.Array:
    """Per-gaussian attribute matrix (ROWS, N) in instance-stream row order."""
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
                    jnp.ones(n, jnp.float32),
                ],
                axis=0,
            ),
            feats.T,
        ],
        axis=0,
    )


def fisher_moments(
    attrs: jax.Array,  # (ROWS, N) from pack_attrs
    binned,  # BinnedCSR
    num_tiles: int,
    grid_x: int,
    chunk: int,
    seed: jax.Array,  # (NFEAT_PAD,) per-channel backward seed (e.g. 1e-3 RGB)
    interpret: bool | None = None,
) -> jax.Array:
    """Per-gaussian (16, N) squared-gradient moments (see _fisher_kernel).

    Rows 0-14: upper triangle of sum_p v v^T over screen quantities
    (x, y, conic a/b/c); row 15: sum_p (d opacity)^2.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = attrs.shape[1]
    m_pad = binned.padded_gid.shape[0]
    nc = m_pad // chunk
    inst = gather_instances(attrs, binned.padded_gid, binned.gid_hist)
    fwd_op = _make_raster_op(nc, num_tiles, grid_x, chunk, interpret)
    color, aux = fwd_op(inst, binned.chunk_meta)
    g_color = jnp.broadcast_to(seed[None, None, :], color.shape)
    fish_op = _make_fisher_op(nc, num_tiles, grid_x, chunk, interpret)
    (per_inst,) = fish_op(binned.chunk_meta, inst, g_color, color, aux)
    per_inst = per_inst.reshape(ROWS, m_pad)
    return segment_sum_by_gaussian(per_inst, binned.padded_gid, n, binned.gid_hist)


def rasterize_tiles_pallas(
    attrs: jax.Array,  # (ROWS, N) from pack_attrs
    binned,  # BinnedCSR
    num_tiles: int,
    grid_x: int,
    chunk: int,
    interpret: bool | None = None,
) -> PallasRasterOut:
    """Run the Pallas per-chunk compositing kernels (differentiable)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m_pad = binned.padded_gid.shape[0]
    nc = m_pad // chunk
    inst = gather_instances(attrs, binned.padded_gid, binned.gid_hist)
    op = _make_raster_op(nc, num_tiles, grid_x, chunk, interpret)
    color, aux = op(inst, binned.chunk_meta)

    # tiles with no instances are never visited by the kernel
    has = binned.counts > 0
    color = jnp.where(has[:, None, None], color, 0.0)
    depth = jnp.where(has[:, None], aux[..., 0], 0.0)
    final_t = jnp.where(has[:, None], aux[..., 1], 1.0)
    return PallasRasterOut(color=color, depth=depth, final_t=final_t)
