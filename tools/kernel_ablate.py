"""Attribute the bwd kernel's per-step cost by stagewise ablation (r4).

The r4 roofline (PROFILE.md) models the render kernels as VPU-op additive:
~34 ops/pair fwd, ~62 bwd, ~280 ns fixed step overhead. Five structural
bets (packed, perm, dual, roll, quadrant) lost against that model's
predictions, so before any further kernel work this probe MEASURES the
stage breakdown directly: the real bwd pallas_call shape (same BlockSpecs,
grid, scalar prefetch, scratch, REAL bench binning/stream) with bodies of
increasing completeness:

  dma        read the stream window, write it back (step overhead + DMA)
  alpha      + the _chunk_alpha_mxu chain (power matmul, exp, masks)
  scan       + _chunk_transmittance (log, bf16-split cumsum, exp, carry)
  gc         + gc matmul, wgc, suffix cumsum, dalpha, dpower
  full       the real _bwd_kernel body

Successive deltas = stage costs. Values are the real bench scene's (the
saturation early-exit and run gates are value-dependent, so random data
would misattribute).

Usage: python tools/kernel_ablate.py [--iters 30]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--w", type=int, default=1200)
    ap.add_argument("--h", type=int, default=680)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench as benchmod
    from splatam_tpu.render import pallas_raster as pr
    from splatam_tpu.render.geometry import TILE

    interpret = jax.default_backend() == "cpu"
    # the ablation rebuilds the ALIGNED bwd call shape; pin the layout (the
    # bench default flipped to 'split' in r5 — its interior tables repurpose
    # the skip bits as the SOLO flag and would misread here)
    b = benchmod.setup("aligned", n=args.n, w=args.w, h=args.h)
    w, h, chunk = b["w"], b["h"], b["cfg"].chunk
    grid_x = (w + TILE - 1) // TILE
    grid_y = (h + TILE - 1) // TILE
    num_tiles = grid_x * grid_y

    # real binned tables + stream at the bench capacities
    binned = jax.jit(b["bin_now"])(b["gauss"], b["sat0"])
    out = jax.jit(lambda g, bn: b["full_loss"](g, bn))(b["gauss"], binned)
    assert not bool(out.overflow)
    meta = binned.chunk_meta
    lim = binned.chunk_lim
    blk = binned.chunk_blk
    nc = int(meta.shape[0])

    # the stream the raster fn builds internally
    from splatam_tpu.core.losses import depth_silhouette_colors
    from splatam_tpu.core.transforms import normalize, transform_to_frame
    from splatam_tpu.render.geometry import preprocess

    params = dict(b["gauss"])
    rot0 = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    tran0 = jnp.zeros(3, jnp.float32)
    iso = params["log_scales"].shape[1] == 1
    log_scales = (
        jnp.tile(params["log_scales"], (1, 3)) if iso else params["log_scales"]
    )
    pts, rots, _ = transform_to_frame(
        params["means3D"], params["unnorm_rotations"], rot0, tran0,
        transform_rots=not iso, gaussians_grad=False, camera_grad=False,
    )
    from bench import make_scene

    _, active, cam = make_scene(args.n, w, h)
    proj = preprocess(pts, jnp.exp(log_scales), normalize(rots), cam,
                      active=active)
    feats = jnp.concatenate(
        [params["rgb_colors"], depth_silhouette_colors(pts, cam.viewmatrix)],
        axis=-1,
    )
    attrs = pr.pack_attrs(
        proj.means2d, proj.conic,
        jax.nn.sigmoid(params["logit_opacities"]).reshape(-1),
        proj.depths, feats,
    )
    stream = jax.jit(
        lambda a, g: pr._build_stream(a, g, chunk)
    )(attrs, binned.sorted_gid)

    rng = np.random.default_rng(0)
    g_color = jnp.asarray(
        rng.normal(size=(num_tiles, pr.NFEAT_PAD, pr.NPIX)).astype(np.float32)
        * 1e-3
    )
    gadep = jnp.asarray(
        rng.normal(size=(num_tiles, 8, pr.NPIX)).astype(np.float32) * 1e-3
    )

    ROWS, NPIX = pr.ROWS, pr.NPIX

    def body_stage(stage):
        """_bwd_kernel truncated after `stage`."""

        def kernel(meta_ref, lim_ref, blk_ref, inst_ref, phi_ref, phim_ref,
                   gcolor_ref, gadep_ref, ginst_ref,
                   t_run_sc, accwgc_sc, alive_sc, gdep_sc, ga_sc, *,
                   grid_x, chunk):
            c = pl.program_id(0)
            t, first, skip, lim_ = pr._meta(meta_ref, lim_ref, c)

            @pl.when(first == 1)
            def _():
                t_run_sc[:] = jnp.ones((NPIX, 1), jnp.float32)
                accwgc_sc[:] = jnp.zeros((NPIX, 1), jnp.float32)
                alive_sc[0] = 1
                gdep_sc[:] = pr._colx(gadep_ref[0], 0)
                ga_sc[:] = pr._colx(gadep_ref[0], 1)

            run = (lim_ > skip) & (alive_sc[0] == 1)

            @pl.when(jnp.logical_not(run))
            def _():
                # elementwise zero (not a scalar splat): Mosaic rejects the
                # (1,1)->(ROWS,chunk) both-dims broadcast in this context
                ginst_ref[:] = inst_ref[:] * 0.0

            @pl.when(run)
            def _():
                blk_ = inst_ref[:]
                if stage == "dma":
                    ginst_ref[:] = blk_
                    return
                alpha, raw, epow, op_m, xl, yl, keep, grad_ok = (
                    pr._chunk_alpha_mxu(
                        blk_, phi_ref[:], t, skip, lim_, chunk, grid_x
                    )
                )
                if stage == "alpha":
                    # consume every output so nothing is DCE'd
                    s = (jnp.sum(alpha, axis=0, keepdims=True)
                         + jnp.sum(jnp.where(grad_ok, epow, raw), axis=0,
                                   keepdims=True))
                    ginst_ref[:] = jnp.broadcast_to(
                        s + op_m + xl + yl, (ROWS, chunk)
                    )
                    return
                t_run = t_run_sc[:]
                t_before, t_cum, live, new_t_run = pr._chunk_transmittance(
                    alpha, t_run, "mxu", chunk, terms=2
                )
                w_ = jnp.where(live, alpha * t_before, 0.0)
                if stage == "scan":
                    s = jnp.sum(w_, axis=0, keepdims=True)
                    ginst_ref[:] = jnp.broadcast_to(s, (ROWS, chunk))
                    t_run_sc[:] = new_t_run
                    alive_sc[0] = (jnp.max(new_t_run) > 0.0).astype(jnp.int32)
                    return
                g_color_ = gcolor_ref[0]
                ga = ga_sc[:]
                feats_ = blk_[pr.ROW_FEAT0:, :]
                gc = jax.lax.dot_general(
                    g_color_, feats_, (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                wgc = w_ * gc
                rem = ga - accwgc_sc[:]
                suffix = rem - pr._cumsum_mxu(
                    wgc, pr._triangular(chunk), terms=2
                )
                dalpha = jnp.where(
                    live, t_before * gc - suffix / (1.0 - alpha), 0.0
                )
                unclamped = keep & (raw < pr.ALPHA_CAP)
                dop_int = jnp.where(unclamped, dalpha * epow, 0.0)
                dpower = jnp.where(grad_ok, dop_int, 0.0) * op_m
                if stage == "gc":
                    s = (jnp.sum(dpower, axis=0, keepdims=True)
                         + jnp.sum(dop_int, axis=0, keepdims=True))
                    ginst_ref[:] = jnp.broadcast_to(s, (ROWS, chunk))
                    t_run_sc[:] = new_t_run
                    alive_sc[0] = (jnp.max(new_t_run) > 0.0).astype(jnp.int32)
                    accwgc_sc[:] = accwgc_sc[:] + jnp.sum(
                        wgc, axis=1, keepdims=True
                    )
                    return
                raise ValueError(stage)

        return kernel

    def make_call(stage):
        if stage == "full":
            return pr._make_bwd_call(
                nc, num_tiles, grid_x, chunk, interpret, need_depth=False
            )
        if stage == "dma0":
            # no tensor inputs at all: write a constant block. Pure per-step
            # grid/output-flush overhead.
            def k0(meta_ref, lim_ref, blk_ref, ginst_ref):
                # iota + scalar ops, NOT a (1,1) splat: Mosaic has no
                # both-dims vector.broadcast for a lone constant write
                ginst_ref[:] = (
                    jax.lax.broadcasted_iota(jnp.int32, (ROWS, chunk), 1)
                    .astype(jnp.float32) * 0.0 + 1.0
                )

            return pl.pallas_call(
                k0,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(nc,),
                    in_specs=[],
                    out_specs=[pr._out_chunk_spec(ROWS, chunk)],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((ROWS, nc * chunk), jnp.float32)
                ],
                interpret=interpret,
            )
        if stage in ("dma_phi", "dma_tile"):
            # stream + (phi,phim consts | gcolor,gadep per-tile blocks):
            # attributes the input-block overhead between constant-index
            # blocks and per-tile-index blocks.
            in_specs = (
                [pr._stream_spec(chunk), pr._const_spec(27),
                 pr._const_spec(24)]
                if stage == "dma_phi"
                else [
                    pr._stream_spec(chunk),
                    pl.BlockSpec((1, pr.NFEAT_PAD, NPIX), pr._tile_of),
                    pl.BlockSpec((1, 8, NPIX), pr._tile_of),
                ]
            )

            def kp2(meta_ref, lim_ref, blk_ref, inst_ref, a_ref, b_ref,
                    ginst_ref, stage=stage):
                if stage == "dma_phi":
                    # bf16 consts: slice + cast + rank-0 reduce (scalar
                    # OPERANDS are fine; a (1,1) vector.broadcast is not)
                    ginst_ref[:] = (
                        inst_ref[:]
                        + jnp.sum(a_ref[0:1, 0:1].astype(jnp.float32))
                        + jnp.sum(b_ref[0:1, 0:1].astype(jnp.float32))
                    )
                else:
                    ginst_ref[:] = (
                        inst_ref[:]
                        + jnp.sum(a_ref[0, 0:1, 0:1])
                        + jnp.sum(b_ref[0, 0:1, 0:1])
                    )

            return pl.pallas_call(
                kp2,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(nc,),
                    in_specs=in_specs,
                    out_specs=[pr._out_chunk_spec(ROWS, chunk)],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((ROWS, nc * chunk), jnp.float32)
                ],
                interpret=interpret,
            )
        if stage == "dma_lean":
            # stream window in -> ginst out only (no phi/phim/gcolor/gadep
            # blocks): isolates the per-input-block cost of the bwd specs.
            def kl(meta_ref, lim_ref, blk_ref, inst_ref, ginst_ref):
                ginst_ref[:] = inst_ref[:]

            return pl.pallas_call(
                kl,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(nc,),
                    in_specs=[pr._stream_spec(chunk)],
                    out_specs=[pr._out_chunk_spec(ROWS, chunk)],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((ROWS, nc * chunk), jnp.float32)
                ],
                interpret=interpret,
            )
        return pl.pallas_call(
            functools.partial(body_stage(stage), grid_x=grid_x, chunk=chunk),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nc,),
                in_specs=[
                    pr._stream_spec(chunk),
                    pr._const_spec(27),
                    pr._const_spec(24),
                    pl.BlockSpec((1, pr.NFEAT_PAD, NPIX), pr._tile_of),
                    pl.BlockSpec((1, 8, NPIX), pr._tile_of),
                ],
                out_specs=[pr._out_chunk_spec(ROWS, chunk)],
                scratch_shapes=pr._common_scratch()
                + [pltpu.VMEM((NPIX, 1), jnp.float32)] * 2,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((ROWS, nc * chunk), jnp.float32)
            ],
            interpret=interpret,
        )

    results = {}
    for stage in ("dma0", "dma_lean", "dma_phi", "dma_tile", "dma", "alpha",
                  "scan", "gc", "full"):
        call = make_call(stage)

        @jax.jit
        def run(stream, x0, call=call, stage=stage):
            def it(i, x):
                # real data dependency between iterations via the prefetch
                # table (never true at runtime, not foldable at compile time)
                b = blk + jnp.where(x > 1e30, 1, 0).astype(jnp.int32)
                if stage == "dma0":
                    (g,) = call(meta, lim, b)
                elif stage == "dma_lean":
                    (g,) = call(meta, lim, b, stream)
                elif stage == "dma_phi":
                    (g,) = call(meta, lim, b, stream, pr._phi_pow(),
                                pr._phi_mom())
                elif stage == "dma_tile":
                    (g,) = call(meta, lim, b, stream, g_color, gadep)
                elif stage == "full":
                    # merged-input bwd signature (post input-merge)
                    gct = jnp.concatenate(
                        [g_color, gadep[:, 0:2],
                         jnp.zeros((g_color.shape[0], 6, NPIX), jnp.float32)],
                        axis=1,
                    )
                    (g,) = call(meta, lim, b, stream, pr._phi_pm(), gct)
                else:
                    (g,) = call(meta, lim, b, stream, pr._phi_pow(),
                                pr._phi_mom(), g_color, gadep)
                return jnp.sum(g[0, :8])
            return jax.lax.fori_loop(0, args.iters, it, x0)

        x = run(stream, jnp.float32(0.0))  # compile + warm
        _ = float(x)
        t0 = time.perf_counter()
        x = run(stream, jnp.float32(1.0))
        _ = float(x)
        dt = time.perf_counter() - t0
        us_step = dt / args.iters / nc * 1e6
        results[stage] = round(us_step, 4)
        print(f"{stage:6s}: {us_step * 1e3:8.1f} ns/step "
              f"({dt / args.iters * 1e3:.2f} ms/pass, nc={nc})", flush=True)

    print(json.dumps({"nc": nc, "per_step_us": results}))


if __name__ == "__main__":
    main()
