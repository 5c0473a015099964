"""Measure the Pallas per-grid-step fixed overhead on the real chip.

The render kernels run ~8-10k grid steps per pass at ~1 us/step while their
in-step compute (one (256,128) MXU quadratic + cumsum + blend) should cost
well under half that — if true, most kernel time is per-step overhead
(block DMA issue, semaphores, index-map scalar work), and batching G chunks
per step (an in-kernel loop with manual double-buffered DMA) is the next
big lever. This probe times the SAME BlockSpec/grid shape as the fwd kernel
with three bodies:

  empty   — step does nothing (pure per-step overhead)
  passthru— step copies its stream window to the output block (DMA cost)
  mxu     — step does one (256,128)x(128,128) matmul (the cumsum's MXU cost)

Chained-fori timing per CLAUDE.md (block_until_ready lies on axon).

Usage: python tools/step_overhead.py [--steps 8000] [--chunk 128]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    if os.environ.get("SPLATAM_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    interpret = jax.default_backend() == "cpu"
    steps, chunk = args.steps, args.chunk
    ROWS, NPIX = 16, 256

    stream = jnp.asarray(
        np.random.default_rng(0).normal(size=(ROWS, steps * chunk)).astype(np.float32)
    )
    blkidx = jnp.arange(steps, dtype=jnp.int32)

    from jax.experimental.pallas import tpu as pltpu

    def make_pf(body_kind):
        def kernel(blk_ref, inst_ref, out_ref, acc_ref):
            c = pl.program_id(0)

            @pl.when(c == 0)
            def _():
                acc_ref[:] = jnp.zeros((NPIX, chunk), jnp.float32)
                out_ref[:] = jnp.zeros((NPIX, chunk), jnp.float32)

            def bcast(row0):
                return jnp.broadcast_to(inst_ref[row0 : row0 + 1, :], (NPIX, chunk))

            tri32 = None
            if body_kind != "empty":
                tri32 = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))
            if body_kind == "passthru":
                acc_ref[:] += bcast(0)
            elif body_kind == "mxu":
                acc_ref[:] += jax.lax.dot(
                    bcast(0), tri32, precision=jax.lax.Precision.DEFAULT
                )
            elif body_kind == "mxu2dep":
                # two DEPENDENT dots (the terms=2 cumsum shape today)
                y = jax.lax.dot(
                    bcast(0), tri32, precision=jax.lax.Precision.DEFAULT
                )
                acc_ref[:] += jax.lax.dot(
                    y * 1e-3, tri32, precision=jax.lax.Precision.DEFAULT
                )
            elif body_kind == "mxu2ind":
                # two INDEPENDENT dots (tile A + tile B of a dual step)
                acc_ref[:] += jax.lax.dot(
                    bcast(0), tri32, precision=jax.lax.Precision.DEFAULT
                ) + jax.lax.dot(
                    bcast(1), tri32, precision=jax.lax.Precision.DEFAULT
                )
            elif body_kind == "mxu512":
                # ONE batched (512, chunk) dot = the merged two-term cumsum
                a = jnp.concatenate([bcast(0), bcast(1)], axis=0)
                y = jax.lax.dot(
                    a, tri32, precision=jax.lax.Precision.DEFAULT
                )
                acc_ref[:] += y[:NPIX, :] + y[NPIX:, :]

            @pl.when(c == pl.num_programs(0) - 1)
            def _():
                out_ref[:] = acc_ref[:]

        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec((ROWS, chunk), lambda c, blk: (0, blk[c])),
                ],
                out_specs=pl.BlockSpec((NPIX, chunk), lambda c, blk: (0, 0)),
                scratch_shapes=[pltpu.VMEM((NPIX, chunk), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((NPIX, chunk), jnp.float32),
            interpret=interpret,
        )

    for kind in ("empty", "passthru", "mxu", "mxu2dep", "mxu2ind", "mxu512"):
        call = make_pf(kind)

        @jax.jit
        def run(stream, blkidx, call=call):
            def body(i, s):
                out = call(blkidx, s)
                # real data dependency between iterations
                return s + 1e-30 * out[0, 0]

            s = jax.lax.fori_loop(0, args.iters, body, stream)
            return s[0, 0]

        v = float(run(stream, blkidx))  # compile + warm
        t0 = time.perf_counter()
        v = float(run(stream, blkidx))
        dt = time.perf_counter() - t0
        per_step_us = dt / args.iters / steps * 1e6
        print(
            f"{kind:<9} total {dt*1e3:8.1f} ms  per-pass "
            f"{dt/args.iters*1e3:7.2f} ms  per-step {per_step_us:6.3f} us"
        )


if __name__ == "__main__":
    main()
