"""On-chip ILP/overlap probe for the render-kernel cost model (round 4).

The kernels' per-chunk body is one long DEPENDENT chain: alpha (VPU) ->
log (VPU) -> triangular cumsum (MXU) -> exp (VPU) -> blend matmul (MXU).
PROFILE.md's round-3 model priced it at ~30 ns per (256, 128) elementwise
op — ~3x the ~11 ns a clean dependent VPU chain achieves (vpu_probe.py).
Hypotheses this probe separates:

  H1 (unit serialization): MXU passes in the chain cannot overlap VPU work
     because everything is one dependency chain; a grid step with TWO
     independent streams (tile A's VPU math against tile B's MXU cumsum)
     would recover the overlap -> time(dual) ~ max, not 2x.
  H2 (per-step overhead): the fixed cost of a grid step is large enough
     that halving the step count at constant total work wins on its own.

I/O is sized like the REAL kernels (one (16, chunk) stream block in, one
small block out — ~8 KB/step, not full (256, chunk) operands): the first
cut of this probe streamed 512 KB/step and measured pure DMA. Compute is
expanded from the tiny input in-kernel. Each case is timed at reps and at
reps=0 and the difference is reported (vpu_probe.py's method).
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NPIX = 256
CHUNK = 128
ROWS = 16


def _tri():
    i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (i <= j).astype(jnp.bfloat16)


def _mxu_pass(x, tri):
    x1 = x.astype(jnp.bfloat16)
    x2 = (x - x1.astype(jnp.float32)).astype(jnp.bfloat16)

    def term(t):
        return jax.lax.dot_general(
            t, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return term(x1) + term(x2)


def _vpu(x, reps):
    for _ in range(reps):
        x = x * x * -0.5 + 0.6
    return x


def _chain(x, tri, reps):
    """reps x (4 VPU -> 1 two-term MXU cumsum -> 4 VPU) — render-step shaped."""
    for _ in range(reps):
        x = _vpu(x, 4)
        x = _mxu_pass(x, tri) * 1e-3
        x = _vpu(x, 4)
    return x


def _kernel(a_ref, b_ref, oa_ref, ob_ref, *, case: str, reps: int):
    tri = _tri()
    # expand tiny (ROWS, CHUNK) inputs to full (NPIX, CHUNK) working sets
    ii = jax.lax.broadcasted_iota(jnp.int32, (NPIX, CHUNK), 0).astype(
        jnp.float32
    )
    x = a_ref[0:1, :] * ii * 1e-3
    y = b_ref[0:1, :] * ii * 1e-3
    if case == "vpu":
        x = _vpu(x, 8 * reps)
    elif case == "mxu":
        for _ in range(reps):
            x = _mxu_pass(x, tri) * 1e-3
    elif case == "chain":
        x = _chain(x, tri, reps)
    elif case == "dual":
        # SAME op mix as 2 x chain, but as two INDEPENDENT chains
        x = _chain(x, tri, reps)
        y = _chain(y, tri, reps)
    elif case == "vpu_dual":
        x = _vpu(x, 8 * reps)
        y = _vpu(y, 8 * reps)
    oa_ref[:] = x[:ROWS, :]
    ob_ref[:] = y[:ROWS, :]


@functools.lru_cache(maxsize=64)
def _make(steps, case, reps):
    return pl.pallas_call(
        functools.partial(_kernel, case=case, reps=reps),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((ROWS, CHUNK), lambda c: (0, c)),
            pl.BlockSpec((ROWS, CHUNK), lambda c: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, CHUNK), lambda c: (0, c)),
            pl.BlockSpec((ROWS, CHUNK), lambda c: (0, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, steps * CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((ROWS, steps * CHUNK), jnp.float32),
        ],
    )


def time_case(case, reps, steps=2000, iters=20):
    a = jnp.full((ROWS, steps * CHUNK), 0.6, jnp.float32)
    b = jnp.full((ROWS, steps * CHUNK), 0.4, jnp.float32)
    call = _make(steps, case, reps)

    @jax.jit
    def loop(a, b):
        def body(i, c):
            a, b = c
            oa, ob = call(a, b)
            return (a + 1e-20 * oa, b + 1e-20 * ob)

        r = jax.lax.fori_loop(0, iters, body, (a, b))
        return r[0][0, 0] + r[1][0, 0]

    loop(a, b)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(a, b))
        best = min(best, time.perf_counter() - t0)
    return best / iters / steps * 1e9  # ns per grid step


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    reps = 4
    print(f"(per grid step, reps={reps}; compute = t(reps) - t(0))")
    res = {}
    for case in ("vpu", "mxu", "chain", "dual", "vpu_dual"):
        t0 = time_case(case, 0, steps)
        t1 = time_case(case, reps, steps)
        res[case] = t1 - t0
        print(
            f"{case:9s} base={t0:7.1f} ns  full={t1:7.1f} ns  "
            f"compute={t1 - t0:7.1f} ns"
        )
    print(
        f"dual/chain: {res['dual'] / res['chain']:.2f} (2.0 = no overlap win)"
    )
    print(
        f"vpu_dual/vpu: {res['vpu_dual'] / res['vpu']:.2f}"
    )
    print(
        f"chain vs parts: chain={res['chain']:.0f} vs vpu={res['vpu']:.0f}"
        f" + mxu={res['mxu']:.0f} (sum {res['vpu'] + res['mxu']:.0f};"
        f" ratio {res['chain'] / (res['vpu'] + res['mxu']):.2f})"
    )
    # per-op rates for the roofline: vpu case runs 8*reps dependent mul_adds
    print(
        f"vpu ns/(256,128)-op: {res['vpu'] / (8 * reps):.1f}   "
        f"mxu ns/two-term cumsum pass: {res['mxu'] / reps:.1f}"
    )


if __name__ == "__main__":
    main()
