"""On-chip VPU cost probe: f32 vs bf16 elementwise, transcendental cost.

Measures the per-(NPIX, chunk)-op cost the kernel cost model (PROFILE.md)
is built on, and answers two design questions for the packed-layout kernel
rewrite:
  * does bf16 elementwise math run faster than f32 on this chip's VPU
    (packed ALU or halved VMEM traffic), and by how much?
  * what do exp / log1p actually cost relative to a mul/add?

Method: a Pallas kernel with a grid of `steps` programs, each applying
`reps` dependent elementwise ops to a (256, chunk) block. Grid overhead is
measured with reps=0 and subtracted. Device time via the chained-fori
pattern (CLAUDE.md: block_until_ready does not block through the tunnel).
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NPIX = 256


def _kernel(x_ref, o_ref, *, reps: int, op: str):
    x = x_ref[:]
    # chains are NONLINEAR in x so XLA/Mosaic cannot fold the reps into
    # one affine op (a linear chain measured as ~0 ns/op)
    if op == "exp":
        for _ in range(reps):
            x = jnp.exp(x) * 0.5
    elif op == "log":
        for _ in range(reps):
            x = jnp.log(x * x + 0.5)
    elif op == "log1p":
        for _ in range(reps):
            x = jnp.log1p(x * 0.25)
    elif op == "mul_add":
        for _ in range(reps):
            x = x * x + 0.25
    elif op == "where":
        for _ in range(reps):
            x = jnp.where(x > 0.5, x * x, x + 0.25)
    elif op == "roll":
        for _ in range(reps):
            x = x * pltpu.roll(x, 1, 1) * 0.5 + 0.7
    o_ref[:] = x.astype(o_ref.dtype)


@functools.lru_cache(maxsize=64)
def _make(steps, chunk, reps, op, dtype):
    return pl.pallas_call(
        functools.partial(_kernel, reps=reps, op=op),
        grid=(steps,),
        in_specs=[pl.BlockSpec((NPIX, chunk), lambda c: (0, c))],
        out_specs=pl.BlockSpec((NPIX, chunk), lambda c: (0, c)),
        out_shape=jax.ShapeDtypeStruct((NPIX, steps * chunk), dtype),
    )


def run(steps=2000, chunk=128, iters=20):
    results = {}
    cases = [
        ("float32", jnp.float32, ("mul_add", "where", "exp", "log", "log1p", "roll")),
        # bf16 transcendentals do not legalize in Mosaic (math.log1p on
        # vector<...xbf16> fails) — probe only the elementwise ALU ops
        ("bfloat16", jnp.bfloat16, ("mul_add", "where", "roll")),
    ]
    for dname, dtype, ops in cases:
        for op in ops:
            for reps in (0, 16):
                x = jnp.full((NPIX, steps * chunk), 0.6, dtype)
                call = _make(steps, chunk, reps, op, dtype)

                @jax.jit
                def loop(x):
                    def body(i, x):
                        y = call(x)
                        return x + (1e-20 * y).astype(x.dtype)

                    return jax.lax.fori_loop(0, iters, body, x)[0, 0]

                try:
                    loop(x)  # compile+warm
                    t0 = time.perf_counter()
                    float(loop(x))
                    dt = time.perf_counter() - t0
                except Exception as e:  # pragma: no cover - probe tool
                    print(f"SKIP {dname} {op} reps={reps}: {str(e)[:120]}")
                    dt = float("nan")
                ns_per_step = dt / iters / steps * 1e9
                results[(dname, op, reps)] = ns_per_step
    print(f"{'dtype':9s} {'op':8s} base_ns/step  ns/op  (chunk={chunk})")
    for dname, _, ops in cases:
        for op in ops:
            base = results[(dname, op, 0)]
            per = (results[(dname, op, 16)] - base) / 16
            print(f"{dname:9s} {op:8s} {base:8.1f} {per:10.2f}")


if __name__ == "__main__":
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    run(chunk=chunk)
