"""Second round of primitive measurements: gradient-reduction options.

All candidates consume every output (sum of full result) so nothing is DCE'd.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

M = 1_200_000
N = 200_000
NB = 10_000
REPS = 10


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(i, carry):
            out = fn(*a, carry)
            return carry + 1e-20 * out
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    r = run(*args)
    _ = float(r)
    t0 = time.perf_counter()
    _ = float(run(*args))
    dt = (time.perf_counter() - t0 - 0.035) / REPS * 1000
    print(f"{name:<58} {dt:8.3f} ms")


def main():
    rng = np.random.default_rng(0)
    b = jax.lax.optimization_barrier

    grads_rows = jnp.asarray(rng.uniform(-1, 1, (M, 16)).astype(np.float32))
    grads_cols = jnp.asarray(rng.uniform(-1, 1, (16, M)).astype(np.float32))
    gid = jnp.asarray(np.sort(rng.integers(0, N, M)).astype(np.int32))
    gid_rand = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    blk_idx = jnp.asarray(np.sort(rng.integers(0, NB, NB + 3200)).astype(np.int32))
    chunks = jnp.asarray(rng.uniform(-1, 1, (16, NB + 3200, 128)).astype(np.float32))

    # 1. scatter-add rows by gid into (N,16)
    timeit(
        "scatter-add (M,16) rows by 1M random gid -> (N,16)",
        lambda g, i, c: jnp.sum(
            jnp.zeros((N, 16), jnp.float32).at[b(i), :].add(g + c)
        ),
        grads_rows, gid_rand,
    )
    # 2. scatter-add cols
    timeit(
        "scatter-add (16,M) cols by 1M random gid -> (16,N)",
        lambda g, i, c: jnp.sum(
            jnp.zeros((16, N), jnp.float32).at[:, b(i)].add(g + c)
        ),
        grads_cols, gid_rand,
    )
    # 3. block scatter: 13.2k chunk planes (16,128) by block idx -> (16,NB,128)
    timeit(
        "scatter-add 13k (16,128) planes by block idx",
        lambda g, i, c: jnp.sum(
            jnp.zeros((16, NB, 128), jnp.float32).at[:, b(i), :].add(g + c)
        ),
        chunks, blk_idx,
    )
    # 4. apply known perm: rows (M,16) gather by random perm (from M table)
    timeit(
        "take (M,16) rows by 1M perm (known-perm apply)",
        lambda g, i, c: jnp.sum(jnp.take(g + c, b(i), axis=0)),
        grads_rows, perm,
    )
    # 5. value sort: key + 13 f32 rows, all consumed
    rows13 = tuple(
        jnp.asarray(rng.uniform(-1, 1, M).astype(np.float32)) for _ in range(13)
    )
    key_f = gid_rand.astype(jnp.float32)

    def vsort(key, *rest):
        vs, c = rest[:-1], rest[-1]
        out = jax.lax.sort((b(key + c),) + vs, num_keys=1)
        return sum(jnp.sum(o) for o in out[1:])

    timeit("sort f32 key + 13 f32 values (all consumed)", vsort, key_f, *rows13)

    # 6. same but only key+iota, then 13 row-takes... (take cost dominates)
    def sort_take(key, g, c):
        _, p = jax.lax.sort(
            (b(key + c), jnp.arange(M, dtype=jnp.int32)), num_keys=1
        )
        return jnp.sum(jnp.take(g, p, axis=0))

    timeit("sort (key,iota) + take (M,16) rows by perm", sort_take, key_f,
           grads_rows)

    # 7. segment boundaries: 2x take of N rows from (M,16) cumsum table
    ends = jnp.asarray(np.sort(rng.integers(0, M, N)).astype(np.int32))
    timeit(
        "cumsum (M,16) axis0 + 2x take N rows (boundaries)",
        lambda g, e, c: jnp.sum(
            jnp.take(jnp.cumsum(g + c, axis=0), b(e), axis=0)
        ) + jnp.sum(
            jnp.take(jnp.cumsum(g + c, axis=0), b(jnp.maximum(e - 1, 0)), axis=0)
        ),
        grads_rows, ends,
    )


if __name__ == "__main__":
    main()
