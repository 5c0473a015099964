"""Microbenchmark TPU primitive costs for the instance-stream data path.

Chained fori_loop with a real data dependency (CLAUDE.md recipe); barriers
between stages so fusions don't cross the op under test.

Usage: python tools/prim_bench.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

M = 1_000_000
N = 200_000
REPS = 20


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(i, carry):
            out = fn(*jax.tree.map(lambda x: x, a), carry)
            return carry + 1e-20 * out
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    r = run(*args)
    r.block_until_ready()
    _ = float(r)
    t0 = time.perf_counter()
    r = run(*args)
    _ = float(r)
    dt = (time.perf_counter() - t0 - 0.035) / REPS * 1000
    print(f"{name:<58} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    key_f = jnp.asarray(rng.uniform(0, 1, M).astype(np.float32))
    key_i = jnp.asarray(rng.integers(0, 3225, M).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    idx_mono = jnp.sort(idx)
    vals16 = [jnp.asarray(rng.uniform(0, 1, M).astype(np.float32)) for _ in range(16)]
    tbl_rows = jnp.asarray(rng.uniform(0, 1, (N, 16)).astype(np.float32))
    tbl_cols = jnp.asarray(rng.uniform(0, 1, (16, N)).astype(np.float32))
    big_rows = jnp.asarray(rng.uniform(0, 1, (M, 16)).astype(np.float32))
    big_cols = jnp.asarray(rng.uniform(0, 1, (16, M)).astype(np.float32))
    starts = jnp.asarray(np.sort(rng.integers(0, M - 128, 8000)).astype(np.int32))

    b = jax.lax.optimization_barrier

    timeit("sort 2op (f32 key + iota)", lambda k, i, c: jnp.sum(
        jax.lax.sort((b(k + c), i), num_keys=1)[1].astype(jnp.float32)), key_f,
        jnp.arange(M, dtype=jnp.int32))
    timeit("sort 3op (i32,f32 keys + gid)", lambda ki, kf, g, c: jnp.sum(
        jax.lax.sort((b(ki), kf + c, g), num_keys=2)[2].astype(jnp.float32)),
        key_i, key_f, idx)
    timeit("sort 4op", lambda ki, kf, g, i2, c: jnp.sum(
        jax.lax.sort((b(ki), kf + c, g, i2), num_keys=2)[2].astype(jnp.float32)),
        key_i, key_f, idx, jnp.arange(M, dtype=jnp.int32))

    def sort19(ki, kf, *rest):
        vs, c = rest[:-1], rest[-1]
        out = jax.lax.sort((b(ki), kf + c) + vs, num_keys=2)
        return jnp.sum(out[2])

    timeit("sort 18op (2 keys + 16 f32 values)", sort19, key_i, key_f, *vals16)

    timeit("take 1M x width-1 (1-D int gather)", lambda t, i, c: jnp.sum(
        jnp.take(b(t + c), i)), key_f, idx)
    timeit("take 1M rows from (N,16) row-major", lambda t, i, c: jnp.sum(
        jnp.take(b(t + c), i, axis=0)), tbl_rows, idx)
    timeit("take 1M cols from (16,N) col layout", lambda t, i, c: jnp.sum(
        jnp.take(b(t + c), i, axis=1)), tbl_cols, idx)
    timeit("take 1M rows monotonic idx", lambda t, i, c: jnp.sum(
        jnp.take(b(t + c), i, axis=0)), tbl_rows, idx_mono)
    timeit("take 1M rows from (M,16) (perm apply)", lambda t, i, c: jnp.sum(
        jnp.take(b(t + c), i, axis=0)), big_rows,
        jnp.asarray(rng.permutation(M).astype(np.int32)))

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

    def win_gather(t, s, c):
        w = jax.lax.gather(b(t + c), s[:, None], dn, slice_sizes=(128, 16),
                           mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(w)

    timeit("8k window-slices (128,16) from (M,16)", win_gather, big_rows, starts)

    timeit("transpose (M,16)->(16,M)", lambda t, c: jnp.sum(
        b(t + c).T * 1.000001), big_rows)
    timeit("transpose (16,M)->(M,16)", lambda t, c: jnp.sum(
        b(t + c).T * 1.000001), big_cols)
    timeit("cumsum (M,16) axis0", lambda t, c: jnp.sum(
        jnp.cumsum(b(t + c), axis=0)[-1]), big_rows)
    timeit("cumsum (16,M) axis1", lambda t, c: jnp.sum(
        jnp.cumsum(b(t + c), axis=1)[:, -1]), big_cols)
    timeit("cumsum 1M 1-D", lambda t, c: jnp.sum(jnp.cumsum(b(t + c))[-1:]),
           key_f)


if __name__ == "__main__":
    main()
