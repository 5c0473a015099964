"""On-chip sharded-vs-unsharded render overhead at mesh size 1.

VERDICT r3 item 2: `__graft_entry__.py` promised this measurement and the
file did not exist. With ONE real chip, the honest measurable quantity is
the OVERHEAD the tile-sharded formulation adds at mesh size 1 — shard_map
plumbing, band clipping/recount, the padded-band layout and the row
reassembly gather — i.e. the constant-factor cost the scaling efficiency
curve starts from (speedup(n) <= n / (1 + overhead)).

Method: jitted fwd+grad of the same scene through rasterize_tiled (plain)
and rasterize_rows_sharded on a 1-device mesh, chained-fori device timing
(CLAUDE.md: block_until_ready does not block through the axon tunnel).

Usage: python tools/shard_overhead.py [--n 100000] [--iters 10]
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--w", type=int, default=1200)
    ap.add_argument("--h", type=int, default=680)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from bench import make_scene
    from splatam_tpu.parallel.pallas_sharded import rasterize_rows_sharded
    from splatam_tpu.render.binning import RasterConfig
    from splatam_tpu.render.render_tiled import rasterize_tiled

    if jax.default_backend() == "cpu":
        print("NOTE: cpu backend — numbers are not the on-chip measurement")

    params, active, cam = make_scene(args.n, args.w, args.h, seed=5)
    cfg = RasterConfig(max_instances=2**20, max_per_tile=1024, chunk=128,
                       backend="pallas")
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("tiles",))

    raster_args = (
        params["means3D"],
        params["rgb_colors"],
        jax.nn.sigmoid(params["logit_opacities"]).reshape(-1),
        jnp.exp(jnp.tile(params["log_scales"], (1, 3))),
        params["unnorm_rotations"] / jnp.linalg.norm(
            params["unnorm_rotations"], axis=-1, keepdims=True
        ),
    )

    def loss_plain(m, c, o, s, q):
        out, _ = rasterize_tiled(m, c, o, s, q, cam, cfg=cfg)
        return jnp.sum(out.color) + jnp.sum(out.final_t)

    def loss_sharded(m, c, o, s, q):
        out, _ = rasterize_rows_sharded(
            m, c, o, s, q, cam, cfg, mesh1, axis_name="tiles", active=active
        )
        return jnp.sum(out.color) + jnp.sum(out.final_t)

    def timed(loss_fn, label):
        g = jax.grad(loss_fn, argnums=(0, 1, 2))

        @jax.jit
        def run(a0, a1, a2, a3, a4):
            def body(i, carry):
                m, acc = carry
                gm, _, _ = g(m, a1, a2, a3, a4)
                return (m + 1e-20 * gm, acc + gm[0, 0])

            m, acc = jax.lax.fori_loop(
                0, args.iters, body, (a0, jnp.float32(0.0))
            )
            return acc + m[0, 0]

        float(run(*raster_args))  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(*raster_args))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.iters * 1e3
        print(f"{label:<10} {ms:8.2f} ms/iter (fwd+grad)")
        return ms

    plain = timed(loss_plain, "plain")
    sharded = timed(loss_sharded, "sharded@1")
    ovh = sharded / plain - 1.0
    print(
        f"mesh-1 sharded overhead: {ovh * 100:+.1f}%  "
        f"(scaling efficiency ceiling at n devices ~ n / (1 + {ovh:.3f}))"
    )


if __name__ == "__main__":
    main()
