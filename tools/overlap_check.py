"""Collective/compute overlap check on the REAL TPU target (VERDICT r3 item 8).

SURVEY §2.3 item 3 claims the prim-sharded backward's record all_gather /
psum_scatter overlap with kernel compute. The virtual-CPU dryrun cannot
show this (XLA:CPU emits synchronous collectives), but
jax.experimental.topologies lets us AOT-compile the SAME program against a
multi-chip v5e topology WITHOUT hardware and inspect the compiled HLO:
async pairs (-start/-done) are schedulable around compute; bare collectives
are synchronization points.

Measured 2026-08-19 (v5e:2x4, render_prim_sharded grad):
  async:  collective-permute-start x6, all-gather-start x2
  sync:   all-gather x2, all-reduce x1 (the terminal grad reduction — at
          the end of the backward there is no compute left to overlap)

Usage: python tools/overlap_check.py [--topology v5e:2x4]
"""
from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--hlo_out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    import __graft_entry__ as g
    from splatam_tpu.parallel.prim_sharded import render_prim_sharded
    from splatam_tpu.render.binning import RasterConfig

    topo = topologies.get_topology_desc(args.topology, "tpu")
    mesh = Mesh(np.array(topo.devices), ("prims",))

    params, active, cam = g._toy_scene(n=256, w=96, h=64)
    cfg = RasterConfig(max_instances=2**14, max_per_tile=256, chunk=128)
    rot0 = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    tran0 = jnp.zeros(3, jnp.float32)

    def prim_loss(p):
        o, _ = render_prim_sharded(p, active, rot0, tran0, cam, cfg, mesh)
        return jnp.sum(o.color)

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    hlo = (
        jax.jit(lambda p: jax.grad(prim_loss)(p))
        .lower(abstract)
        .compile()
        .as_text()
    )
    starts = re.findall(
        r"(all-gather-start|all-reduce-start|collective-permute-start|"
        r"reduce-scatter)", hlo,
    )
    syncs = re.findall(
        r"= [^\n]*? (all-gather|all-reduce|collective-permute)\(", hlo
    )
    print("async starts:", {s: starts.count(s) for s in set(starts)})
    print("sync collectives:", {s: syncs.count(s) for s in set(syncs)})
    if args.hlo_out:
        open(args.hlo_out, "w").write(hlo)
    ok = len(starts) > 0
    print("OVERLAP " + ("OK (async collectives present)" if ok else "ABSENT"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
