"""Size batched_map_step's per-device memory at post-opt scale.

VERDICT weak #6: the keyframe-batched refinement step (parallel/sharded.py)
is B x a full render in activation memory; this harness compiles it — no
execution — over a virtual device mesh at the real post-SLAM-refinement
shapes (ScanNet++ 876x584, mapping windows of 8-24 keyframes, 100k-1M
gaussians) and prints XLA's compiled memory statistics per device, so a
config can be sized against a chip's HBM (v5e 16 GB, v5p 95 GB) before
touching hardware.

Usage (CPU virtual mesh, no TPU needed):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/batched_map_size.py --width 876 --height 584 \
      --batch 8 --gaussians 300000 [--check]

`--check` also executes one step (slow at full scale; meant for small
shapes / tests). Run WITHOUT the flag on a dev box: compile-only is
minutes even at 876x584.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def measure(
    width: int,
    height: int,
    batch: int,
    gaussians: int,
    n_data: int = 2,
    check: bool = False,
):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_scene
    from splatam_tpu.core.losses import count_instances
    from splatam_tpu.core.optim import init_adam
    from splatam_tpu.core.params import GAUSSIAN_KEYS
    from splatam_tpu.parallel.mesh import make_mesh
    from splatam_tpu.parallel.sharded import batched_map_step
    from splatam_tpu.render.binning import RasterConfig, sized_config

    n_devices = len(jax.devices())
    mesh = make_mesh(n_tiles=n_devices // n_data, n_data=n_data)

    params, active, cam = make_scene(gaussians, width, height)
    rot = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    tran = jnp.zeros(3, jnp.float32)
    total = int(
        jax.jit(count_instances)(
            params, jnp.ones(gaussians, bool), rot, tran, cam
        )
    )
    cfg = sized_config(
        total,
        RasterConfig(
            max_instances=2**20, max_per_tile=1024, chunk=128,
            shard_axis="tiles",
        ),
    )

    rng = np.random.default_rng(0)
    rots = jnp.asarray(
        np.tile(np.array([1, 0, 0, 0], np.float32), (batch, 1))
        + 0.01 * rng.normal(size=(batch, 4)).astype(np.float32)
    )
    trans = jnp.asarray(0.01 * rng.normal(size=(batch, 3)).astype(np.float32))
    ims = jnp.asarray(
        rng.uniform(0, 1, (batch, 3, height, width)).astype(np.float32)
    )
    depths = jnp.asarray(
        rng.uniform(0.5, 3.0, (batch, 1, height, width)).astype(np.float32)
    )
    opt_state = init_adam({k: params[k] for k in GAUSSIAN_KEYS})
    lrs = (
        ("log_scales", 0.001), ("logit_opacities", 0.05),
        ("means3D", 0.0001), ("rgb_colors", 0.0025),
        ("unnorm_rotations", 0.001),
    )

    ctx = jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh
    with ctx:
        lowered = batched_map_step.lower(
            params, active, opt_state, rots, trans, ims, depths, cam, cfg,
            lrs=lrs,
        )
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        stats = {
            "devices": n_devices,
            "mesh": f"data={n_data} x tiles={n_devices // n_data}",
            "batch": batch,
            "image": f"{width}x{height}",
            "gaussians": gaussians,
            "instances": total,
            "arg_mb": ma.argument_size_in_bytes / 2**20,
            "out_mb": ma.output_size_in_bytes / 2**20,
            "temp_mb": ma.temp_size_in_bytes / 2**20,
            "total_mb": (
                ma.argument_size_in_bytes
                + ma.output_size_in_bytes
                + ma.temp_size_in_bytes
            )
            / 2**20,
        }
        # temp stats are PER PROGRAM; under SPMD each device holds its own
        # shard of arguments + the replicated gaussian params, so this is a
        # per-device figure already (XLA reports the per-participant module)
        stats["fits_v5e_16gb"] = stats["total_mb"] < 0.9 * 16 * 1024
        stats["fits_v5p_95gb"] = stats["total_mb"] < 0.9 * 95 * 1024
        if check:
            out = batched_map_step(
                params, active, opt_state, rots, trans, ims, depths, cam,
                cfg, lrs=lrs,
            )
            stats["loss"] = float(out[2])
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=876)
    ap.add_argument("--height", type=int, default=584)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gaussians", type=int, default=300_000)
    ap.add_argument("--n-data", type=int, default=2)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax

    if "xla_force_host_platform_device_count" in os.environ.get(
        "XLA_FLAGS", ""
    ):
        jax.config.update("jax_platforms", "cpu")

    stats = measure(
        args.width, args.height, args.batch, args.gaussians,
        n_data=args.n_data, check=args.check,
    )
    for k, v in stats.items():
        print(f"{k}: {v:.1f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
