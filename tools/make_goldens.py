"""Generate frozen golden renders for the jnp oracle (VERDICT r1 item 8b).

The in-repo jnp rasterizer is the parity oracle for every kernel test
(BASELINE configs[0] proxy — no CUDA GPU exists in this environment), so a
silent semantics regression in it would re-baseline everything. This script
renders three small scenes with the DENSE per-pixel oracle
(`render/reference.py`) and freezes color/depth/final_t to
tests/goldens/*.npz; tests/test_goldens.py pins both the dense oracle and
the tiled jnp path against them forever after.

Run from the repo root to (re)generate — only after an INTENTIONAL,
documented semantics change:  python tools/make_goldens.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")

import numpy as np


def scenes():
    import jax.numpy as jnp

    from splatam_tpu.render.camera import setup_camera

    rng = np.random.default_rng(11)

    def rand_scene(n, w, h, aniso):
        means = np.stack(
            [
                rng.uniform(-0.9, 0.9, n),
                rng.uniform(-0.7, 0.7, n),
                rng.uniform(1.0, 4.0, n),
            ],
            axis=-1,
        ).astype(np.float32)
        quats = (rng.normal(size=(n, 4)) + np.array([2.0, 0, 0, 0])).astype(
            np.float32
        )
        scales = rng.uniform(-3.4, -2.2, (n, 3 if aniso else 1)).astype(
            np.float32
        )
        if not aniso:
            scales = np.tile(scales, (1, 3))
        cam = setup_camera(
            w, h, [[w * 0.9, 0, w / 2], [0, w * 0.9, h / 2], [0, 0, 1]],
            np.eye(4),
        )
        return dict(
            means=jnp.asarray(means),
            colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
            opac=jnp.asarray(
                (1 / (1 + np.exp(-rng.normal(0.5, 1.0, n)))).astype(np.float32)
            ),
            scales=jnp.exp(jnp.asarray(scales)),
            quats=jnp.asarray(quats),
            cam=cam,
        )

    return {
        "sparse_iso": rand_scene(48, 96, 64, aniso=False),
        "dense_aniso": rand_scene(256, 96, 64, aniso=True),
        "overlap_deep": rand_scene(128, 64, 48, aniso=False),
    }


def main():
    from splatam_tpu.render.reference import rasterize_dense

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, s in scenes().items():
        out = rasterize_dense(
            s["means"], s["colors"], s["opac"], s["scales"], s["quats"],
            s["cam"],
        )
        np.savez(
            os.path.join(out_dir, f"{name}.npz"),
            color=np.asarray(out.color),
            depth=np.asarray(out.depth),
            final_t=np.asarray(out.final_t),
            radius=np.asarray(out.radius),
        )
        print(f"{name}: color {np.asarray(out.color).shape} "
              f"mean {float(np.asarray(out.color).mean()):.4f}")


if __name__ == "__main__":
    main()
