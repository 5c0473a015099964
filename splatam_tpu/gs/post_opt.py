"""Post-SplaTAM map refinement.

Parity with `scripts/post_splatam_opt.py:68-108,160-262`: initialize the
gaussian map from a saved SplaTAM checkpoint (params.npz), keep the
ESTIMATED camera trajectory fixed, and run the offline-3DGS optimization
(random-frame sampling + Inria densification) on top.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from splatam_tpu.core.params import (
    GAUSSIAN_KEYS,
    Params,
    Variables,
    round_capacity,
)
from splatam_tpu.core.transforms import pose_to_w2c
from splatam_tpu.gs.offline import offline_splatting
from splatam_tpu.slam.pipeline import SlamState


def initialize_from_checkpoint(
    ckpt: Dict[str, np.ndarray], num_frames: int
) -> Tuple[Params, Variables, np.ndarray]:
    """Rebuild (params, variables) + estimated w2c trajectory from a saved
    params.npz (`post_splatam_opt.py:68-108`)."""
    m = ckpt["means3D"].shape[0]
    cap = round_capacity(m)

    def pad(x):
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:m] = x
        return jnp.asarray(out)

    params: Params = {k: pad(np.asarray(ckpt[k])) for k in GAUSSIAN_KEYS}
    params["cam_unnorm_rots"] = jnp.asarray(ckpt["cam_unnorm_rots"], jnp.float32)
    params["cam_trans"] = jnp.asarray(ckpt["cam_trans"], jnp.float32)

    active = np.zeros(cap, bool)
    active[:m] = True
    variables: Variables = {
        "active": jnp.asarray(active),
        "max_2D_radius": jnp.zeros(cap, jnp.float32),
        "means2D_gradient_accum": jnp.zeros(cap, jnp.float32),
        "denom": jnp.zeros(cap, jnp.float32),
        "timestep": jnp.asarray(
            np.pad(
                np.asarray(ckpt.get("timestep", np.zeros(m))).astype(np.float32),
                (0, cap - m),
            )
        ),
    }

    from splatam_tpu.core.params import get_pose

    est_w2c = np.stack(
        [
            np.asarray(pose_to_w2c(*get_pose(params, t)))
            for t in range(min(num_frames, params["cam_trans"].shape[-1]))
        ]
    )
    return params, variables, est_w2c


def post_splatam_opt(config: Dict, dataset, ckpt: Dict[str, np.ndarray],
                     progress: bool = True) -> SlamState:
    """Refine a SplaTAM map with its estimated trajectory held fixed."""
    num_frames = config["data"].get("num_frames", -1)
    if num_frames == -1:
        num_frames = len(dataset)
    params, variables, est_w2c = initialize_from_checkpoint(ckpt, num_frames)
    return offline_splatting(
        config, dataset, progress=progress,
        initial=(params, variables), use_poses=est_w2c,
    )
