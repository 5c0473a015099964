"""Checkpointing: npz interchange format compatible with the reference.

Parity: `save_params` / `save_params_ckpt` (`utils/common_utils.py:25-74`) —
final `params.npz` bundles the gaussian map, camera trajectory, intrinsics,
first-frame w2c, gt poses and keyframe indices (`scripts/splatam.py:993-1006`)
so post-opt, viz and PLY export interoperate. Capacity padding is stripped on
save (only active slots are written) and re-added on load.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from splatam_tpu.core.params import (
    GAUSSIAN_KEYS,
    Params,
    Variables,
    round_capacity,
)


def params_to_numpy(params: Params, variables: Variables) -> Dict[str, np.ndarray]:
    active = np.asarray(variables["active"])
    out = {}
    for k, v in params.items():
        arr = np.asarray(v)
        out[k] = arr[active] if k in GAUSSIAN_KEYS else arr
    out["timestep"] = np.asarray(variables["timestep"])[active]
    return out


def save_params(
    params: Params,
    variables: Variables,
    output_dir: str,
    *,
    intrinsics: np.ndarray | None = None,
    first_w2c: np.ndarray | None = None,
    gt_w2c_all_frames: List[np.ndarray] | None = None,
    keyframe_time_indices: List[int] | None = None,
    org_width: int | None = None,
    org_height: int | None = None,
    name: str = "params",
):
    os.makedirs(output_dir, exist_ok=True)
    to_save = params_to_numpy(params, variables)
    if intrinsics is not None:
        to_save["intrinsics"] = np.asarray(intrinsics)
    if first_w2c is not None:
        to_save["w2c"] = np.asarray(first_w2c)
    if gt_w2c_all_frames:
        to_save["gt_w2c_all_frames"] = np.stack(
            [np.asarray(g) for g in gt_w2c_all_frames]
        )
    if keyframe_time_indices is not None:
        to_save["keyframe_time_indices"] = np.array(keyframe_time_indices)
    if org_width is not None:
        to_save["org_width"] = np.array(org_width)
    if org_height is not None:
        to_save["org_height"] = np.array(org_height)
    np.savez(os.path.join(output_dir, name + ".npz"), **to_save)


def save_params_ckpt(params: Params, variables: Variables, output_dir: str, time_idx: int):
    save_params(params, variables, output_dir, name=f"params{time_idx}")


def load_params(path: str) -> Tuple[Params, Variables, Dict[str, np.ndarray]]:
    """Load a params npz back into capacity-padded arrays.

    Returns (params, variables, extras) where extras holds intrinsics / w2c /
    gt poses / keyframe indices when present.
    """
    raw = dict(np.load(path, allow_pickle=True))
    n = raw["means3D"].shape[0]
    num_frames = raw["cam_unnorm_rots"].shape[-1]
    cap = round_capacity(n)

    def pad(x):
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params: Params = {k: pad(raw[k]) for k in GAUSSIAN_KEYS}
    params["cam_unnorm_rots"] = jnp.asarray(raw["cam_unnorm_rots"], jnp.float32)
    params["cam_trans"] = jnp.asarray(raw["cam_trans"], jnp.float32)

    active = np.zeros(cap, bool)
    active[:n] = True
    variables: Variables = {
        "active": jnp.asarray(active),
        "max_2D_radius": jnp.zeros(cap, jnp.float32),
        "means2D_gradient_accum": jnp.zeros(cap, jnp.float32),
        "denom": jnp.zeros(cap, jnp.float32),
        "timestep": pad(raw.get("timestep", np.zeros(n, np.float32))),
    }
    extras = {
        k: raw[k]
        for k in (
            "intrinsics", "w2c", "gt_w2c_all_frames", "keyframe_time_indices",
            "org_width", "org_height",
        )
        if k in raw
    }
    return params, variables, extras
