"""Gaussian map parameters with capacity padding.

The reference grows/shrinks its parameter tensors dynamically
(`torch.cat` in `scripts/splatam.py:417-424`, boolean-mask removal in
`utils/slam_external.py:139-160`). Under XLA, shapes must be static, so the
map lives in capacity-padded arrays with an explicit active mask:

  * append  = write into free slots (host-side slot bookkeeping, device write)
  * prune   = clear the active bit (state stays in place; equivalent to
              removal because inactive slots render with radius 0 and get
              zero gradients)
  * growth  = host-side reallocation to a larger capacity (recompile event,
              amortized by doubling)

Parameter schema matches `scripts/splatam.py:126-163`:
  means3D (C,3), rgb_colors (C,3), unnorm_rotations (C,4) wxyz,
  logit_opacities (C,1), log_scales (C,1|3),
  cam_unnorm_rots (1,4,T), cam_trans (1,3,T).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GAUSSIAN_KEYS = (
    "means3D", "rgb_colors", "unnorm_rotations", "logit_opacities", "log_scales"
)
CAMERA_KEYS = ("cam_unnorm_rots", "cam_trans")

Params = Dict[str, jax.Array]
Variables = Dict[str, jax.Array]


def round_capacity(n: int, minimum: int = 4096) -> int:
    """Next power-of-two capacity >= n (bounded recompiles as the map grows)."""
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


def initialize_params(
    init_pt_cld: np.ndarray,  # (M, 6) xyz+rgb
    num_frames: int,
    mean3_sq_dist: np.ndarray,  # (M,)
    gaussian_distribution: str = "isotropic",
    capacity: int | None = None,
) -> Tuple[Params, Variables]:
    """`initialize_params` parity (`scripts/splatam.py:126-163`) + padding."""
    m = init_pt_cld.shape[0]
    cap = capacity or round_capacity(m)
    scale_dim = 1 if gaussian_distribution == "isotropic" else 3
    if gaussian_distribution not in ("isotropic", "anisotropic"):
        raise ValueError(f"Unknown gaussian_distribution {gaussian_distribution}")

    log_scales = np.tile(
        np.log(np.sqrt(np.maximum(mean3_sq_dist, 1e-12)))[:, None], (1, scale_dim)
    )

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, dtype=np.float32)
        out[:m] = x
        return jnp.asarray(out)

    params: Params = {
        "means3D": pad(init_pt_cld[:, :3]),
        "rgb_colors": pad(init_pt_cld[:, 3:6]),
        "unnorm_rotations": pad(np.tile([1, 0, 0, 0], (m, 1)).astype(np.float32)),
        "logit_opacities": pad(np.zeros((m, 1), np.float32)),
        "log_scales": pad(log_scales),
        "cam_unnorm_rots": jnp.asarray(
            np.tile(np.array([1, 0, 0, 0], np.float32)[None, :, None], (1, 1, num_frames))
        ),
        "cam_trans": jnp.zeros((1, 3, num_frames), jnp.float32),
    }
    active = np.zeros(cap, bool)
    active[:m] = True
    variables: Variables = {
        "active": jnp.asarray(active),
        "max_2D_radius": jnp.zeros(cap, jnp.float32),
        "means2D_gradient_accum": jnp.zeros(cap, jnp.float32),
        "denom": jnp.zeros(cap, jnp.float32),
        "timestep": jnp.zeros(cap, jnp.float32),
    }
    return params, variables


@jax.jit
def _get_pose_jit(rots: jax.Array, trans: jax.Array, t: jax.Array):
    rot = jax.lax.dynamic_slice_in_dim(rots, t, 1, axis=2)[0, :, 0]
    tran = jax.lax.dynamic_slice_in_dim(trans, t, 1, axis=2)[0, :, 0]
    return rot, tran


def get_pose(params: Params, t) -> Tuple[jax.Array, jax.Array]:
    """(cam_unnorm_rot (4,), cam_tran (3,)) at frame ``t``.

    The frame index is TRACED: eager `arr[0, :, t]` with a python int bakes
    the index into the program, so every new frame triggers a fresh
    ~seconds-long remote compile on the tunneled TPU — this was the dominant
    per-frame cost of the SLAM loop before being hoisted here.
    """
    return _get_pose_jit(
        params["cam_unnorm_rots"], params["cam_trans"],
        jnp.asarray(t, jnp.int32),
    )


@jax.jit
def _set_pose_jit(rots, trans, t, rot, tran):
    rots = jax.lax.dynamic_update_slice_in_dim(
        rots, rot.astype(rots.dtype).reshape(1, -1, 1), t, axis=2
    )
    trans = jax.lax.dynamic_update_slice_in_dim(
        trans, tran.astype(trans.dtype).reshape(1, -1, 1), t, axis=2
    )
    return rots, trans


def set_pose(params: Params, t, rot, tran) -> Params:
    """Write a pose into the trajectory arrays (traced index, see get_pose)."""
    params = dict(params)
    params["cam_unnorm_rots"], params["cam_trans"] = _set_pose_jit(
        params["cam_unnorm_rots"], params["cam_trans"],
        jnp.asarray(t, jnp.int32), jnp.asarray(rot), jnp.asarray(tran),
    )
    return params


def num_active(variables: Variables) -> int:
    return int(jnp.sum(variables["active"]))


def slots_used(variables: Variables) -> int:
    """High-water mark: first free slot AFTER every active slot.

    Pruning leaves holes (inactive slots below the mark); appends go above
    the mark so they never clobber live Gaussians. `compact()` reclaims holes.
    """
    active = np.asarray(variables["active"])
    nz = np.nonzero(active)[0]
    return int(nz[-1]) + 1 if len(nz) else 0


def capacity_of(params: Params) -> int:
    return params["means3D"].shape[0]


def grow_capacity(
    params: Params, variables: Variables, opt_state, new_cap: int
):
    """Reallocate Gaussian arrays (and any optimizer moments) to new_cap."""

    def grow(x):
        out = jnp.zeros((new_cap,) + x.shape[1:], x.dtype)
        return out.at[: x.shape[0]].set(x)

    new_params = dict(params)
    for k in GAUSSIAN_KEYS:
        new_params[k] = grow(params[k])
    new_vars = dict(variables)
    for k in ("active", "max_2D_radius", "means2D_gradient_accum", "denom", "timestep"):
        new_vars[k] = grow(variables[k])
    if opt_state is not None:
        mu, nu, count = opt_state
        mu = {k: (grow(v) if k in GAUSSIAN_KEYS else v) for k, v in mu.items()}
        nu = {k: (grow(v) if k in GAUSSIAN_KEYS else v) for k, v in nu.items()}
        # preserve the AdamState NamedTuple type (attribute access downstream)
        opt_state = type(opt_state)(mu, nu, count)
    return new_params, new_vars, opt_state


# Appended blocks are padded to this many slots so the update programs
# compile once per (capacity, quantum) instead of once per append size.
APPEND_QUANTUM = 1024


@jax.jit
def _write_rows_jit(arr: jax.Array, block: jax.Array, start: jax.Array):
    return jax.lax.dynamic_update_slice_in_dim(
        arr, block.astype(arr.dtype), start, axis=0
    )


def append_gaussians(
    params: Params,
    variables: Variables,
    opt_state,
    new_values: Dict[str, np.ndarray],
    time_idx: int,
):
    """Append new Gaussians into free slots, growing capacity if needed.

    Mirrors `add_new_gaussians`'s torch.cat + accumulator reset
    (`scripts/splatam.py:417-426`): the 2D-stat accumulators are zeroed for
    ALL Gaussians, new Adam moments start at zero (cat_params_to_optimizer
    parity, `utils/slam_external.py:123-137`). Blocks are quantized to
    APPEND_QUANTUM rows and written with a traced start offset so the device
    programs are shape-stable across frames (see get_pose).
    """
    m = int(new_values["means3D"].shape[0])
    if m == 0:
        return params, variables, opt_state
    mq = ((m + APPEND_QUANTUM - 1) // APPEND_QUANTUM) * APPEND_QUANTUM
    start = slots_used(variables)
    cap = capacity_of(params)
    if start + mq > cap:
        params, variables, opt_state = grow_capacity(
            params, variables, opt_state, round_capacity(start + mq, minimum=2 * cap)
        )
        cap = capacity_of(params)

    start_t = jnp.asarray(start, jnp.int32)

    def padded(x, fill=0.0):
        out = np.full((mq,) + x.shape[1:], fill, np.float32)
        out[:m] = x
        return jnp.asarray(out)

    params = dict(params)
    for k in GAUSSIAN_KEYS:
        params[k] = _write_rows_jit(
            params[k], padded(np.asarray(new_values[k])), start_t
        )
    variables = dict(variables)
    active_block = np.zeros(mq, bool)
    active_block[:m] = True
    variables["active"] = _write_rows_jit(
        variables["active"], jnp.asarray(active_block), start_t
    )
    ts_block = np.zeros(mq, np.float32)
    ts_block[:m] = float(time_idx)
    variables["timestep"] = _write_rows_jit(
        variables["timestep"], jnp.asarray(ts_block), start_t
    )
    variables["means2D_gradient_accum"] = jnp.zeros(cap, jnp.float32)
    variables["denom"] = jnp.zeros(cap, jnp.float32)
    variables["max_2D_radius"] = jnp.zeros(cap, jnp.float32)
    return params, variables, opt_state


def compact(params: Params, variables: Variables):
    """Pack active slots to the front (host-side; optional housekeeping)."""
    active = np.asarray(variables["active"])
    idx = np.nonzero(active)[0]
    m = len(idx)
    params = dict(params)
    for k in GAUSSIAN_KEYS:
        arr = np.asarray(params[k])
        out = np.zeros_like(arr)
        out[:m] = arr[idx]
        params[k] = jnp.asarray(out)
    variables = dict(variables)
    for k in ("max_2D_radius", "means2D_gradient_accum", "denom", "timestep"):
        arr = np.asarray(variables[k])
        out = np.zeros_like(arr)
        out[:m] = arr[idx]
        variables[k] = jnp.asarray(out)
    new_active = np.zeros_like(active)
    new_active[:m] = True
    variables["active"] = jnp.asarray(new_active)
    return params, variables
