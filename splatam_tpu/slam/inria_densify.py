"""Inria-3DGS gradient-driven densification (clone + split) and LR schedule.

Parity targets in the reference:
  * `densify` (`utils/slam_external.py:196-243` / `utils/gs_external.py`):
    clone small high-gradient gaussians, split large ones into n samples
    drawn from the gaussian itself with scales / (0.8 n), then prune by
    opacity / size.
  * `accumulate_mean2d_gradient` (`utils/slam_external.py:100-105`).
  * `get_expon_lr_func` + `update_learning_rate`
    (`utils/slam_external.py:246-288`).

Under the capacity-padded map (core/params.py), clone/split append into free
slots and removal clears active bits; Adam moments of appended slots start at
zero (cat_params_to_optimizer parity) and pruned slots keep stale state that
can never be read (inactive slots get zero gradients).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from splatam_tpu.core.optim import AdamState, reset_param_state, zero_state_slots
from splatam_tpu.core.params import (
    GAUSSIAN_KEYS,
    Params,
    Variables,
    append_gaussians,
    slots_used,
)
from splatam_tpu.render.geometry import quat_to_rotmat
from splatam_tpu.slam.mapping import inverse_sigmoid


def accumulate_mean2d_gradient(
    variables: Variables, means2d_grad_norm: jnp.ndarray, seen: jnp.ndarray
) -> Variables:
    """`accumulate_mean2d_gradient` parity (`slam_external.py:100-105`)."""
    variables = dict(variables)
    variables["means2D_gradient_accum"] = variables[
        "means2D_gradient_accum"
    ] + jnp.where(seen, means2d_grad_norm, 0.0)
    variables["denom"] = variables["denom"] + seen.astype(jnp.float32)
    return variables


def _remove(variables: Variables, to_remove: np.ndarray) -> Variables:
    variables = dict(variables)
    variables["active"] = jnp.asarray(
        np.asarray(variables["active"]) & ~to_remove
    )
    return variables


def densify(
    params: Params,
    variables: Variables,
    opt_state: AdamState,
    it: int,
    densify_dict: Dict,
    scene_radius: float,
    rng: np.random.Generator,
):
    """Clone/split densification (`slam_external.py:196-243`), host-side.

    Runs every `densify_every` iterations inside the offline/post-SLAM
    optimization; data-dependent growth cannot live under jit, so selection
    and appends happen in numpy against the capacity-padded arrays.
    """
    if it > densify_dict["stop_after"]:
        return params, variables, opt_state

    if (it >= densify_dict["start_after"]) and (
        it % densify_dict["densify_every"] == 0
    ):
        active = np.asarray(variables["active"])
        accum = np.asarray(variables["means2D_gradient_accum"])
        denom = np.asarray(variables["denom"])
        grads = np.where(denom > 0, accum / np.maximum(denom, 1), 0.0)
        grads = np.nan_to_num(grads)
        grad_thresh = densify_dict["grad_thresh"]
        scales = np.exp(np.asarray(params["log_scales"]))
        if scales.shape[1] == 1:
            scales = np.tile(scales, (1, 3))
        max_scale = scales.max(axis=1)

        hot = (grads >= grad_thresh) & active
        to_clone = hot & (max_scale <= 0.01 * scene_radius)
        to_split = hot & (max_scale > 0.01 * scene_radius)
        n = densify_dict["num_to_split_into"]

        new_vals = {k: [] for k in GAUSSIAN_KEYS}
        if to_clone.any():
            for k in GAUSSIAN_KEYS:
                new_vals[k].append(np.asarray(params[k])[to_clone])
        if to_split.any():
            idx = np.nonzero(to_split)[0]
            rep = np.tile(idx, n)
            stds = scales[rep]  # (m*n, 3)
            samples = rng.normal(0.0, 1.0, stds.shape).astype(np.float32) * stds
            rots = np.asarray(
                quat_to_rotmat(jnp.asarray(params["unnorm_rotations"])[rep])
            )
            offset = np.einsum("nij,nj->ni", rots, samples)
            for k in GAUSSIAN_KEYS:
                v = np.asarray(params[k])[rep]
                if k == "means3D":
                    v = v + offset
                elif k == "log_scales":
                    v = np.log(np.exp(v) / (0.8 * n))
                new_vals[k].append(v)

        if any(len(v) for v in new_vals.values()):
            stacked = {
                k: np.concatenate(v, axis=0) for k, v in new_vals.items() if v
            }
            start = slots_used(variables)
            old_cap = params["means3D"].shape[0]
            m = stacked["means3D"].shape[0]
            params, variables, opt_state = append_gaussians(
                params, variables, opt_state, stacked, time_idx=it
            )
            stop = min(start + m, old_cap)
            if opt_state is not None and stop > start:
                opt_state = zero_state_slots(opt_state, GAUSSIAN_KEYS, start, stop)

        # split sources are removed (`slam_external.py:224-226`)
        cap = params["means3D"].shape[0]
        rm = np.zeros(cap, bool)
        rm[: to_split.shape[0]] = to_split
        # opacity / size pruning (`slam_external.py:228-236`)
        if it == densify_dict["stop_after"]:
            thresh = densify_dict["final_removal_opacity_threshold"]
        else:
            thresh = densify_dict["removal_opacity_threshold"]
        opac = 1.0 / (1.0 + np.exp(-np.asarray(params["logit_opacities"])[:, 0]))
        rm |= opac < thresh
        if it >= densify_dict["remove_big_after"]:
            sc = np.exp(np.asarray(params["log_scales"]))
            rm |= sc.max(axis=1) > 0.1 * scene_radius
        variables = _remove(variables, rm)
        cap = params["means3D"].shape[0]
        variables = dict(variables)
        variables["means2D_gradient_accum"] = jnp.zeros(cap, jnp.float32)
        variables["denom"] = jnp.zeros(cap, jnp.float32)
        variables["max_2D_radius"] = jnp.zeros(cap, jnp.float32)

    if (
        it > 0
        and densify_dict.get("reset_opacities", False)
        and it % densify_dict["reset_opacities_every"] == 0
    ):
        params = dict(params)
        params["logit_opacities"] = jnp.full_like(
            params["logit_opacities"], inverse_sigmoid(0.01)
        )
        opt_state = reset_param_state(opt_state, "logit_opacities")
    return params, variables, opt_state


def get_expon_lr_func(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Plenoxels-style log-linear LR decay (`slam_external.py:260-288`)."""

    def helper(step):
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = np.clip(step / max_steps, 0, 1)
        log_lerp = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp

    return helper
