"""Device mesh construction and sharding helpers.

The reference is single-GPU (SURVEY.md §2.3); multi-chip parallelism is new
first-class design here:

  * axis 'tiles' — image-tile data parallelism for render fwd/bwd (the DP
    analog: each chip composites a slice of tile rows against a replicated
    view of the Gaussians; parameter/pose grads all-reduce over ICI).
  * axis 'data'  — keyframe batch parallelism across hosts for offline /
    post-SLAM refinement (DCN-friendly: one psum of parameter grads per step).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Env-gated multi-host bootstrap (`jax.distributed.initialize`).

    The reference has no distributed backend (single GPU, SURVEY §2.3); the
    TPU-native equivalent is one JAX process per host joined through a
    coordinator. Activated when SPLATAM_TPU_COORDINATOR is set (or the
    standard JAX_COORDINATOR_ADDRESS), with SPLATAM_TPU_NUM_PROCESSES /
    SPLATAM_TPU_PROCESS_ID (both optional when the platform can infer them,
    e.g. TPU pods). Returns True if distributed mode was initialized. Call
    once at driver startup (run/slam.py, run/gaussian_splatting.py do).
    """
    import os

    coord = os.environ.get("SPLATAM_TPU_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coord:
        return False
    kwargs = {"coordinator_address": coord}
    if os.environ.get("SPLATAM_TPU_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["SPLATAM_TPU_NUM_PROCESSES"])
    if os.environ.get("SPLATAM_TPU_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["SPLATAM_TPU_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def make_mesh(
    n_tiles: Optional[int] = None,
    n_data: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, tiles) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_tiles is None:
        n_tiles = len(devices) // n_data
    assert n_data * n_tiles == len(devices), (
        f"mesh {n_data}x{n_tiles} != {len(devices)} devices"
    )
    arr = np.array(devices).reshape(n_data, n_tiles)
    return Mesh(arr, ("data", "tiles"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tile_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("tiles"))


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
