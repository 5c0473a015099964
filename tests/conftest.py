"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Sharding tests run on a faked 8-device CPU backend
(xla_force_host_platform_device_count) so the multi-chip paths are exercised
without TPU hardware, per SURVEY.md §4.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# XLA:CPU's AOT executable (de)serialization hard-aborts on some program /
# machine combinations in this environment; the persistent cache only pays
# for itself on TPU (remote compiles), so tests run without it.
os.environ.setdefault("SPLATAM_TPU_NO_COMPILATION_CACHE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The container's sitecustomize registers a TPU backend and pins
# JAX_PLATFORMS before conftest runs; the config update wins at runtime.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
