"""Adam with per-parameter learning rates and surgery-friendly state.

Replaces torch.optim.Adam + the reference's optimizer-state surgery
(`utils/slam_external.py:107-160`). The state is an explicit pytree
(mu, nu, step) matching torch semantics exactly:

  m_t = b1 m + (1-b1) g;  v_t = b2 v + (1-b2) g^2
  p  -= lr * (m_t / (1-b1^t)) / (sqrt(v_t / (1-b2^t)) + eps)

so update rules, bias correction and the eps placement (OUTSIDE the sqrt,
unlike optax's eps_root) are torch-compatible. Because the state is a plain
dict of arrays over capacity-padded slots, "surgery" is trivial:
zero the moments at appended slots, leave pruned slots in place.

`initialize_optimizer` parity (`scripts/splatam.py:166-172`): tracking uses
eps=1e-8, mapping eps=1e-15.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


class AdamState(NamedTuple):
    mu: Params
    nu: Params
    step: jax.Array  # () int32


def init_adam(params: Params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def adam_step(
    params: Params,
    grads: Params,
    state: AdamState,
    lrs: Dict[str, float],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[Params, AdamState]:
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    new_params, new_mu, new_nu = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        m = b1 * state.mu[k] + (1.0 - b1) * g
        v = b2 * state.nu[k] + (1.0 - b2) * g * g
        update = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        new_params[k] = p - lrs[k] * update
        new_mu[k] = m
        new_nu[k] = v
    return new_params, AdamState(mu=new_mu, nu=new_nu, step=step)


def zero_state_slots(state: AdamState, keys, start: int, stop: int) -> AdamState:
    """Zero the moments of slots [start, stop) for the given parameter keys
    (cat_params_to_optimizer parity: new points start with zero moments).

    The range is quantized and the offset traced so the update program is
    shape-stable across appends (slots past ``stop`` are unused, so zeroing
    up to the quantum boundary is harmless); python-int slices would compile
    a fresh program per append on TPU.
    """
    from splatam_tpu.core.params import APPEND_QUANTUM, _write_rows_jit

    cap = next(iter(state.mu[k] for k in keys)).shape[0]
    n = stop - start
    if n <= 0:
        return state
    nq = min(((n + APPEND_QUANTUM - 1) // APPEND_QUANTUM) * APPEND_QUANTUM,
             cap - start)
    start_t = jnp.asarray(start, jnp.int32)
    mu = dict(state.mu)
    nu = dict(state.nu)
    for k in keys:
        z = jnp.zeros((nq,) + mu[k].shape[1:], mu[k].dtype)
        mu[k] = _write_rows_jit(mu[k], z, start_t)
        nu[k] = _write_rows_jit(nu[k], z, start_t)
    return AdamState(mu=mu, nu=nu, step=state.step)


def reset_param_state(state: AdamState, key: str) -> AdamState:
    """update_params_and_optimizer parity: replacing a param zeroes its state."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[key] = jnp.zeros_like(mu[key])
    nu[key] = jnp.zeros_like(nu[key])
    return AdamState(mu=mu, nu=nu, step=state.step)
