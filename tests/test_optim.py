"""Adam parity vs torch.optim.Adam (the reference's optimizer)."""
import numpy as np
import jax.numpy as jnp
import torch

from splatam_tpu.core.optim import adam_step, init_adam


def test_adam_matches_torch():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(50, 3)).astype(np.float32)
    lrs = {"a": 0.01}

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([{"params": [tp], "lr": 0.01}], eps=1e-15)

    params = {"a": jnp.asarray(p0)}
    state = init_adam(params)

    for i in range(5):
        g = rng.normal(size=p0.shape).astype(np.float32)
        tp.grad = torch.tensor(g)
        topt.step()
        params, state = adam_step(params, {"a": jnp.asarray(g)}, state, lrs, eps=1e-15)
        np.testing.assert_allclose(
            np.asarray(params["a"]), tp.detach().numpy(), atol=1e-6,
            err_msg=f"step {i}",
        )


def test_adam_zero_lr_keeps_params():
    p0 = np.ones((4, 2), np.float32)
    params = {"a": jnp.asarray(p0)}
    state = init_adam(params)
    params, state = adam_step(
        params, {"a": jnp.full((4, 2), 3.0)}, state, {"a": 0.0}
    )
    np.testing.assert_array_equal(np.asarray(params["a"]), p0)
