"""Gaussian-primitive sharding (SURVEY §2.3 item 2) vs the single-device path.

Runs on the conftest-provided 8-device virtual CPU mesh: parameters sharded
over a 'prims' axis, compact culled records all_gathered to tile-band
owners; forward images and parameter gradients must match the replicated
single-device render.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from splatam_tpu.core.losses import render_for_loss
from splatam_tpu.parallel.prim_sharded import (
    gathered_bytes_per_gaussian,
    render_prim_sharded,
)
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import setup_camera


def _scene(n=512, w=128, h=96, seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "means3D": jnp.asarray(
            np.stack(
                [
                    rng.uniform(-0.8, 0.8, n),
                    rng.uniform(-0.6, 0.6, n),
                    rng.uniform(1.2, 4.0, n),
                ],
                axis=-1,
            ).astype(np.float32)
        ),
        "rgb_colors": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        "unnorm_rotations": jnp.asarray(
            (rng.normal(size=(n, 4)) + np.array([2.0, 0, 0, 0])).astype(
                np.float32
            )
        ),
        "logit_opacities": jnp.asarray(
            rng.normal(0.5, 1.0, (n, 1)).astype(np.float32)
        ),
        # anisotropic so rotation gradients are real signal (for spherical
        # covariances they are only fp cancellation noise)
        "log_scales": jnp.asarray(
            rng.uniform(-3.6, -2.6, (n, 3)).astype(np.float32)
        ),
    }
    active = jnp.asarray(rng.uniform(size=n) > 0.1)
    cam = setup_camera(w, h, [[110.0, 0, w / 2], [0, 110.0, h / 2], [0, 0, 1]],
                       np.eye(4))
    return params, active, cam


def test_prim_sharded_matches_single_device():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.array(devs[:8]), ("prims",))
    params, active, cam = _scene()
    cfg = RasterConfig(max_instances=2**15, max_per_tile=512, chunk=128,
                       backend="pallas")

    rot = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    tran = jnp.zeros(3, jnp.float32)

    out_ref, aux_ref = render_for_loss(
        params, active, rot, tran, cam, cfg,
        gaussians_grad=True, camera_grad=False,
    )
    out_sh, aux_sh = render_prim_sharded(
        params, active, rot, tran, cam, cfg, mesh
    )
    assert not bool(aux_sh.overflow)
    np.testing.assert_allclose(
        np.asarray(out_sh.color), np.asarray(out_ref.color), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_sh.depth), np.asarray(out_ref.depth), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_sh.radius), np.asarray(out_ref.radius)
    )

    # parameter gradients: sharded pipeline vs single device
    gt = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, out_ref.color.shape).astype(
            np.float32
        )
    )

    def loss_ref(p):
        o, _ = render_for_loss(
            p, active, rot, tran, cam, cfg,
            gaussians_grad=True, camera_grad=False,
        )
        return jnp.sum(jnp.abs(o.color - gt))

    def loss_sh(p):
        o, _ = render_prim_sharded(p, active, rot, tran, cam, cfg, mesh)
        return jnp.sum(jnp.abs(o.color - gt))

    g_ref = jax.grad(loss_ref)(params)
    g_sh = jax.grad(loss_sh)(params)
    for k in params:
        scale = np.max(np.abs(np.asarray(g_ref[k]))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(g_sh[k]) / scale, np.asarray(g_ref[k]) / scale,
            atol=5e-4, err_msg=k,
        )


def test_gathered_record_is_smaller_than_replication():
    note = gathered_bytes_per_gaussian()
    assert note["gathered_record_bytes"] < note["replicated_param_plus_opt_bytes"]
