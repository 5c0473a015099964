"""SH (deg <= 3) color evaluation: hand-rolled oracle, grads, render path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatam_tpu.render.camera import setup_camera
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.render_tiled import rasterize_tiled
from splatam_tpu.render.sh import (
    SH_C0,
    SH_C1,
    SH_C2,
    SH_C3,
    eval_sh,
    num_sh_coeffs,
    rgb_to_sh_dc,
    sh_dc_to_rgb,
)


def sh_oracle(deg, shs, means, campos):
    """Direct per-gaussian transliteration of `forward.cu:20-71`."""
    out = np.zeros((means.shape[0], 3), np.float64)
    for i in range(means.shape[0]):
        d = means[i] - campos
        d = d / np.linalg.norm(d)
        x, y, z = d
        sh = shs[i]
        res = SH_C0 * sh[0]
        if deg > 0:
            res = res - SH_C1 * y * sh[1] + SH_C1 * z * sh[2] - SH_C1 * x * sh[3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            res = (
                res
                + SH_C2[0] * xy * sh[4]
                + SH_C2[1] * yz * sh[5]
                + SH_C2[2] * (2 * zz - xx - yy) * sh[6]
                + SH_C2[3] * xz * sh[7]
                + SH_C2[4] * (xx - yy) * sh[8]
            )
        if deg > 2:
            res = (
                res
                + SH_C3[0] * y * (3 * xx - yy) * sh[9]
                + SH_C3[1] * xy * z * sh[10]
                + SH_C3[2] * y * (4 * zz - xx - yy) * sh[11]
                + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[12]
                + SH_C3[4] * x * (4 * zz - xx - yy) * sh[13]
                + SH_C3[5] * z * (xx - yy) * sh[14]
                + SH_C3[6] * x * (xx - 3 * yy) * sh[15]
            )
        out[i] = np.maximum(res + 0.5, 0.0)
    return out


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_eval_sh_matches_oracle(deg):
    rng = np.random.default_rng(deg)
    n = 64
    means = rng.normal(0, 1, (n, 3)).astype(np.float32) + np.array([0, 0, 4])
    campos = np.array([0.3, -0.2, 0.1], np.float32)
    shs = rng.normal(0, 0.5, (n, 16, 3)).astype(np.float32)
    got = np.asarray(eval_sh(deg, jnp.asarray(shs), jnp.asarray(means),
                             jnp.asarray(campos)))
    want = sh_oracle(deg, shs, means, campos)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_eval_sh_grads_match_finite_differences():
    rng = np.random.default_rng(0)
    n = 8
    means = rng.normal(0, 1, (n, 3)) + np.array([0, 0, 4])
    campos = np.array([0.1, 0.2, -0.3])
    shs = rng.normal(0, 0.5, (n, 16, 3))
    cot = np.linspace(-1, 1, n * 3).reshape(n, 3)

    def g(shs_, means_):
        return jnp.sum(
            eval_sh(3, shs_, means_, jnp.asarray(campos)) * jnp.asarray(cot)
        )

    shs = shs.astype(np.float32)
    means = means.astype(np.float32)
    gs, gm = jax.grad(g, argnums=(0, 1))(jnp.asarray(shs), jnp.asarray(means))
    eps = 1e-3
    d_s = rng.normal(0, 1, shs.shape).astype(np.float32)
    d_m = rng.normal(0, 1, means.shape).astype(np.float32)
    fd = (
        float(g(jnp.asarray(shs + eps * d_s), jnp.asarray(means + eps * d_m)))
        - float(g(jnp.asarray(shs - eps * d_s), jnp.asarray(means - eps * d_m)))
    ) / (2 * eps)
    an = float(jnp.sum(gs * d_s) + jnp.sum(gm * d_m))
    assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (fd, an)


def test_dc_roundtrip():
    rgb = np.random.default_rng(0).uniform(0, 1, (10, 3)).astype(np.float32)
    back = np.asarray(sh_dc_to_rgb(rgb_to_sh_dc(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_render_with_sh_colors(backend):
    """End-to-end: deg-3 SH render equals precomputed-color render when the
    evaluated colors are fed back as colors_precomp."""
    rng = np.random.default_rng(4)
    n = 60
    means = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.4, 0.4, n),
         rng.uniform(1.5, 3.0, n)], axis=-1,
    ).astype(np.float32)
    shs = rng.normal(0, 0.3, (n, 16, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    scales = np.full((n, 3), 0.08, np.float32)
    quats = np.tile([1, 0, 0, 0], (n, 1)).astype(np.float32)
    cam = setup_camera(128, 96, [[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]],
                       np.eye(4))
    cfg = RasterConfig(max_instances=2**13, max_per_tile=256, chunk=128,
                       backend=backend)

    out_sh, aux = rasterize_tiled(
        jnp.asarray(means), None, jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), cam, cfg=cfg, shs=jnp.asarray(shs), sh_degree=3,
    )
    assert not bool(aux.overflow)
    colors = eval_sh(3, jnp.asarray(shs), jnp.asarray(means), cam.campos)
    out_pre, _ = rasterize_tiled(
        jnp.asarray(means), colors, jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), cam, cfg=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(out_sh.color), np.asarray(out_pre.color), atol=1e-5
    )
    assert float(jnp.max(out_sh.color)) > 0.05  # actually rendered something

    # gradients flow to the SH coefficients through the full rasterizer
    def loss(shs_):
        out, _ = rasterize_tiled(
            jnp.asarray(means), None, jnp.asarray(opac), jnp.asarray(scales),
            jnp.asarray(quats), cam, cfg=cfg, shs=shs_, sh_degree=3,
        )
        return jnp.sum(out.color**2)

    g = jax.grad(loss)(jnp.asarray(shs))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0
