"""Pallas kernel path vs the jnp scan path: forward and gradient parity.

On CPU the kernels run in Pallas interpret mode; the same code compiles to
Mosaic on TPU, so these tests pin the kernel semantics against the
XLA-autodiff oracle (which is itself pinned against the dense oracle in
test_tiled.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.render_tiled import rasterize_tiled

from tests.test_oracle import make_scene

CFG_JNP = RasterConfig(max_instances=4096, max_per_tile=256, chunk=128, backend="jnp")
CFG_PAL = RasterConfig(max_instances=4096, max_per_tile=256, chunk=128, backend="pallas")


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_forward_matches_jnp(seed):
    rng = np.random.default_rng(seed)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=80, w=72, h=56)
    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    ref, _ = rasterize_tiled(*args, cfg=CFG_JNP)
    out, aux = rasterize_tiled(*args, cfg=CFG_PAL)
    assert not bool(aux.overflow)
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.depth), np.asarray(ref.depth), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.final_t), np.asarray(ref.final_t), atol=1e-5
    )


def test_pallas_forward_multifeat():
    """6-channel (RGB + depth/sil/z2) fused pass matches the jnp path."""
    rng = np.random.default_rng(7)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=60, w=64, h=48)
    depths_feat = rng.uniform(1.0, 5.0, (60, 1)).astype(np.float32)
    feats = np.concatenate(
        [colors, depths_feat, np.ones_like(depths_feat), depths_feat**2], axis=-1
    )
    args = (
        jnp.asarray(means), jnp.asarray(feats), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    ref, _ = rasterize_tiled(*args, cfg=CFG_JNP)
    out, _ = rasterize_tiled(*args, cfg=CFG_PAL)
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), atol=1e-5, rtol=1e-5
    )


def test_pallas_gradients_match_jnp():
    rng = np.random.default_rng(3)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=40, w=48, h=32)
    args = [
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats),
    ]
    cot = jnp.asarray(rng.normal(size=(3, 32, 48)).astype(np.float32))

    def make_loss(cfg):
        def loss(m, c, o, s, q):
            out, _ = rasterize_tiled(m, c, o, s, q, cam, cfg=cfg)
            return (
                jnp.sum(out.color * cot)
                + jnp.sum(out.depth)
                + jnp.sum(out.final_t)
            )
        return loss

    g_ref = jax.grad(make_loss(CFG_JNP), argnums=tuple(range(5)))(*args)
    g_pal = jax.grad(make_loss(CFG_PAL), argnums=tuple(range(5)))(*args)
    for gr, gp, name in zip(
        g_ref, g_pal, ["means", "colors", "opac", "scales", "quats"]
    ):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(gp) / scale, np.asarray(gr) / scale, atol=5e-5, err_msg=name
        )


@pytest.mark.parametrize("reduction", ["perm", "scatter"])
def test_pallas_reduction_modes_match_sort(reduction):
    """The sort-free gradient reductions (RasterConfig.reduction) are exact
    re-associations of the default sort path — agreement at rounding noise."""
    import dataclasses

    rng = np.random.default_rng(11)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=60, w=64, h=48)
    args = [
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats),
    ]

    def make_loss(cfg):
        def loss(m, c, o, s, q):
            out, _ = rasterize_tiled(m, c, o, s, q, cam, cfg=cfg)
            return (
                jnp.sum(out.color**2) + jnp.sum(out.depth)
                + jnp.sum(out.final_t**2)
            )
        return loss

    g_sort = jax.grad(make_loss(CFG_PAL), argnums=tuple(range(5)))(*args)
    cfg = dataclasses.replace(CFG_PAL, reduction=reduction)
    g_alt = jax.grad(make_loss(cfg), argnums=tuple(range(5)))(*args)
    for gr, gp, name in zip(
        g_sort, g_alt, ["means", "colors", "opac", "scales", "quats"]
    ):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(gp) / scale, np.asarray(gr) / scale, atol=2e-4,
            err_msg=name,
        )


def test_pallas_means2d_dummy_gradient():
    rng = np.random.default_rng(4)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=20, w=48, h=32)
    dummy = jnp.zeros((20, 2), jnp.float32)

    def make_loss(cfg):
        def loss(d):
            out, _ = rasterize_tiled(
                jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
                jnp.asarray(scales), jnp.asarray(quats), cam, cfg=cfg,
                means2d_dummy=d,
            )
            return jnp.sum(out.color**2)
        return loss

    g_ref = np.asarray(jax.grad(make_loss(CFG_JNP))(dummy))
    g_pal = np.asarray(jax.grad(make_loss(CFG_PAL))(dummy))
    np.testing.assert_allclose(g_pal, g_ref, atol=2e-5 * (np.abs(g_ref).max() + 1))
