"""Tiled production rasterizer vs the dense oracle: forward and gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatam_tpu.render.binning import RasterConfig, bin_gaussians
from splatam_tpu.render.geometry import preprocess
from splatam_tpu.render.reference import rasterize_dense
from splatam_tpu.render.render_tiled import rasterize_tiled

from tests.test_oracle import make_scene

CFG = RasterConfig(max_instances=4096, max_per_tile=256, chunk=32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tiled_matches_oracle_forward(seed):
    rng = np.random.default_rng(seed)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=80, w=72, h=56)
    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    ref = rasterize_dense(*args)
    out, aux = rasterize_tiled(*args, cfg=CFG)
    assert not bool(aux.overflow)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.final_t), np.asarray(ref.final_t), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.radius), np.asarray(ref.radius))


def test_tiled_matches_oracle_gradients():
    rng = np.random.default_rng(3)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=40, w=48, h=32)
    args = [
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats),
    ]
    cot = jnp.asarray(rng.normal(size=(3, 32, 48)).astype(np.float32))

    def loss_ref(m, c, o, s, q):
        out = rasterize_dense(m, c, o, s, q, cam)
        return jnp.sum(out.color * cot) + jnp.sum(out.depth) + jnp.sum(out.final_t)

    def loss_tiled(m, c, o, s, q):
        out, _ = rasterize_tiled(m, c, o, s, q, cam, cfg=CFG)
        return jnp.sum(out.color * cot) + jnp.sum(out.depth) + jnp.sum(out.final_t)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    g_tiled = jax.grad(loss_tiled, argnums=tuple(range(5)))(*args)
    for gr, gt, name in zip(
        g_ref, g_tiled, ["means", "colors", "opac", "scales", "quats"]
    ):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(gt) / scale, np.asarray(gr) / scale, atol=2e-5, err_msg=name
        )


def test_means2d_dummy_gradient_nonzero():
    """The NDC-unit means2D dummy grad feeds densification thresholds."""
    rng = np.random.default_rng(4)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=20, w=48, h=32)
    dummy = jnp.zeros((20, 2), jnp.float32)

    def loss(d):
        out, _ = rasterize_tiled(
            jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
            jnp.asarray(scales), jnp.asarray(quats), cam, cfg=CFG, means2d_dummy=d,
        )
        return jnp.sum(out.color**2)

    g = np.asarray(jax.grad(loss)(dummy))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_overflow_flag():
    rng = np.random.default_rng(5)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=80, w=72, h=56)
    tiny = RasterConfig(max_instances=64, max_per_tile=32, chunk=32)
    _, aux = rasterize_tiled(
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam, cfg=tiny,
    )
    assert bool(aux.overflow)


def test_binning_counts_match_rects():
    rng = np.random.default_rng(6)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=50, w=64, h=48)
    proj = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), cam)
    binned = bin_gaussians(proj, cam, CFG)
    # the tile-alpha cull may drop rect-corner instances, never add
    assert 0 < int(binned.num_instances) <= int(np.asarray(proj.tiles_touched).sum())
    # every bucket entry's gaussian rect must cover the tile
    bucket = np.asarray(binned.bucket)
    rect_min = np.asarray(proj.rect_min)
    rect_max = np.asarray(proj.rect_max)
    grid_x = (cam.image_width + 15) // 16
    for t in range(bucket.shape[0]):
        tx, ty = t % grid_x, t // grid_x
        gids = bucket[t][bucket[t] >= 0]
        assert len(gids) == int(np.asarray(binned.counts)[t])
        for g in gids:
            assert rect_min[g, 0] <= tx < rect_max[g, 0]
            assert rect_min[g, 1] <= ty < rect_max[g, 1]
