"""Tests for the dense oracle rasterizer.

The oracle is validated against an independent, literal sequential NumPy
simulation of the CUDA renderCUDA loop (`cuda_rasterizer/forward.cu:261-393`)
— per pixel, front-to-back, with every skip/stop rule — so any vectorization
mistake in the closed-form compositing shows up here.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatam_tpu.render.camera import setup_camera
from splatam_tpu.render.geometry import TILE, preprocess
from splatam_tpu.render.reference import rasterize_dense


def make_scene(rng, n=60, w=64, h=48, opacity_hi=3.0):
    """Random Gaussians in front of an identity camera."""
    means = np.stack(
        [
            rng.uniform(-1.0, 1.0, n),
            rng.uniform(-0.8, 0.8, n),
            rng.uniform(0.5, 5.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacities = (1 / (1 + np.exp(-rng.uniform(-2, opacity_hi, n)))).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -1.5, (n, 3))).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    k = np.array([[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]])
    cam = setup_camera(w, h, k, np.eye(4))
    return means, colors, opacities, scales, quats, cam


def sequential_render(proj, colors, opacities, w, h, bg):
    """Literal per-pixel CUDA-semantics simulation (numpy, slow)."""
    means2d = np.asarray(proj.means2d)
    conic = np.asarray(proj.conic)
    depths = np.asarray(proj.depths)
    radius = np.asarray(proj.radius)
    rect_min = np.asarray(proj.rect_min)
    rect_max = np.asarray(proj.rect_max)
    order = np.argsort(np.where(radius > 0, depths, np.inf), kind="stable")

    out_color = np.zeros((3, h, w), dtype=np.float64)
    out_depth = np.full((h, w), 15.0, dtype=np.float64)
    out_t = np.ones((h, w), dtype=np.float64)
    for py in range(h):
        for px in range(w):
            tx, ty = px // TILE, py // TILE
            t = 1.0
            c = np.zeros(3)
            d = 15.0
            for g in order:
                if radius[g] <= 0:
                    continue
                if not (rect_min[g, 0] <= tx < rect_max[g, 0]):
                    continue
                if not (rect_min[g, 1] <= ty < rect_max[g, 1]):
                    continue
                dx = means2d[g, 0] - px
                dy = means2d[g, 1] - py
                power = (
                    -0.5 * (conic[g, 0] * dx * dx + conic[g, 2] * dy * dy)
                    - conic[g, 1] * dx * dy
                )
                if power > 0:
                    continue
                alpha = min(0.99, opacities[g] * np.exp(power))
                if alpha < 1 / 255:
                    continue
                test_t = t * (1 - alpha)
                if test_t < 1e-4:
                    break
                c += colors[g] * alpha * t
                if t > 0.5 and test_t < 0.5:
                    d = depths[g]
                t = test_t
            out_color[:, py, px] = c + t * bg
            out_depth[py, px] = d
            out_t[py, px] = t
    return out_color, out_depth, out_t


@pytest.mark.parametrize("seed", [0, 1])
def test_oracle_matches_sequential_semantics(seed):
    rng = np.random.default_rng(seed)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=50, w=48, h=32)
    out = rasterize_dense(
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    proj = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), cam)
    ref_color, ref_depth, ref_t = sequential_render(
        proj, colors, opacities, cam.image_width, cam.image_height, np.zeros(3)
    )
    np.testing.assert_allclose(np.asarray(out.color), ref_color, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth[0]), ref_depth, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.final_t), ref_t, atol=1e-5)


def test_high_opacity_saturation_stop_rule():
    """Many overlapping near-opaque Gaussians exercise the 1e-4 stop rule."""
    rng = np.random.default_rng(2)
    n = 40
    means = np.stack(
        [rng.normal(0, 0.02, n), rng.normal(0, 0.02, n), np.linspace(1, 2, n)], axis=-1
    ).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacities = np.full(n, 0.995, dtype=np.float32)
    scales = np.full((n, 3), 0.1, dtype=np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    w, h = 32, 32
    k = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]])
    cam = setup_camera(w, h, k, np.eye(4))
    out = rasterize_dense(
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    proj = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), cam)
    ref_color, ref_depth, ref_t = sequential_render(
        proj, colors, opacities, w, h, np.zeros(3)
    )
    np.testing.assert_allclose(np.asarray(out.color), ref_color, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth[0]), ref_depth, atol=1e-4)
    # saturated pixels: transmittance at/below stop threshold neighborhood
    assert np.asarray(out.final_t).min() < 1e-3


def test_background_blend_and_silhouette():
    rng = np.random.default_rng(3)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=5, w=32, h=32)
    cam_bg = cam
    import dataclasses

    cam_bg = dataclasses.replace(cam, bg=jnp.asarray([1.0, 0.0, 0.5]))
    out = rasterize_dense(
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam_bg,
    )
    # empty pixels show the background exactly, silhouette 0
    empty = np.asarray(out.final_t) > 0.9999
    assert empty.any()
    got = np.asarray(out.color)[:, empty]
    np.testing.assert_allclose(
        got, np.broadcast_to(np.array([1.0, 0.0, 0.5])[:, None], got.shape), atol=1e-6
    )


def test_gradients_finite_and_nonzero():
    rng = np.random.default_rng(4)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=30, w=32, h=24)

    def loss(m, c, o, s, q):
        out = rasterize_dense(m, c, o, s, q, cam)
        return jnp.sum(out.color**2) + jnp.sum(out.depth)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats),
    )
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(grads[0])).max() > 0
    assert np.abs(np.asarray(grads[1])).max() > 0


def test_gradients_match_finite_differences():
    """Check autodiff grads against central finite differences (f64)."""
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(5)
        means, colors, opacities, scales, quats, cam = make_scene(rng, n=8, w=24, h=16)
        means = means.astype(np.float64)

        def loss(m):
            out = rasterize_dense(
                jnp.asarray(m), jnp.asarray(colors.astype(np.float64)),
                jnp.asarray(opacities.astype(np.float64)),
                jnp.asarray(scales.astype(np.float64)),
                jnp.asarray(quats.astype(np.float64)), cam,
            )
            return jnp.sum(out.color * jnp.cos(jnp.arange(out.color.size).reshape(out.color.shape)))

        g = np.asarray(jax.grad(loss)(jnp.asarray(means)))
        eps = 1e-5
        rng2 = np.random.default_rng(6)
        for _ in range(6):
            i = rng2.integers(0, means.shape[0])
            j = rng2.integers(0, 3)
            mp = means.copy(); mp[i, j] += eps
            mm = means.copy(); mm[i, j] -= eps
            fd = (float(loss(mp)) - float(loss(mm))) / (2 * eps)
            # skip points near a discontinuity (skip/stop rules are not C^1)
            if abs(fd) < 1e-8 and abs(g[i, j]) < 1e-8:
                continue
            np.testing.assert_allclose(g[i, j], fd, rtol=5e-3, atol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", False)
