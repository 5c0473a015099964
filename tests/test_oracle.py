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


# ---------------------------------------------------------------------------
# Preprocess parity vs a literal numpy transliteration of the CUDA math
# (`cuda_rasterizer/forward.cu:74-256` + `auxiliary.h:41-56,139-164`).
# Every other parity test consumes render/geometry.py's own `preprocess`, so
# a bug in the cov2D/conic/radius/rect math would be invisible to them; this
# simulator re-derives those fields independently, following the glm
# column-major conventions of the CUDA kernel step by step.
# ---------------------------------------------------------------------------


def _glm_mat3(*a):
    """glm::mat3 constructor: consecutive triplets are COLUMNS."""
    return np.array(a, np.float32).reshape(3, 3).T


def _cuda_compute_cov3d(scale, mod, q):
    """computeCov3D (`forward.cu:118-152`), glm semantics, f32."""
    S = np.diag((mod * scale).astype(np.float32)).astype(np.float32)
    r, x, y, z = q  # NOT normalized here: the kernel assumes unit quats
    R = _glm_mat3(
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    )
    M = (S @ R).astype(np.float32)
    Sigma = (M.T @ M).astype(np.float32)
    return np.array(
        [Sigma[0, 0], Sigma[0, 1], Sigma[0, 2],
         Sigma[1, 1], Sigma[1, 2], Sigma[2, 2]],
        np.float32,
    )


def _cuda_compute_cov2d(mean, fx, fy, tanx, tany, cov3d, vm_flat):
    """computeCov2D (`forward.cu:74-113`), glm semantics, f32.

    ``vm_flat`` is the flat column-major viewmatrix exactly as the CUDA
    kernel receives it (the reference passes w2c TRANSPOSED, so
    vm_flat[col*4+row] = w2c[row][col])."""
    f32 = np.float32
    # transformPoint4x3 (`auxiliary.h:58-66`)
    t = np.array(
        [
            vm_flat[0] * mean[0] + vm_flat[4] * mean[1] + vm_flat[8] * mean[2] + vm_flat[12],
            vm_flat[1] * mean[0] + vm_flat[5] * mean[1] + vm_flat[9] * mean[2] + vm_flat[13],
            vm_flat[2] * mean[0] + vm_flat[6] * mean[1] + vm_flat[10] * mean[2] + vm_flat[14],
        ],
        f32,
    )
    limx, limy = f32(1.3 * tanx), f32(1.3 * tany)
    txtz, tytz = f32(t[0] / t[2]), f32(t[1] / t[2])
    t[0] = min(limx, max(-limx, txtz)) * t[2]
    t[1] = min(limy, max(-limy, tytz)) * t[2]
    J = _glm_mat3(
        fx / t[2], 0.0, -(fx * t[0]) / (t[2] * t[2]),
        0.0, fy / t[2], -(fy * t[1]) / (t[2] * t[2]),
        0, 0, 0,
    )
    W = _glm_mat3(
        vm_flat[0], vm_flat[4], vm_flat[8],
        vm_flat[1], vm_flat[5], vm_flat[9],
        vm_flat[2], vm_flat[6], vm_flat[10],
    )
    T = (W @ J).astype(np.float32)
    Vrk = np.array(
        [
            [cov3d[0], cov3d[1], cov3d[2]],
            [cov3d[1], cov3d[3], cov3d[4]],
            [cov3d[2], cov3d[4], cov3d[5]],
        ],
        np.float32,
    )
    cov = (T.T @ Vrk.T @ T).astype(np.float32)
    # low-pass +0.3 on the diagonal, discard 3rd row/col. glm cov[i][j] is
    # column i / row j; cov is symmetric so plain indexing is equivalent.
    return np.array(
        [cov[0, 0] + f32(0.3), cov[0, 1], cov[1, 1] + f32(0.3)], np.float32
    )


def _cuda_preprocess(means, scales, quats, cam, scale_mod=1.0):
    """Literal per-gaussian preprocessCUDA (`forward.cu:156-256`), numpy f32.

    Returns dicts of per-gaussian fields; radius/tiles stay 0 for every
    early-return (the CUDA contract for culled gaussians)."""
    n = means.shape[0]
    w, h = cam.image_width, cam.image_height
    grid_x = (w + TILE - 1) // TILE
    grid_y = (h + TILE - 1) // TILE
    # the reference hands CUDA the TRANSPOSED matrices (recon_helpers.py);
    # flat row-major of the transpose == flat column-major of the matrix
    vm_flat = np.asarray(cam.viewmatrix, np.float32).T.reshape(-1)
    pm_flat = np.asarray(cam.projmatrix, np.float32).T.reshape(-1)
    fx, fy = np.float32(cam.focal_x), np.float32(cam.focal_y)

    out = {
        "radius": np.zeros(n, np.int32),
        "tiles": np.zeros(n, np.int32),
        "depth": np.zeros(n, np.float32),
        "mean2d": np.zeros((n, 2), np.float32),
        "conic": np.zeros((n, 3), np.float32),
        "rect_min": np.zeros((n, 2), np.int32),
        "rect_max": np.zeros((n, 2), np.int32),
        "valid": np.zeros(n, bool),
    }
    for i in range(n):
        p = means[i].astype(np.float32)
        # in_frustum (`auxiliary.h:139-164`)
        pv_z = vm_flat[2] * p[0] + vm_flat[6] * p[1] + vm_flat[10] * p[2] + vm_flat[14]
        if pv_z <= 0.001:
            continue
        # transformPoint4x4 + homogeneous divide (`forward.cu:197-200`)
        hom = np.array(
            [
                pm_flat[0] * p[0] + pm_flat[4] * p[1] + pm_flat[8] * p[2] + pm_flat[12],
                pm_flat[1] * p[0] + pm_flat[5] * p[1] + pm_flat[9] * p[2] + pm_flat[13],
                pm_flat[2] * p[0] + pm_flat[6] * p[1] + pm_flat[10] * p[2] + pm_flat[14],
                pm_flat[3] * p[0] + pm_flat[7] * p[1] + pm_flat[11] * p[2] + pm_flat[15],
            ],
            np.float32,
        )
        p_w = np.float32(1.0) / (hom[3] + np.float32(1e-7))
        proj_xy = hom[:2] * p_w
        cov3d = _cuda_compute_cov3d(scales[i], np.float32(scale_mod), quats[i])
        cov = _cuda_compute_cov2d(
            p, fx, fy, cam.tanfovx, cam.tanfovy, cov3d, vm_flat
        )
        det = cov[0] * cov[2] - cov[1] * cov[1]
        if det == 0.0:
            continue
        det_inv = np.float32(1.0) / det
        conic = np.array(
            [cov[2] * det_inv, -cov[1] * det_inv, cov[0] * det_inv], np.float32
        )
        mid = np.float32(0.5) * (cov[0] + cov[2])
        lam1 = mid + np.sqrt(np.maximum(np.float32(0.1), mid * mid - det))
        lam2 = mid - np.sqrt(np.maximum(np.float32(0.1), mid * mid - det))
        radius = np.ceil(np.float32(3.0) * np.sqrt(max(lam1, lam2)))
        # ndc2Pix promotes through double literals (`auxiliary.h:41-44`)
        px = np.float32(((float(proj_xy[0]) + 1.0) * w - 1.0) * 0.5)
        py = np.float32(((float(proj_xy[1]) + 1.0) * h - 1.0) * 0.5)
        # getRect (`auxiliary.h:46-56`): int max_radius, C truncation casts
        r_int = int(radius)
        rx0 = min(grid_x, max(0, int((px - r_int) / TILE)))
        ry0 = min(grid_y, max(0, int((py - r_int) / TILE)))
        rx1 = min(grid_x, max(0, int((px + r_int + TILE - 1) / TILE)))
        ry1 = min(grid_y, max(0, int((py + r_int + TILE - 1) / TILE)))
        if (rx1 - rx0) * (ry1 - ry0) == 0:
            continue
        out["valid"][i] = True
        out["radius"][i] = np.int32(radius)
        out["tiles"][i] = (ry1 - ry0) * (rx1 - rx0)
        out["depth"][i] = pv_z
        out["mean2d"][i] = (px, py)
        out["conic"][i] = conic
        out["rect_min"][i] = (rx0, ry0)
        out["rect_max"][i] = (rx1, ry1)
    return out


@pytest.mark.parametrize("seed,pose", [(0, "identity"), (1, "rotated")])
def test_preprocess_matches_cuda_transliteration(seed, pose):
    """render/geometry.py::preprocess vs the independent CUDA-math simulator,
    field by field (VERDICT r3 item 5: break the preprocess self-reference).
    """
    rng = np.random.default_rng(seed)
    n = 300
    # spread that exercises: behind-camera culls, fov-clamped outliers,
    # anisotropic covs, edge-clamped rects
    means = np.stack(
        [
            rng.uniform(-4.0, 4.0, n),
            rng.uniform(-3.0, 3.0, n),
            rng.uniform(-0.5, 6.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.uniform(-4.0, -0.5, (n, 3))).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    w, h = 96, 64
    k = np.array([[80.0, 0, w / 2 - 3], [0, 75.0, h / 2 + 2], [0, 0, 1]])
    if pose == "identity":
        w2c = np.eye(4)
    else:
        th = 0.35
        w2c = np.array(
            [
                [np.cos(th), 0, np.sin(th), 0.2],
                [0, 1, 0, -0.1],
                [-np.sin(th), 0, np.cos(th), 0.4],
                [0, 0, 0, 1],
            ]
        )
    cam = setup_camera(w, h, k, w2c)

    proj = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), cam)
    ref = _cuda_preprocess(means, scales, quats, cam)

    radius = np.asarray(proj.radius)
    tiles = np.asarray(proj.tiles_touched)
    # culled set must agree exactly (radius == 0 <=> CUDA early-return)
    np.testing.assert_array_equal(radius > 0, ref["valid"])
    v = ref["valid"]
    assert v.sum() > 50, "scene degenerated — not a meaningful parity check"
    assert (~v).sum() > 5, "no culled gaussians — cull rules not exercised"
    # integer fields: exact
    np.testing.assert_array_equal(radius[v], ref["radius"][v])
    np.testing.assert_array_equal(tiles[v], ref["tiles"][v])
    np.testing.assert_array_equal(np.asarray(proj.rect_min)[v], ref["rect_min"][v])
    np.testing.assert_array_equal(np.asarray(proj.rect_max)[v], ref["rect_max"][v])
    # float fields: f32 association noise only
    np.testing.assert_allclose(
        np.asarray(proj.depths)[v], ref["depth"][v], rtol=2e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(proj.means2d)[v], ref["mean2d"][v], rtol=1e-5, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(proj.conic)[v], ref["conic"][v], rtol=2e-4, atol=1e-6
    )
