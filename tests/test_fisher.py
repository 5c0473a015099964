"""Fisher (squared per-pixel gradient) kernel vs a dense autodiff oracle.

The oracle computes, for every pixel p, the gradient of
seed * sum_channels(im[:, p]) w.r.t. each parameter via jacrev through the
jnp tiled rasterizer, squares it, and sums over pixels — exactly the
quantity the reference's fused power=2 CUDA backward accumulates with
atomicAdd(powf(grad, 2)) (`backward.cu:1093-1137`).
"""
import numpy as np
import jax
import jax.numpy as jnp

from splatam_tpu.core.params import initialize_params
from splatam_tpu.fisher import (
    eig_score,
    h_train_inverse,
    nonlinear_gain,
    render_fisher,
    silhouette_gain,
)
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import setup_camera
from splatam_tpu.render.render_tiled import rasterize_tiled

from tests.test_oracle import make_scene

CFG = RasterConfig(max_instances=4096, max_per_tile=256, chunk=128, backend="pallas")
SEED = 1e-3


def _params_from_scene(means, colors, opacities, scales, quats, n):
    pt_cld = np.concatenate([means, colors], axis=-1)
    params, variables = initialize_params(
        pt_cld, num_frames=1,
        mean3_sq_dist=np.full(n, 1e-4),
        gaussian_distribution="anisotropic", capacity=n,
    )
    params["log_scales"] = jnp.asarray(np.log(scales))
    params["unnorm_rotations"] = jnp.asarray(quats)
    params["logit_opacities"] = jnp.asarray(
        np.log(opacities / (1 - opacities)).reshape(-1, 1)
    )
    return params, variables


def _oracle_fisher(params, active, cam, n):
    """Per-pixel squared grads through the jnp rasterizer (small scenes)."""
    from splatam_tpu.core.losses import render_for_loss

    cfg = RasterConfig(max_instances=4096, max_per_tile=256, chunk=32, backend="jnp")
    rot0 = jnp.asarray([1.0, 0, 0, 0])
    tran0 = jnp.zeros(3)

    def pixels(means3d, logit_op):
        p = dict(params)
        p["means3D"] = means3d
        p["logit_opacities"] = logit_op
        out, _ = render_for_loss(
            p, active, rot0, tran0, cam, cfg,
            gaussians_grad=True, camera_grad=False,
        )
        return SEED * jnp.sum(out.color[:3], axis=0).ravel()  # (H*W,)

    jm, jo = jax.jacrev(pixels, argnums=(0, 1))(
        params["means3D"], params["logit_opacities"]
    )
    # chain logit -> opacity: the kernel differentiates w.r.t. raw opacity
    op = jax.nn.sigmoid(params["logit_opacities"]).reshape(-1)
    jo = jo.reshape(jo.shape[0], n) / (op * (1 - op))[None, :]
    f_mean = jnp.sum(jm**2, axis=0)  # (N, 3)
    f_op = jnp.sum(jo**2, axis=0)[:, None]
    return np.asarray(jnp.concatenate([f_mean, f_op], axis=-1))


def test_fisher_matches_pixelwise_autodiff():
    rng = np.random.default_rng(0)
    n, w, h = 24, 48, 32
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=n, w=w, h=h)
    params, variables = _params_from_scene(means, colors, opacities, scales, quats, n)

    h_pal = np.asarray(
        render_fisher(
            params, variables["active"], jnp.asarray([1.0, 0, 0, 0]),
            jnp.zeros(3), cam, CFG, seed_value=SEED,
        )
    )
    h_ref = _oracle_fisher(params, variables["active"], cam, n)
    scale = np.abs(h_ref).max() + 1e-20
    np.testing.assert_allclose(h_pal / scale, h_ref / scale, atol=5e-5)
    assert h_pal.shape == (n, 4)
    assert np.all(h_pal >= 0)


def test_gain_helpers():
    rng = np.random.default_rng(1)
    sil = jnp.asarray(rng.uniform(0, 1, (32, 48)).astype(np.float32))
    g = float(silhouette_gain(sil, k_sil=2.0))
    assert 0.0 <= g <= 2.0
    np.testing.assert_allclose(
        g, 2.0 * float((np.asarray(sil) < 0.5).mean()), rtol=1e-6
    )

    hs = [rng.uniform(0, 1, (10, 4)).astype(np.float32) for _ in range(5)]
    hinv = h_train_inverse(hs, monte_carlo=None)
    np.testing.assert_allclose(hinv, 1.0 / (np.sum(hs, axis=0) + 0.1), rtol=1e-6)
    # monte-carlo subsample keeps shape
    hinv40 = h_train_inverse(hs * 20, monte_carlo=40, rng=np.random.default_rng(0))
    assert hinv40.shape == (10, 4)

    score = float(eig_score(jnp.asarray(hs[0]), jnp.asarray(hinv)))
    assert np.isfinite(score) and score > 0
    nl = float(nonlinear_gain(jnp.asarray(score)))
    assert -1700.0 < nl < 1700.0


def _small_scene_params():
    rng = np.random.default_rng(3)
    n, w, h = 40, 48, 32
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=n, w=w, h=h)
    params, variables = _params_from_scene(
        means, colors, opacities, scales, quats, n
    )
    return params, variables["active"], cam, n


def test_fisher_h_train_matches_per_pose_sum():
    """The padded device-side scan == sum of individual render_fisher calls,
    with weight-0 pad slots contributing nothing."""
    from splatam_tpu.fisher import fisher_h_train

    params, active, cam, n = _small_scene_params()
    rot0 = np.array([1.0, 0, 0, 0], np.float32)
    rots = np.stack([rot0, rot0, rot0, rot0])
    trans = np.array(
        [[0, 0, 0], [0.01, 0, 0], [0, 0.01, 0], [9.9, 9.9, 9.9]], np.float32
    )
    wgt = np.array([1, 1, 1, 0], np.float32)  # last slot is padding

    h_sum = None
    for i in range(3):
        h = render_fisher(
            params, active, jnp.asarray(rots[i]), jnp.asarray(trans[i]),
            cam, CFG, seed_value=SEED,
        )
        h_sum = h if h_sum is None else h_sum + h

    h_train, over = fisher_h_train(
        params, active, jnp.asarray(rots), jnp.asarray(trans),
        jnp.asarray(wgt), cam, CFG, seed_value=SEED,
    )
    assert not bool(over)
    scale = float(jnp.abs(h_sum).max()) + 1e-20
    np.testing.assert_allclose(
        np.asarray(h_train) / scale, np.asarray(h_sum) / scale, atol=1e-6
    )


def test_render_gains_matches_separate_paths():
    """The fused per-candidate program == silhouette_gain + eig_score of the
    unfused calls."""
    from splatam_tpu.core.losses import render_for_loss
    from splatam_tpu.fisher import render_gains

    params, active, cam, n = _small_scene_params()
    rng = np.random.default_rng(7)
    hinv = jnp.asarray(rng.uniform(0.1, 2.0, (n, 4)).astype(np.float32))
    rot = jnp.asarray([1.0, 0, 0, 0])
    tran = jnp.asarray([0.02, -0.01, 0.0])

    g_sil, g_eig, over = render_gains(
        params, active, rot, tran, cam, CFG, h_train_inv=hinv,
        seed_value=SEED,
    )
    assert not bool(over)

    out, _ = render_for_loss(
        params, active, rot, tran, cam, CFG,
        gaussians_grad=False, camera_grad=False,
    )
    ref_sil = float(silhouette_gain(out.color[4]))
    h = render_fisher(params, active, rot, tran, cam, CFG, seed_value=SEED)
    ref_eig = float(eig_score(h, hinv))

    np.testing.assert_allclose(float(g_sil), ref_sil, rtol=1e-6)
    scale = abs(ref_eig) + 1e-20
    np.testing.assert_allclose(float(g_eig) / scale, ref_eig / scale, atol=1e-5)


def test_sized_fisher_config_and_overflow_flag():
    """sized caps fit the probe pose; a crushed cap raises the overflow
    flag instead of silently truncating."""
    import dataclasses

    from splatam_tpu.fisher import sized_fisher_config

    params, active, cam, n = _small_scene_params()
    rot = jnp.asarray([1.0, 0, 0, 0])
    tran = jnp.zeros(3)
    sized = sized_fisher_config(params, active, rot, tran, cam, CFG)
    assert sized.max_stream is not None and sized.max_chunks is not None

    h, over = render_fisher(
        params, active, rot, tran, cam, sized, seed_value=SEED,
        with_overflow=True,
    )
    assert not bool(over)
    h_ref = render_fisher(params, active, rot, tran, cam, CFG, seed_value=SEED)
    scale = float(jnp.abs(h_ref).max()) + 1e-20
    np.testing.assert_allclose(
        np.asarray(h) / scale, np.asarray(h_ref) / scale, atol=1e-6
    )

    crushed = dataclasses.replace(sized, max_stream=CFG.chunk, max_chunks=2)
    _, over = render_fisher(
        params, active, rot, tran, cam, crushed, seed_value=SEED,
        with_overflow=True,
    )
    assert bool(over)
