"""Eval subsystem tests: ATE alignment, metrics, checkpoint round-trip."""
import os

import numpy as np
import jax.numpy as jnp

from splatam_tpu.eval.ate import align, evaluate_ate
from splatam_tpu.eval.metrics import ms_ssim, psnr, ssim


def test_ate_zero_for_rigidly_transformed_trajectory(rng):
    pts = rng.normal(size=(3, 30))
    # random rigid transform of the whole trajectory should align away
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    moved = R @ pts + np.array([[1.0], [2.0], [-0.5]])
    _, _, err = align(moved, pts)
    assert err.max() < 1e-9


def test_evaluate_ate_detects_drift(rng):
    gt = [np.eye(4) for _ in range(20)]
    est = []
    for i, g in enumerate(gt):
        e = g.copy()
        e[:3, 3] += np.array([0.01 * i, 0, 0])  # linear drift
        est.append(e)
    ate = evaluate_ate(gt, est)
    assert 0.01 < ate < 0.2


def test_psnr_reference_formula():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    expected = 20 * np.log10(1.0 / 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), expected, rtol=1e-5)


def test_ssim_and_msssim_bounds(rng):
    img = jnp.asarray(rng.uniform(0, 1, (3, 64, 80)).astype(np.float32))
    assert float(ssim(img, img)) > 0.999
    assert float(ms_ssim(img, img)) > 0.999
    noisy = jnp.clip(
        img + 0.5 * jnp.asarray(rng.normal(size=(3, 64, 80)).astype(np.float32)), 0, 1
    )
    assert float(ms_ssim(img, noisy)) < float(ms_ssim(img, img))


def test_checkpoint_roundtrip(tmp_path, rng):
    from splatam_tpu.core.params import initialize_params, num_active
    from splatam_tpu.utils.checkpoint import load_params, save_params

    pt_cld = rng.normal(size=(100, 6)).astype(np.float32)
    params, variables = initialize_params(pt_cld, 5, np.ones(100, np.float32))
    # deactivate some slots to ensure padding is stripped
    variables["active"] = variables["active"].at[10:20].set(False)
    save_params(
        params, variables, str(tmp_path),
        intrinsics=np.eye(3), first_w2c=np.eye(4),
        keyframe_time_indices=[0, 4],
    )
    p2, v2, extras = load_params(os.path.join(tmp_path, "params.npz"))
    assert num_active(v2) == 90
    active = np.asarray(variables["active"])
    np.testing.assert_allclose(
        np.asarray(p2["means3D"])[:90], np.asarray(params["means3D"])[active]
    )
    np.testing.assert_allclose(np.asarray(p2["cam_trans"]), np.asarray(params["cam_trans"]))
    assert "intrinsics" in extras and "keyframe_time_indices" in extras
