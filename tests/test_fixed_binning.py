"""fixed_binning tracking: frozen per-frame instance stream still converges."""
import numpy as np
import jax.numpy as jnp
import pytest

from splatam_tpu.data.synthetic import SyntheticDataset
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.slam.initialize import initialize_first_timestep
from splatam_tpu.slam.tracking import track_frame


def test_fixed_binning_tracks_as_well():
    ds = SyntheticDataset(num_frames=2, width=64, height=48, seed=0)
    color, depth, k, pose = ds[0]
    params, variables, _, _, cam, _ = initialize_first_timestep(
        color, depth, k, pose, 2, 3.0, "isotropic"
    )
    c1, d1, _, pose1 = ds[1]
    im = jnp.asarray(np.transpose(c1, (2, 0, 1)) / 255.0, jnp.float32)
    dep = jnp.asarray(np.transpose(d1, (2, 0, 1)), jnp.float32)
    cfg = RasterConfig(
        max_instances=2**16, max_per_tile=512, chunk=128, backend="pallas"
    )
    rot0 = params["cam_unnorm_rots"][0, :, 0]
    tran0 = params["cam_trans"][0, :, 0]

    losses = {}
    poses = {}
    for fb in (False, True):
        r = track_frame(
            params, variables["active"], rot0, tran0, im, dep, cam, cfg,
            num_iters=15, fixed_binning=fb,
        )
        losses[fb] = float(r.best_loss)
        poses[fb] = np.concatenate([np.asarray(r.best_rot), np.asarray(r.best_tran)])
        assert not bool(r.overflow)

    # both must improve over the initial pose and land near each other
    r0 = track_frame(
        params, variables["active"], rot0, tran0, im, dep, cam, cfg, num_iters=1
    )
    assert losses[True] < float(r0.best_loss)
    assert losses[False] < float(r0.best_loss)
    # mid-optimization poses agree to first order (binning staleness only
    # perturbs the step direction, not the optimum)
    np.testing.assert_allclose(poses[True], poses[False], atol=3e-2)
    assert losses[True] < 1.25 * losses[False]


def test_frozen_binning_render_drift_bounded():
    """Oracle bound for the rebin_every deviation: rendering with binning
    frozen from a pose that then moved a realistic per-rebin-window distance
    (mm-scale translation + millirad rotation) must stay close to an
    exactly re-binned render."""
    from splatam_tpu.core.losses import compute_binned, render_for_loss

    ds = SyntheticDataset(num_frames=2, width=64, height=48, seed=0)
    color, depth, k, pose = ds[0]
    params, variables, _, _, cam, _ = initialize_first_timestep(
        color, depth, k, pose, 2, 3.0, "isotropic"
    )
    cfg = RasterConfig(
        max_instances=2**16, max_per_tile=512, chunk=128, backend="pallas"
    )
    rot0 = params["cam_unnorm_rots"][0, :, 0]
    tran0 = params["cam_trans"][0, :, 0]
    # ~10 Adam steps of drift at tracking lrs (lr_tran 2e-3)
    rot1 = rot0 + jnp.asarray([0.0, 2e-3, -1e-3, 1e-3])
    tran1 = tran0 + jnp.asarray([5e-3, -5e-3, 5e-3])

    stale = compute_binned(params, variables["active"], rot0, tran0, cam, cfg)
    out_stale, _ = render_for_loss(
        params, variables["active"], rot1, tran1, cam, cfg,
        gaussians_grad=False, camera_grad=False, binned=stale,
    )
    out_fresh, _ = render_for_loss(
        params, variables["active"], rot1, tran1, cam, cfg,
        gaussians_grad=False, camera_grad=False,
    )
    im_err = float(jnp.mean(jnp.abs(out_stale.color[:3] - out_fresh.color[:3])))
    im_mag = float(jnp.mean(jnp.abs(out_fresh.color[:3])))
    assert im_err < 0.02 * max(im_mag, 1e-3), (im_err, im_mag)


def test_saturation_trim_drift_bounded():
    """Re-binning with the previous render's saturation caps while params
    drift (an Adam-scale perturbation per step) must keep renders within the
    frozen-binning drift envelope: deeper instances that become visible
    within SAT_MARGIN of the cap are retained, and rebins refresh the cap."""
    import jax

    from splatam_tpu.core.losses import compute_binned, slam_loss
    from splatam_tpu.core.params import GAUSSIAN_KEYS
    from splatam_tpu.slam.initialize import initialize_first_timestep

    ds = SyntheticDataset(num_frames=2, width=64, height=48, seed=1)
    color, depth, k, pose = ds[0]
    params, variables, _, _, cam, _ = initialize_first_timestep(
        color, depth, k, pose, 2, 3.0, "isotropic"
    )
    im = jnp.asarray(np.transpose(color, (2, 0, 1)) / 255.0, jnp.float32)
    dep = jnp.asarray(np.transpose(depth, (2, 0, 1)), jnp.float32)
    cfg = RasterConfig(
        max_instances=2**16, max_per_tile=512, chunk=128, backend="pallas"
    )
    rot0 = params["cam_unnorm_rots"][0, :, 0]
    tran0 = params["cam_trans"][0, :, 0]
    active = variables["active"]

    def loss_of(p, binned):
        return slam_loss(
            p, active, rot0, tran0, im, dep, cam, cfg,
            tracking=False, loss_w_im=0.5, loss_w_depth=1.0,
            use_sil_for_loss=False, sil_thres=0.5,
            ignore_outlier_depth_loss=False, binned=binned,
        )

    rng = np.random.default_rng(0)
    p = dict(params)
    sat = None
    for step in range(4):
        # rebin at current params: trimmed by the previous render's caps
        binned_full = compute_binned(p, active, rot0, tran0, cam, cfg)
        binned_trim = (
            binned_full if sat is None
            else compute_binned(p, active, rot0, tran0, cam, cfg, sat)
        )
        out_full = loss_of(p, binned_full)
        out_trim = loss_of(p, binned_trim)
        assert abs(float(out_trim.loss) - float(out_full.loss)) <= (
            1e-3 * max(abs(float(out_full.loss)), 1.0)
        ), step
        np.testing.assert_allclose(
            np.asarray(out_trim.im), np.asarray(out_full.im), atol=5e-3
        )
        sat = out_trim.sat_depth
        # Adam-scale drift: means move ~1e-3, opacities ~1e-2
        p = dict(p)
        p["means3D"] = p["means3D"] + jnp.asarray(
            rng.normal(0, 1e-3, p["means3D"].shape).astype(np.float32)
        )
        p["logit_opacities"] = p["logit_opacities"] + jnp.asarray(
            rng.normal(0, 1e-2, p["logit_opacities"].shape).astype(np.float32)
        )
