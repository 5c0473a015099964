"""Pure-numpy interactive-viewer geometry (viz/geometry.py).

Headless unit tests for the frustum / trajectory builders the Open3D
interactive path consumes (`viz_scripts/final_recon.py:94-224` analogs).
"""
import numpy as np

from splatam_tpu.viz.geometry import (
    camera_frustum_lines,
    cool_colormap,
    frustum_colors,
    scene_geometry,
    trajectory_colors,
    trajectory_lineset,
)


def test_camera_frustum_identity_cam():
    k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    pts, lines = camera_frustum_lines(64, 48, k, np.eye(4), scale=0.05)
    assert pts.shape == (5, 3) and lines.shape == (8, 2)
    # center at the origin; corners at depth `scale` in front of the camera
    np.testing.assert_allclose(pts[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(pts[1:, 2], 0.05, atol=1e-12)
    # corner (0, 0) unprojects to negative x/y of the principal point ray
    np.testing.assert_allclose(
        pts[1, :2], [-32 / 100 * 0.05, -24 / 100 * 0.05], atol=1e-12
    )
    # each line references valid points; the 4 center spokes come first
    assert lines.min() == 0 and lines.max() == 4
    assert (lines[:4, 0] == 0).all()


def test_camera_frustum_respects_pose():
    k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    w2c = np.eye(4)
    w2c[:3, 3] = [0.0, 0.0, -2.0]  # camera at z=+2 in world
    pts, _ = camera_frustum_lines(64, 48, k, w2c, scale=0.1)
    np.testing.assert_allclose(pts[0], [0, 0, 2.0], atol=1e-12)
    np.testing.assert_allclose(pts[1:, 2], 2.1, atol=1e-12)


def test_trajectory_lineset_chain():
    pts = np.arange(15, dtype=np.float64).reshape(5, 3)
    out_pts, lines = trajectory_lineset(pts)
    np.testing.assert_array_equal(out_pts, pts)
    np.testing.assert_array_equal(lines[:, 1], np.arange(4))
    np.testing.assert_array_equal(lines[:, 0], np.arange(1, 5))


def test_colormaps_match_matplotlib_cool():
    import matplotlib.pyplot as plt

    t = np.linspace(0, 1, 7)
    ref = plt.get_cmap("cool")(t)[:, :3]
    np.testing.assert_allclose(cool_colormap(t), ref, atol=1 / 255.0)
    assert frustum_colors(10).shape == (10, 3)
    assert trajectory_colors(9).shape == (9, 3)


def test_scene_geometry_from_params():
    # minimal params with a 3-pose trajectory
    rots = np.zeros((1, 4, 3), np.float32)
    rots[0, 0, :] = 1.0
    trans = np.zeros((1, 3, 3), np.float32)
    trans[0, 0] = [0.0, 0.1, 0.2]  # x walk
    params = {"cam_unnorm_rots": rots, "cam_trans": trans}
    k = np.array([[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]])
    geo = scene_geometry(params, 64, 48, k, frustum_size=0.02)
    assert len(geo["frustums"]) == 3
    assert geo["trajectory"]["points"].shape == (3, 3)
    assert geo["trajectory"]["lines"].shape == (2, 2)
    assert geo["trajectory"]["colors"].shape == (2, 3)
    # camera centers walk along -x (w2c translation +x => center -x)
    np.testing.assert_allclose(
        geo["trajectory"]["points"][:, 0], [0.0, -0.1, -0.2], atol=1e-6
    )


def test_render_view_headless():
    """_render_view (the testable core of the interactive loops) renders
    from an arbitrary viewer w2c and back-projects to a point cloud."""
    import jax.numpy as jnp

    from splatam_tpu.viz.recon import _render_view

    rng = np.random.default_rng(0)
    n = 30
    params = {
        "means3D": rng.normal(0, 0.3, (n, 3)).astype(np.float32) + [0, 0, 2.0],
        "rgb_colors": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "unnorm_rotations": np.tile([1, 0, 0, 0], (n, 1)).astype(np.float32),
        "logit_opacities": np.full((n, 1), 2.0, np.float32),
        "log_scales": np.full((n, 1), -2.5, np.float32),
    }
    params = {k: jnp.asarray(v) for k, v in params.items()}
    active = jnp.ones(n, bool)
    k = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    from splatam_tpu.render.binning import RasterConfig

    cfg = RasterConfig(max_instances=4096, max_per_tile=256, chunk=128)
    pts, cols = _render_view(params, active, np.eye(4), k, 64, 48, cfg,
                             "color")
    assert pts.shape[1] == 3 and cols.shape[1] == 3 and len(pts) > 0
    assert np.isfinite(pts).all()
    # centers mode returns the raw gaussian means
    pts_c, cols_c = _render_view(params, active, np.eye(4), k, 64, 48, cfg,
                                 "centers")
    assert len(pts_c) == n
