"""KNN, graphics utils, viz, capture-tool writers, stats aggregation."""
import json
import os

import numpy as np
import jax.numpy as jnp

from splatam_tpu.utils.graphics import focal2fov, fov2focal, get_projection_matrix
from splatam_tpu.utils.neighbors import calculate_neighbors, knn, mean_squared_knn_distance


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    q = rng.normal(size=(37, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(q), jnp.asarray(pts), k=4)
    full = ((q[:, None] - pts[None]) ** 2).sum(-1)
    ref_i = np.argsort(full, axis=1)[:, :4]
    ref_d = np.take_along_axis(full, ref_i, axis=1)
    np.testing.assert_allclose(np.sort(np.asarray(d)), np.sort(ref_d), atol=1e-3)


def test_self_knn_excludes_self():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    d, i = calculate_neighbors(pts, k=3)
    assert d.shape == (50, 3)
    assert float(d.min()) > 0  # self excluded
    msq = mean_squared_knn_distance(pts)
    np.testing.assert_allclose(np.asarray(msq), np.asarray(d).mean(-1), rtol=1e-5)


def test_knn_mean_sq_dist_method():
    from splatam_tpu.slam.initialize import get_pointcloud

    rng = np.random.default_rng(2)
    color = rng.uniform(0, 1, (3, 16, 16)).astype(np.float32)
    depth = rng.uniform(1, 3, (1, 16, 16)).astype(np.float32)
    k = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])
    pc, msq = get_pointcloud(
        color, depth, k, np.eye(4), compute_mean_sq_dist=True,
        mean_sq_dist_method="knn",
    )
    assert msq.shape == (256,)
    assert np.all(msq > 0)


def test_graphics_utils():
    f = fov2focal(focal2fov(600.0, 1200), 1200)
    np.testing.assert_allclose(f, 600.0, rtol=1e-6)
    p = get_projection_matrix(0.01, 100.0, 1.0, 0.8)
    assert p.shape == (4, 4) and p[3, 2] == 1.0


def test_viz_outputs(tmp_path):
    from splatam_tpu.core.params import initialize_params
    from splatam_tpu.render.binning import RasterConfig
    from splatam_tpu.viz import plot_trajectory, render_trajectory, rgbd2pcd

    rng = np.random.default_rng(0)
    pt_cld = np.concatenate(
        [rng.normal(size=(100, 3)) + [0, 0, 3], rng.uniform(0, 1, (100, 3))],
        axis=-1,
    ).astype(np.float32)
    params, variables = initialize_params(pt_cld, 3, np.full(100, 1e-3), "isotropic", 128)
    k = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]])
    cfg = RasterConfig(max_instances=2**12, max_per_tile=128, chunk=32, backend="jnp")

    out = tmp_path / "recon"
    render_trajectory(
        params, variables["active"], k, np.eye(4), str(out),
        width=32, height=24, raster_cfg=cfg,
    )
    assert len(os.listdir(out)) == 3
    plot_trajectory(params, None, str(tmp_path / "traj.png"))
    assert (tmp_path / "traj.png").exists()

    color = rng.uniform(0, 1, (3, 24, 32)).astype(np.float32)
    depth = rng.uniform(1, 3, (1, 24, 32)).astype(np.float32)
    pts, cols = rgbd2pcd(color, depth, np.eye(4), k)
    assert pts.shape[0] == 24 * 32 and cols.shape == pts.shape


def test_capture_writers_and_stats(tmp_path):
    from splatam_tpu.data import NeRFCaptureDataset
    from splatam_tpu.tools.nerfcapture2dataset import (
        init_capture_dir,
        save_frame,
        write_transforms,
    )
    from splatam_tpu.tools.stats import aggregate, write_csv

    # write a capture then read it back with NeRFCaptureDataset
    cap = tmp_path / "cap" / "seq"
    rng = np.random.default_rng(0)
    init_capture_dir(str(cap))
    frames = []
    for i in range(3):
        rgb = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        depth = rng.uniform(0.5, 2.0, (24, 32)).astype(np.float32)
        c2w = np.eye(4)
        c2w[0, 3] = 0.1 * i
        frames.append(save_frame(str(cap), i, rgb, depth, c2w))
    write_transforms(str(cap), frames, 32, 24, 20.0, 20.0, 16.0, 12.0)
    ds = NeRFCaptureDataset(str(tmp_path / "cap"), "seq",
                            desired_height=24, desired_width=32)
    assert len(ds) == 3
    color, depth, intr, pose = ds[1]
    assert color.shape == (24, 32, 3)

    # stats aggregation over a fake experiment tree
    run = tmp_path / "exp" / "run_0" / "eval"
    run.mkdir(parents=True)
    np.savetxt(run / "psnr.txt", [30.0, 32.0])
    np.savetxt(run / "l1.txt", [0.01, 0.02])
    rows = aggregate(str(tmp_path / "exp"))
    assert rows and rows[0]["psnr"] == 31.0
    write_csv(rows, str(tmp_path / "summary.csv"))
    assert (tmp_path / "summary.csv").exists()
