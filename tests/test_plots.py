"""viz/plots.py + tools/monte_plot.py: occupancy grids and metric plots."""
import numpy as np

from splatam_tpu.viz.plots import (
    load_running_metrics,
    make_occupancy_grid,
    occupancy_image,
    plot_combined_psnr,
    plot_eig_psnr_slice,
    plot_pose_gains,
    plot_value_psnr,
    save_running_metrics,
)


def test_occupancy_grid_marks_cluster():
    rng = np.random.default_rng(0)
    # dense cluster at (1, 2, z=0.5) + sparse noise at another z level
    cluster = np.array([1.0, 2.0, 0.5]) + 0.05 * rng.standard_normal((100, 3))
    noise = np.array([4.0, 4.0, 3.0]) + 0.05 * rng.standard_normal((5, 3))
    occ, extent = make_occupancy_grid(
        np.concatenate([cluster, noise]), np.eye(4), z_slice=0.5,
        z_tol=0.2, cell=0.5, min_points=10,
    )
    assert occ.any()
    assert extent["cell"] == 0.5
    img = occupancy_image(occ, scale=2)
    assert img.shape == (occ.shape[0] * 2, occ.shape[1] * 2, 3)
    assert (img[occ.repeat(2, 0).repeat(2, 1)] == 0).all()


def test_occupancy_grid_empty_slice():
    occ, extent = make_occupancy_grid(
        np.array([[0.0, 0.0, 10.0]]), np.eye(4), z_slice=0.5, z_tol=0.1
    )
    assert occ.shape == (1, 1) and not occ.any()


def test_gain_and_psnr_plots(tmp_path):
    gains = {
        "pose_a": [{"sil": 1.0, "eig": 2.0, "gain": 3.0}] * 5,
        "pose_b": [[{"sil": 0.5, "eig": 1.0, "gain": 1.5}]] * 3,
    }
    figs = plot_pose_gains(gains, save_dir=str(tmp_path))
    assert figs and all(f.endswith(".png") for f in figs)

    psnr = np.linspace(20, 30, 10)
    eig = np.linspace(0, 1, 10)
    sil = np.linspace(0, 2, 10)
    assert plot_value_psnr(psnr, eig, save_dir=str(tmp_path)).endswith(".pdf")
    assert plot_eig_psnr_slice(
        psnr, eig, sil, thr=1.5, save_dir=str(tmp_path)
    ).endswith("_sliced.pdf")
    assert plot_combined_psnr(
        psnr, sil, eig, save_dir=str(tmp_path)
    ).endswith(".pdf")


def test_running_metrics_roundtrip_and_monte_plot(tmp_path):
    import os

    run_a = tmp_path / "monte01"
    run_b = tmp_path / "monte02"
    for d, base in ((run_a, 0.0), (run_b, 1.0)):
        rows = [(base + i, 2 * i, 25.0 + i, 0.1 * i) for i in range(4)]
        save_running_metrics(rows, str(d))
        os.makedirs(d / "eval", exist_ok=True)
        for m in ("eig", "l1", "lpips", "psnr", "rmse", "ssim"):
            np.savetxt(d / "eval" / f"{m}.txt", np.arange(4.0), header=m)
    sil, eig, psnr = load_running_metrics(str(run_a))
    assert sil.shape == (4,) and psnr[0] == 25.0

    from tools.monte_plot import main as monte_main

    out = tmp_path / "stats"
    monte_main(
        [f"groupA:{run_a},{run_b}", "--out", str(out), "--sil_thr", "100"]
    )
    assert list(out.glob("statistics_*.txt"))
    assert list(out.glob("psnr_eig_*_sliced.pdf"))


def test_online_replay_writes_frames(tmp_path):
    from splatam_tpu.data.synthetic import SyntheticDataset
    from splatam_tpu.render.binning import RasterConfig
    from splatam_tpu.slam.pipeline import rgbd_slam
    from splatam_tpu.viz.recon import online_replay
    from tests.test_slam import small_config

    ds = SyntheticDataset(num_frames=2, width=32, height=24)
    cfg = small_config(num_frames=2)
    cfg["tracking"]["num_iters"] = 2
    cfg["mapping"]["num_iters"] = 2
    state = rgbd_slam(cfg, ds, progress=False)
    color, depth, k4, pose = ds[0]
    first_w2c = np.linalg.inv(np.asarray(pose))
    online_replay(
        state.params, state.variables["active"],
        state.variables["timestep"],
        np.asarray(k4)[:3, :3], first_w2c, str(tmp_path / "online"),
        width=32, height=24,
        keyframe_time_indices=[0, 1],
        raster_cfg=RasterConfig(
            max_instances=2**14, max_per_tile=256, chunk=32, backend="jnp"
        ),
    )
    assert (tmp_path / "online" / "online_0000.png").exists()
    assert (tmp_path / "online" / "online_0001.png").exists()


def test_visualize_tracking_loss_writes_figures(tmp_path):
    """tracking.visualize_tracking_loss must write the 2x4 diagnostic grid
    per dispatch segment (`scripts/splatam.py:299-344`)."""
    from splatam_tpu.data.synthetic import SyntheticDataset
    from splatam_tpu.slam.pipeline import rgbd_slam
    from tests.test_slam import small_config

    ds = SyntheticDataset(num_frames=2, width=32, height=24)
    cfg = small_config(num_frames=2)
    cfg["workdir"] = str(tmp_path)
    cfg["tracking"]["num_iters"] = 2
    cfg["tracking"]["visualize_tracking_loss"] = True
    cfg["mapping"]["num_iters"] = 1
    rgbd_slam(cfg, ds, progress=False)
    figs = list((tmp_path / "plots").glob("tracking_*/*.png"))
    assert figs, list((tmp_path / "plots").rglob("*"))
