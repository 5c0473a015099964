"""End-to-end CLI driver test: config file -> dataset -> SLAM -> eval -> ply."""
import os
import sys

import numpy as np
import pytest

from tests.test_datasets import _camera_params, _write_jpg, _write_png16


@pytest.fixture
def replica_scene(tmp_path):
    """On-disk Replica-format sequence rendered from the synthetic scene so
    tracking has real structure to lock onto."""
    from splatam_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(num_frames=6, width=64, height=48, seed=0)
    seq = tmp_path / "data" / "room0"
    (seq / "results").mkdir(parents=True)
    lines = []
    for i in range(6):
        color, depth, k, pose = ds[i]
        _write_jpg(seq / "results" / f"frame{i:06d}.jpg", color)
        _write_png16(seq / "results" / f"depth{i:06d}.png", depth[..., 0] * 6553.5)
        lines.append(" ".join(str(v) for v in np.asarray(pose).ravel()))
    (seq / "traj.txt").write_text("\n".join(lines) + "\n")

    yaml = tmp_path / "replica.yaml"
    k = ds.k
    yaml.write_text(
        "dataset_name: 'replica'\n"
        "camera_params:\n"
        "  image_height: 48\n  image_width: 64\n"
        f"  fx: {k[0][0]}\n  fy: {k[1][1]}\n  cx: {k[0][2]}\n  cy: {k[1][2]}\n"
        "  png_depth_scale: 6553.5\n  crop_edge: 0\n"
    )
    return tmp_path, yaml


def _write_config(tmp_path, yaml, workdir, extra=""):
    cfg = tmp_path / "exp.py"
    cfg.write_text(f"""
config = dict(
    workdir="{workdir}", run_name="test_0", seed=0,
    map_every=1, keyframe_every=2, mapping_window_size=5,
    eval_every=1, scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective", gaussian_distribution="isotropic",
    load_checkpoint=False, checkpoint_time_idx=0,
    save_checkpoints=True, checkpoint_interval=3,
    raster=dict(max_instances=2**16, max_per_tile=512, chunk=32, backend="jnp"),
    data=dict(
        basedir="{tmp_path}/data", gradslam_data_cfg="{yaml}",
        sequence="room0", desired_image_height=48, desired_image_width=64,
        start=0, end=-1, stride=1, num_frames=-1,
        {extra}
    ),
    tracking=dict(
        use_gt_poses=False, forward_prop=True, num_iters=10,
        use_sil_for_loss=True, sil_thres=0.99, use_l1=True,
        ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0),
        lrs=dict(means3D=0.0, rgb_colors=0.0, unnorm_rotations=0.0,
                 logit_opacities=0.0, log_scales=0.0,
                 cam_unnorm_rots=0.002, cam_trans=0.004),
    ),
    mapping=dict(
        num_iters=10, add_new_gaussians=True, sil_thres=0.5, use_l1=True,
        use_sil_for_loss=False, ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0),
        lrs=dict(means3D=0.0001, rgb_colors=0.0025, unnorm_rotations=0.001,
                 logit_opacities=0.05, log_scales=0.001,
                 cam_unnorm_rots=0.0, cam_trans=0.0),
        prune_gaussians=True,
        pruning_dict=dict(start_after=0, remove_big_after=0, stop_after=20,
                          prune_every=20, removal_opacity_threshold=0.005,
                          final_removal_opacity_threshold=0.005,
                          reset_opacities=False, reset_opacities_every=500),
        use_gaussian_splatting_densification=False,
        densify_dict=dict(start_after=500, remove_big_after=3000,
                          stop_after=5000, densify_every=100,
                          grad_thresh=0.0002, num_to_split_into=2,
                          removal_opacity_threshold=0.005,
                          final_removal_opacity_threshold=0.005,
                          reset_opacities_every=3000),
    ),
)
""")
    return cfg


def test_slam_cli_end_to_end(replica_scene, tmp_path, monkeypatch):
    tmp, yaml = replica_scene
    workdir = str(tmp_path / "experiments")
    cfg = _write_config(tmp, yaml, workdir)

    from splatam_tpu.run import slam

    monkeypatch.setattr(sys, "argv", ["slam", str(cfg)])
    slam.main()

    run_dir = os.path.join(workdir, "test_0")
    assert os.path.exists(os.path.join(run_dir, "params.npz"))
    assert os.path.exists(os.path.join(run_dir, "splat.ply"))
    assert os.path.exists(os.path.join(run_dir, "eval", "psnr.txt"))
    assert os.path.exists(os.path.join(run_dir, "params3.npz"))  # checkpoint
    assert os.path.exists(os.path.join(run_dir, "config.py"))

    psnr = np.loadtxt(os.path.join(run_dir, "eval", "psnr.txt"))
    assert np.mean(psnr) > 15.0, f"SLAM quality too low: {np.mean(psnr)}"

    # resume from the saved checkpoint
    resume_cfg = (tmp / "exp.py").read_text().replace(
        "load_checkpoint=False", "load_checkpoint=True"
    ).replace("checkpoint_time_idx=0", "checkpoint_time_idx=3")
    cfg2 = tmp / "exp_resume.py"
    cfg2.write_text(resume_cfg)
    monkeypatch.setattr(sys, "argv", ["slam", str(cfg2)])
    slam.main()

    # visualize the result through the viz CLI
    from splatam_tpu.run import viz

    monkeypatch.setattr(sys, "argv", ["viz", str(cfg), "--every", "3"])
    viz.main()
    assert os.path.exists(os.path.join(run_dir, "trajectory.png"))
    assert len(os.listdir(os.path.join(run_dir, "recon"))) >= 2

    # export ply through its CLI
    from splatam_tpu.run import export_ply

    monkeypatch.setattr(sys, "argv", ["export_ply", str(cfg)])
    export_ply.main()


def test_synthetic_slam_cli(monkeypatch):
    from splatam_tpu.run import synthetic_slam

    res = synthetic_slam.main(
        ["--frames", "4", "--width", "64", "--height", "48",
         "--track_iters", "5", "--map_iters", "5", "--backend", "jnp"]
    )
    assert res["ate_m"] < 0.1 and np.isfinite(res["psnr"])


def test_slam_cli_separate_densify_res(replica_scene, tmp_path, monkeypatch):
    tmp, yaml = replica_scene
    workdir = str(tmp_path / "experiments_s")
    cfg = _write_config(
        tmp, yaml, workdir,
        extra="densification_image_height=24, densification_image_width=32,",
    )
    from splatam_tpu.run import slam

    monkeypatch.setattr(sys, "argv", ["slam", str(cfg)])
    slam.main()
    assert os.path.exists(os.path.join(workdir, "test_0", "params.npz"))


def test_realtime_cli_replay(tmp_path):
    """run/realtime.py flag parity (`splatam_realtime.py:1117-1162`) driving
    a replayed dumped stream end-to-end."""
    from splatam_tpu.data.synthetic import SyntheticDataset
    from splatam_tpu.run.realtime import main as realtime_main
    from splatam_tpu.utils.dump import dump_dataset

    ds = SyntheticDataset(num_frames=3, width=64, height=48)
    dump_dir = str(tmp_path / "dump")
    dump_dataset(ds, dump_dir)

    cfg = tmp_path / "rt.py"
    cfg.write_text(f"""
config = dict(
    workdir="{tmp_path}/experiments", run_name="rt_0", seed=0,
    map_every=1, keyframe_every=2, mapping_window_size=4,
    scene_radius_depth_ratio=3, mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    raster=dict(max_instances=2**16, max_per_tile=512, chunk=64, backend="jnp"),
    data=dict(num_frames=-1),
    tracking=dict(
        use_gt_poses=False, forward_prop=True, num_iters=4,
        use_sil_for_loss=True, sil_thres=0.99, use_l1=True,
        ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0),
        lrs=dict(cam_unnorm_rots=0.002, cam_trans=0.004),
    ),
    mapping=dict(
        num_iters=3, add_new_gaussians=True, sil_thres=0.5, use_l1=True,
        use_sil_for_loss=False, ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0),
        lrs=dict(means3D=0.0001, rgb_colors=0.0025, unnorm_rotations=0.001,
                 logit_opacities=0.05, log_scales=0.001,
                 cam_unnorm_rots=0.0, cam_trans=0.0),
        prune_gaussians=False,
        use_gaussian_splatting_densification=False,
    ),
)
""")
    state, handler = realtime_main(
        [str(cfg), "--replay", dump_dir, "--k_sil", "500.0", "--k_eig", "0.2",
         "--nl_sil", "--n_monte", "10", "--map_iter", "2",
         "--median_scale", "40.0"]
    )
    assert handler is not None
    assert handler.cfg.k_sil == 500.0
    assert handler.cfg.nl_sil is True
    assert handler.cfg.monte_carlo == 10
    assert len(state.keyframe_time_indices) >= 1
