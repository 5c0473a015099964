"""Dataset layer tests: on-disk fixtures in reference formats."""
import json
import os

import numpy as np
import pytest

from splatam_tpu.data import (
    PrefetchLoader,
    ReplicaDataset,
    ScannetDataset,
    TUMDataset,
    get_dataset,
    load_dataset_config,
)


def _write_png16(path, arr):
    import cv2

    cv2.imwrite(str(path), arr.astype(np.uint16))


def _write_jpg(path, arr):
    import cv2

    cv2.imwrite(str(path), arr[..., ::-1].astype(np.uint8))  # RGB -> BGR


def _camera_params(w, h, depth_scale):
    return {
        "image_height": h,
        "image_width": w,
        "fx": 100.0,
        "fy": 100.0,
        "cx": w / 2,
        "cy": h / 2,
        "png_depth_scale": depth_scale,
    }


@pytest.fixture
def replica_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "room0" / "results"
    d.mkdir(parents=True)
    poses = []
    for i in range(4):
        _write_jpg(d / f"frame{i:06d}.jpg", rng.uniform(0, 255, (48, 64, 3)))
        _write_png16(d / f"depth{i:06d}.png", rng.uniform(1000, 4000, (48, 64)))
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i, 0, 0]
        poses.append(c2w)
    with open(tmp_path / "room0" / "traj.txt", "w") as f:
        for p in poses:
            f.write(" ".join(str(v) for v in p.ravel()) + "\n")
    return tmp_path


def test_replica_loader(replica_dir):
    cfg = {"dataset_name": "replica", "camera_params": _camera_params(64, 48, 6553.5)}
    ds = get_dataset(cfg, str(replica_dir), "room0",
                     desired_height=24, desired_width=32)
    assert len(ds) == 4
    color, depth, intr, pose = ds[1]
    assert color.shape == (24, 32, 3) and color.dtype == np.float32
    assert color.max() > 1.0  # [0..255] range preserved
    assert depth.shape == (24, 32, 1)
    assert 0.1 < depth.mean() < 0.7  # raw/6553.5 meters
    # intrinsics scaled by resize ratio
    np.testing.assert_allclose(intr[0, 0], 100.0 * 32 / 64)
    np.testing.assert_allclose(intr[1, 1], 100.0 * 24 / 48)
    # poses relative to frame 0
    np.testing.assert_allclose(ds[0][3], np.eye(4), atol=1e-6)
    np.testing.assert_allclose(pose[:3, 3], [0.1, 0, 0], atol=1e-6)


def test_replica_stride_and_range(replica_dir):
    cfg = {"dataset_name": "replica", "camera_params": _camera_params(64, 48, 6553.5)}
    ds = ReplicaDataset(cfg, str(replica_dir), "room0", stride=2,
                        desired_height=24, desired_width=32)
    assert len(ds) == 2
    np.testing.assert_allclose(ds[1][3][:3, 3], [0.2, 0, 0], atol=1e-6)


def test_tum_loader(tmp_path):
    import cv2

    rng = np.random.default_rng(1)
    seq = tmp_path / "fr1"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], ["# ts file"], ["# ts tx ty tz qx qy qz qw"]
    for i in range(3):
        t = i * 0.1
        _write_jpg(seq / "rgb" / f"{t:.4f}.png", rng.uniform(0, 255, (48, 64, 3)))
        _write_png16(seq / "depth" / f"{t:.4f}.png", rng.uniform(1000, 30000, (48, 64)))
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        depth_lines.append(f"{t:.4f} depth/{t:.4f}.png")
        gt_lines.append(f"{t:.4f} {0.05*i} 0 0 0 0 0 1")
    (seq / "rgb.txt").write_text("\n".join(["# ts file"] + rgb_lines))
    (seq / "depth.txt").write_text("\n".join(depth_lines))
    (seq / "groundtruth.txt").write_text("\n".join(gt_lines))

    cfg = {
        "dataset_name": "tum",
        "camera_params": {**_camera_params(64, 48, 5000.0), "crop_edge": 4},
    }
    ds = TUMDataset(cfg, str(tmp_path), "fr1", desired_height=48, desired_width=64)
    assert len(ds) == 3
    color, depth, intr, pose = ds[2]
    # crop_edge trims 4 px per side and shifts the principal point
    assert color.shape == (40, 56, 3)
    assert depth.shape == (40, 56, 1)
    np.testing.assert_allclose(intr[0, 2], 32.0 - 4.0)
    np.testing.assert_allclose(pose[:3, 3], [0.1, 0, 0], atol=1e-6)


def test_scannet_loader(tmp_path):
    rng = np.random.default_rng(2)
    seq = tmp_path / "scene0000_00"
    for sub in ("color", "depth", "pose"):
        (seq / sub).mkdir(parents=True)
    for i in range(3):
        _write_jpg(seq / "color" / f"{i}.jpg", rng.uniform(0, 255, (48, 64, 3)))
        _write_png16(seq / "depth" / f"{i}.png", rng.uniform(500, 5000, (48, 64)))
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0.2 * i, 0]
        np.savetxt(seq / "pose" / f"{i}.txt", c2w)
    cfg = {"dataset_name": "scannet", "camera_params": _camera_params(64, 48, 1000.0)}
    ds = ScannetDataset(cfg, str(tmp_path), "scene0000_00",
                        desired_height=48, desired_width=64)
    assert len(ds) == 3
    np.testing.assert_allclose(ds[2][3][:3, 3], [0, 0.4, 0], atol=1e-6)


def test_scannetpp_loader(tmp_path):
    rng = np.random.default_rng(3)
    seq = tmp_path / "scene" / "dslr"
    (seq / "undistorted_images").mkdir(parents=True)
    (seq / "undistorted_depths").mkdir()
    (seq / "nerfstudio").mkdir()
    frames = []
    for i in range(3):
        name = f"DSC{i:05d}.JPG"
        _write_jpg(seq / "undistorted_images" / name, rng.uniform(0, 255, (48, 64, 3)))
        _write_png16(
            seq / "undistorted_depths" / name.replace(".JPG", ".png"),
            rng.uniform(500, 5000, (48, 64)),
        )
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 0.1 * i]
        frames.append({"file_path": name, "transform_matrix": c2w.tolist(),
                       "is_bad": False})
    meta = {"h": 48, "w": 64, "fl_x": 100.0, "fl_y": 100.0, "cx": 32.0, "cy": 24.0,
            "frames": frames, "test_frames": frames[:1]}
    (seq / "nerfstudio" / "transforms_undistorted.json").write_text(json.dumps(meta))
    (seq / "train_test_lists.json").write_text(json.dumps(
        {"train": [f["file_path"] for f in frames],
         "test": [frames[0]["file_path"]]}
    ))
    cfg = {"dataset_name": "scannetpp"}
    ds = get_dataset(cfg, str(tmp_path), "scene",
                     desired_height=48, desired_width=64)
    assert len(ds) == 3
    color, depth, intr, pose = ds[0]
    assert color.shape == (48, 64, 3)
    np.testing.assert_allclose(pose, np.eye(4), atol=1e-6)


def test_dataconfig_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("camera_params:\n  fx: 100.0\n  fy: 100.0\ndataset_name: replica\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        f"inherit_from: {base}\ncamera_params:\n  fx: 200.0\n"
    )
    cfg = load_dataset_config(str(child))
    assert cfg["camera_params"]["fx"] == 200.0
    assert cfg["camera_params"]["fy"] == 100.0
    assert cfg["dataset_name"] == "replica"


def test_prefetch_loader(replica_dir):
    cfg = {"dataset_name": "replica", "camera_params": _camera_params(64, 48, 6553.5)}
    ds = ReplicaDataset(cfg, str(replica_dir), "room0",
                        desired_height=24, desired_width=32)
    frames = list(PrefetchLoader(ds, lookahead=2))
    assert len(frames) == 4
    ref = ds[3]
    for a, b in zip(frames[3], ref):
        np.testing.assert_array_equal(a, b)
