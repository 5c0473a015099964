"""Reconstruction visualization from a saved params.npz.

Parity targets: `viz_scripts/final_recon.py` (interactive Open3D recon) and
`viz_scripts/online_recon.py` (per-keyframe replay). Headless TPU pods have
no display, so the primary path renders the estimated trajectory with the
TPU rasterizer and writes RGB/depth frames + a trajectory plot; the
interactive Open3D point-cloud view is kept behind an optional import.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from splatam_tpu.core.losses import render_for_loss
from splatam_tpu.core.params import get_pose
from splatam_tpu.core.transforms import pose_to_w2c
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import setup_camera


def rgbd2pcd(
    color: np.ndarray,  # (3, H, W) [0..1]
    depth: np.ndarray,  # (1, H, W) meters
    w2c: np.ndarray,
    intrinsics: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Back-project a rendered RGB-D frame to a world-frame point cloud
    (`viz_scripts/final_recon.py` rgbd2pcd analog)."""
    _, h, w = color.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    z = depth[0]
    pts_cam = np.stack(
        [(xx - cx) / fx * z, (yy - cy) / fy * z, z, np.ones_like(z)], axis=-1
    ).reshape(-1, 4)
    pts_world = (np.linalg.inv(w2c) @ pts_cam.T).T[:, :3]
    cols = color.reshape(3, -1).T
    valid = z.reshape(-1) > 0
    return pts_world[valid], cols[valid]


def render_trajectory(
    params: Dict,
    active,
    intrinsics: np.ndarray,
    first_w2c: np.ndarray,
    out_dir: str,
    *,
    width: int,
    height: int,
    raster_cfg: RasterConfig = RasterConfig(),
    every: int = 1,
    render_mode: str = "color",  # 'color' | 'depth' | 'sil'
    view_scale: float = 1.0,
) -> None:
    """Replay the estimated trajectory and save rendered frames as PNGs."""
    import imageio.v2 as imageio

    os.makedirs(out_dir, exist_ok=True)
    w, h = int(width * view_scale), int(height * view_scale)
    k = np.asarray(intrinsics).copy() * view_scale
    k[2, 2] = 1.0
    cam = setup_camera(w, h, k, first_w2c)

    render = jax.jit(
        lambda p, a, r, t: render_for_loss(
            p, a, r, t, cam, raster_cfg, gaussians_grad=False, camera_grad=False
        )[0]
    )
    gauss_only = {k: v for k, v in params.items() if not k.startswith("cam_")}
    num_frames = params["cam_unnorm_rots"].shape[-1]
    for t in range(0, num_frames, every):
        rot_t, tran_t = get_pose(params, t)
        out = render(gauss_only, active, rot_t, tran_t)
        if render_mode == "depth":
            d = np.asarray(out.color[3])
            img = (np.clip(d / max(d.max(), 1e-6), 0, 1) * 255).astype(np.uint8)
        elif render_mode == "sil":
            img = (np.clip(np.asarray(out.color[4]), 0, 1) * 255).astype(np.uint8)
        else:
            img = (
                np.clip(np.asarray(out.color[:3]), 0, 1).transpose(1, 2, 0) * 255
            ).astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, f"recon_{t:04d}.png"), img)


def online_replay(
    params: Dict,
    active,
    timestep,
    intrinsics: np.ndarray,
    first_w2c: np.ndarray,
    out_dir: str,
    *,
    width: int,
    height: int,
    keyframe_time_indices=None,
    raster_cfg: RasterConfig = RasterConfig(),
    view_scale: float = 1.0,
) -> None:
    """Per-keyframe ONLINE reconstruction replay (`viz_scripts/online_recon.py`).

    For each keyframe time t the map is rendered with only the Gaussians
    that existed by t (``timestep <= t``) at the ESTIMATED pose for t —
    showing the reconstruction as SLAM saw it grow, not the final map.
    Headless: frames are written as PNGs (the reference drives an Open3D
    window; TPU pods have no display).
    """
    import imageio.v2 as imageio
    import jax.numpy as jnp

    os.makedirs(out_dir, exist_ok=True)
    w, h = int(width * view_scale), int(height * view_scale)
    k = np.asarray(intrinsics).copy() * view_scale
    k[2, 2] = 1.0
    cam = setup_camera(w, h, k, first_w2c)

    render = jax.jit(
        lambda p, a, r, t: render_for_loss(
            p, a, r, t, cam, raster_cfg, gaussians_grad=False,
            camera_grad=False,
        )[0]
    )
    gauss_only = {kk: v for kk, v in params.items() if not kk.startswith("cam_")}
    num_frames = params["cam_unnorm_rots"].shape[-1]
    if keyframe_time_indices is None:
        keyframe_time_indices = list(range(num_frames))
    active = jnp.asarray(active)
    timestep = jnp.asarray(timestep)
    for t in keyframe_time_indices:
        t = int(t)
        born = active & (timestep <= t)
        rot_t, tran_t = get_pose(params, t)
        out = render(gauss_only, born, rot_t, tran_t)
        img = (
            np.clip(np.asarray(out.color[:3]), 0, 1).transpose(1, 2, 0) * 255
        ).astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, f"online_{t:04d}.png"), img)


def plot_trajectory(params: Dict, gt_w2c_all: Optional[np.ndarray], out_path: str):
    """Top-down estimated-vs-GT trajectory plot (plot_utils analog)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    num_frames = params["cam_unnorm_rots"].shape[-1]
    est = []
    for t in range(num_frames):
        w2c = np.asarray(pose_to_w2c(*get_pose(params, t)))
        est.append(np.linalg.inv(w2c)[:3, 3])
    est = np.stack(est)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(est[:, 0], est[:, 2], "b-", label="estimated")
    if gt_w2c_all is not None:
        gt = np.stack([np.linalg.inv(p)[:3, 3] for p in gt_w2c_all])
        ax.plot(gt[:, 0], gt[:, 2], "g--", label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.legend()
    ax.set_aspect("equal")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def interactive_recon(params: Dict, active, intrinsics, first_w2c, viz_cfg: Dict):
    """Open3D interactive reconstruction (`viz_scripts/final_recon.py`);
    requires open3d + a display."""
    try:
        import open3d as o3d
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "open3d is not installed; use render_trajectory for headless viz"
        ) from e

    w, h = viz_cfg.get("viz_w", 600), viz_cfg.get("viz_h", 340)
    cam = setup_camera(w, h, intrinsics, first_w2c)
    out = render_for_loss(
        params, active,
        params["cam_unnorm_rots"][0, :, 0], params["cam_trans"][0, :, 0],
        cam, RasterConfig(), gaussians_grad=False, camera_grad=False,
    )[0]
    pts, cols = rgbd2pcd(
        np.asarray(out.color[:3]), np.asarray(out.color[3:4]),
        np.asarray(first_w2c), np.asarray(intrinsics),
    )
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(pts)
    pcd.colors = o3d.utility.Vector3dVector(cols)
    o3d.visualization.draw_geometries([pcd])  # pragma: no cover
