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


def _render_view(params, active, w2c, k, w, h, raster_cfg, render_mode,
                 show_sil=False):
    """Render the map from an arbitrary viewer camera; returns (pts, cols)
    for the point-cloud display (`final_recon.py:106-170` render+rgbd2pcd)."""
    import jax.numpy as jnp

    from splatam_tpu.core.transforms import matrix_to_quaternion

    if render_mode == "centers":
        pts = np.asarray(params["means3D"])
        cols = np.asarray(params["rgb_colors"])
        keep = np.asarray(active).astype(bool)
        return pts[keep], np.clip(cols[keep], 0, 1)
    cam = setup_camera(w, h, k, np.eye(4))
    w2c_j = jnp.asarray(w2c, dtype=jnp.float32)
    rot = matrix_to_quaternion(w2c_j[:3, :3])
    tran = w2c_j[:3, 3]
    gauss = {kk: v for kk, v in params.items() if not kk.startswith("cam_")}
    out = render_for_loss(
        gauss, active, rot, tran, cam, raster_cfg,
        gaussians_grad=False, camera_grad=False,
    )[0]
    color = np.clip(np.asarray(out.color[:3]), 0, 1)
    depth = np.asarray(out.color[3:4])
    if show_sil:
        sil = np.clip(np.asarray(out.color[4]), 0, 1)
        color = np.repeat((1.0 - sil)[None], 3, axis=0)
    return rgbd2pcd(color, depth, np.asarray(w2c), np.asarray(k))


def interactive_recon(params: Dict, active, intrinsics, first_w2c,
                      viz_cfg: Dict, raster_cfg: RasterConfig = RasterConfig()):
    """Open3D interactive reconstruction (`viz_scripts/final_recon.py:
    172-301`): estimated camera frustums + trajectory linesets, and a
    view-control loop that re-renders the splats from the CURRENT viewer
    camera every frame (so the display is a true re-raster, not a static
    point cloud). Requires open3d + a display; all geometry comes from the
    pure-numpy builders in viz/geometry.py (tested headless)."""
    try:
        import open3d as o3d
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "open3d is not installed; use render_trajectory for headless viz"
        ) from e

    from splatam_tpu.viz.geometry import scene_geometry

    w, h = viz_cfg.get("viz_w", 600), viz_cfg.get("viz_h", 340)
    view_scale = float(viz_cfg.get("view_scale", 2.0))
    render_mode = viz_cfg.get("render_mode", "color")
    show_sil = bool(viz_cfg.get("show_sil", False))
    k = np.asarray(intrinsics, dtype=np.float64)[:3, :3].copy()

    vis = o3d.visualization.Visualizer()  # pragma: no cover - needs display
    vis.create_window(
        width=int(w * view_scale), height=int(h * view_scale), visible=True
    )
    pts, cols = _render_view(
        params, active, np.asarray(first_w2c), k, w, h, raster_cfg,
        render_mode, show_sil,
    )
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(pts)
    pcd.colors = o3d.utility.Vector3dVector(cols)
    vis.add_geometry(pcd)

    if viz_cfg.get("visualize_cams", True):
        geo = scene_geometry(params, w, h, k)
        for f in geo["frustums"]:
            ls = o3d.geometry.LineSet()
            ls.points = o3d.utility.Vector3dVector(f["points"])
            ls.lines = o3d.utility.Vector2iVector(f["lines"])
            ls.paint_uniform_color(f["color"])
            vis.add_geometry(ls)
        traj = geo["trajectory"]
        ls = o3d.geometry.LineSet()
        ls.points = o3d.utility.Vector3dVector(traj["points"])
        ls.lines = o3d.utility.Vector2iVector(traj["lines"])
        ls.colors = o3d.utility.Vector3dVector(traj["colors"])
        vis.add_geometry(ls)

    # view control seeded from the first camera (`final_recon.py:226-244`)
    view_k = k * view_scale
    view_k[2, 2] = 1.0
    view_control = vis.get_view_control()
    cparams = o3d.camera.PinholeCameraParameters()
    view_w2c = np.asarray(first_w2c, dtype=np.float64).copy()
    if viz_cfg.get("offset_first_viz_cam", True):
        view_w2c[:3, 3] += np.array([0.0, 0.0, 0.5])
    cparams.extrinsic = view_w2c
    cparams.intrinsic.intrinsic_matrix = view_k
    cparams.intrinsic.height = int(h * view_scale)
    cparams.intrinsic.width = int(w * view_scale)
    view_control.convert_from_pinhole_camera_parameters(
        cparams, allow_arbitrary=True
    )
    opts = vis.get_render_option()
    opts.point_size = view_scale
    opts.light_on = False

    # interactive loop: re-render from the live viewer camera each frame
    while True:  # pragma: no cover - needs display
        cam_params = view_control.convert_to_pinhole_camera_parameters()
        cur_k = np.asarray(cam_params.intrinsic.intrinsic_matrix) / view_scale
        cur_k[2, 2] = 1.0
        cur_w2c = np.asarray(cam_params.extrinsic)
        pts, cols = _render_view(
            params, active, cur_w2c, cur_k, w, h, raster_cfg, render_mode,
            show_sil,
        )
        pcd.points = o3d.utility.Vector3dVector(pts)
        pcd.colors = o3d.utility.Vector3dVector(cols)
        vis.update_geometry(pcd)
        if not vis.poll_events():
            break
        vis.update_renderer()
    vis.destroy_window()


def interactive_online_recon(
    params: Dict, active, timestep, intrinsics, first_w2c, viz_cfg: Dict,
    keyframe_time_indices=None,
    raster_cfg: RasterConfig = RasterConfig(),
):  # pragma: no cover - needs open3d + a display
    """Open3D ONLINE reconstruction replay (`viz_scripts/online_recon.py`):
    steps through the keyframe timeline, each step re-rendering the map
    with only the Gaussians that existed by then (timestep <= t), moving
    the current-camera frustum and growing the trajectory lineset — the
    headless PNG analog is `online_replay`. Ends in the final_recon-style
    free-view loop."""
    try:
        import open3d as o3d
    except ImportError as e:
        raise ImportError(
            "open3d is not installed; use online_replay for headless viz"
        ) from e

    import jax.numpy as jnp

    from splatam_tpu.viz.geometry import (
        camera_frustum_lines,
        estimated_w2cs,
        frustum_colors,
        trajectory_colors,
        trajectory_lineset,
    )

    w, h = viz_cfg.get("viz_w", 600), viz_cfg.get("viz_h", 340)
    view_scale = float(viz_cfg.get("view_scale", 2.0))
    k = np.asarray(intrinsics, dtype=np.float64)[:3, :3].copy()
    num_frames = params["cam_unnorm_rots"].shape[-1]
    if keyframe_time_indices is None:
        keyframe_time_indices = list(range(num_frames))
    w2cs = estimated_w2cs(params, num_frames)
    fcols = frustum_colors(num_frames)

    vis = o3d.visualization.Visualizer()
    vis.create_window(
        width=int(w * view_scale), height=int(h * view_scale), visible=True
    )
    pcd = o3d.geometry.PointCloud()
    vis.add_geometry(pcd)
    active = jnp.asarray(active)
    timestep_j = jnp.asarray(timestep)
    prev_frustum = None
    prev_lines = None
    centers = []
    for t in keyframe_time_indices:
        t = int(t)
        born = active & (timestep_j <= t)
        pts, cols = _render_view(
            params, born, w2cs[t], k, w, h, raster_cfg,
            viz_cfg.get("render_mode", "color"),
            bool(viz_cfg.get("show_sil", False)),
        )
        pcd.points = o3d.utility.Vector3dVector(pts)
        pcd.colors = o3d.utility.Vector3dVector(cols)
        vis.update_geometry(pcd)
        # move the current-pose frustum (`online_recon.py:250-255`)
        if prev_frustum is not None:
            vis.remove_geometry(prev_frustum)
        fpts, flines = camera_frustum_lines(w, h, k, w2cs[t], 0.045)
        frustum = o3d.geometry.LineSet()
        frustum.points = o3d.utility.Vector3dVector(fpts)
        frustum.lines = o3d.utility.Vector2iVector(flines)
        frustum.paint_uniform_color(fcols[t])
        vis.add_geometry(frustum)
        prev_frustum = frustum
        # grow the trajectory polyline
        centers.append(np.linalg.inv(w2cs[t])[:3, 3])
        if len(centers) >= 2:
            if prev_lines is not None:
                vis.remove_geometry(prev_lines)
            tpts, tlines = trajectory_lineset(np.asarray(centers))
            lines = o3d.geometry.LineSet()
            lines.points = o3d.utility.Vector3dVector(tpts)
            lines.lines = o3d.utility.Vector2iVector(tlines)
            lines.colors = o3d.utility.Vector3dVector(
                trajectory_colors(len(tlines))
            )
            vis.add_geometry(lines)
            prev_lines = lines
        if not vis.poll_events():
            vis.destroy_window()
            return
        vis.update_renderer()
    vis.destroy_window()
