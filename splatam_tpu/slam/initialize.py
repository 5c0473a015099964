"""First-frame initialization and point-cloud back-projection.

Parity: `get_pointcloud` / `initialize_first_timestep`
(`scripts/splatam.py:73-217`).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from splatam_tpu.core.params import Params, Variables, initialize_params
from splatam_tpu.render.camera import Camera, setup_camera


def get_pointcloud(
    color: np.ndarray,  # (3, H, W) in [0, 1]
    depth: np.ndarray,  # (1, H, W)
    intrinsics: np.ndarray,  # (3, 3)
    w2c: np.ndarray,  # (4, 4)
    mask: np.ndarray | None = None,  # (H*W,) bool
    compute_mean_sq_dist: bool = False,
    mean_sq_dist_method: str = "projective",
):
    """Back-project every pixel to a world-frame point cloud (+ colors).

    mean_sq_dist_method (`scripts/splatam.py:102-112`):
      "projective": scale = (z / f)^2
      "knn": mean squared distance to the 3 nearest neighbors
    """
    h, w = color.shape[1], color.shape[2]
    cx, cy = intrinsics[0][2], intrinsics[1][2]
    fx, fy = intrinsics[0][0], intrinsics[1][1]

    xg, yg = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    xx = ((xg - cx) / fx).reshape(-1)
    yy = ((yg - cy) / fy).reshape(-1)
    z = depth[0].reshape(-1).astype(np.float32)

    pts_cam = np.stack([xx * z, yy * z, z], axis=-1)
    c2w = np.linalg.inv(w2c)
    pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]

    cols = color.reshape(3, -1).T
    point_cld = np.concatenate([pts, cols], axis=-1).astype(np.float32)

    mean3_sq_dist = None
    if compute_mean_sq_dist and mean_sq_dist_method == "projective":
        scale_gaussian = z / ((fx + fy) / 2)
        mean3_sq_dist = (scale_gaussian**2).astype(np.float32)

    if mask is not None:
        point_cld = point_cld[mask]
        if mean3_sq_dist is not None:
            mean3_sq_dist = mean3_sq_dist[mask]
    if compute_mean_sq_dist:
        if mean_sq_dist_method == "knn":
            import jax.numpy as jnp

            from splatam_tpu.utils.neighbors import mean_squared_knn_distance

            mean3_sq_dist = np.asarray(
                mean_squared_knn_distance(jnp.asarray(point_cld[:, :3]))
            )
        elif mean_sq_dist_method != "projective":
            raise ValueError(f"Unknown mean_sq_dist_method {mean_sq_dist_method}")
        return point_cld, mean3_sq_dist
    return point_cld


def initialize_first_timestep(
    color: np.ndarray,  # (H, W, 3) in [0, 255]
    depth: np.ndarray,  # (H, W, 1)
    intrinsics: np.ndarray,  # (3, 3) or (4, 4)
    pose: np.ndarray,  # (4, 4) c2w
    num_frames: int,
    scene_radius_depth_ratio: float,
    gaussian_distribution: str = "isotropic",
    mean_sq_dist_method: str = "projective",
) -> Tuple[Params, Variables, np.ndarray, np.ndarray, Camera, float]:
    """Build the initial Gaussian map from frame 0.

    Returns (params, variables, intrinsics3x3, first_w2c, camera, scene_radius).
    """
    color_chw = np.transpose(color, (2, 0, 1)).astype(np.float32) / 255.0
    depth_chw = np.transpose(depth, (2, 0, 1)).astype(np.float32)
    k = np.asarray(intrinsics, dtype=np.float64)[:3, :3]
    w2c = np.linalg.inv(np.asarray(pose, dtype=np.float64))

    cam = setup_camera(color_chw.shape[2], color_chw.shape[1], k, w2c)

    mask = (depth_chw[0].reshape(-1) > 0)
    init_pt_cld, mean3_sq_dist = get_pointcloud(
        color_chw, depth_chw, k, w2c, mask=mask, compute_mean_sq_dist=True,
        mean_sq_dist_method=mean_sq_dist_method,
    )
    params, variables = initialize_params(
        init_pt_cld, num_frames, mean3_sq_dist, gaussian_distribution
    )
    scene_radius = float(depth_chw.max() / scene_radius_depth_ratio)
    return params, variables, k, w2c, cam, scene_radius
