"""Active-view-selection handler: per-candidate silhouette + Fisher gains.

IO-agnostic core of the reference fork's `RosHandler`
(`scripts/ros_handler.py:32-986`): everything except the ROS pub/sub, which
lives in ros_bridge.py. An external planner proposes candidate poses; this
handler scores each with

  g_sil = #(silhouette < 0.5) / (W*H) * k_sil       (`ros_handler.py:299-311`)
  g_eig = sum(H_pose * H_train_inv) * k_eig          (`ros_handler.py:832-836`)
  g_sum = k_sum * (g_eig + g_sil)                    with optional sigmoid
                                                     squashing of either term

where H_pose is the diagonal Fisher [means3D || opacity] from the power=2
Pallas backward (fisher/), and H_train_inv = 1 / (sum of Hessians over <= 40
Monte-Carlo-sampled visited poses + 0.1) (`ros_handler.py:807-829`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splatam_tpu.core.losses import render_for_loss
from splatam_tpu.core.transforms import matrix_to_quaternion
from splatam_tpu.fisher import render_fisher
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import Camera


def pose_matrix_from_quaternion(pvec: np.ndarray) -> np.ndarray:
    """[tx ty tz qx qy qz qw] -> 4x4 c2w (`ros_handler.py:372-380`)."""
    from scipy.spatial.transform import Rotation

    pose = np.eye(4)
    pose[:3, :3] = Rotation.from_quat(pvec[3:]).as_matrix()
    pose[:3, 3] = pvec[:3]
    return pose


def relative_transformation(t1: np.ndarray, t2: np.ndarray) -> np.ndarray:
    """Pose of t2 in t1's frame (`geometryutils.py:413-`)."""
    return np.linalg.inv(t1) @ t2


def associate_timestamps(
    t_a: np.ndarray, t_b: np.ndarray, max_dt: float = 0.08
) -> List[Tuple[int, int]]:
    """Nearest-timestamp association (`ros_handler.py:362-370`)."""
    pairs = []
    for i, t in enumerate(t_a):
        j = int(np.argmin(np.abs(t_b - t)))
        if abs(t_b[j] - t) < max_dt:
            pairs.append((i, j))
    return pairs


@dataclasses.dataclass
class GainConfig:
    """CLI-flag parity (`splatam_realtime.py:1117-1143`)."""

    k_sil: float = 1.0
    k_eig: float = 0.0
    k_sum: float = 1.0
    nl_sil: bool = False  # sigmoid-squash silhouette gain
    nl_eig: bool = False  # sigmoid-squash EIG gain
    monte_carlo: Optional[int] = 40  # visited-pose subsample for H_train
    fisher_seed: float = 1e-3
    h_train_eps: float = 0.1


def _nonlinear(x: float) -> float:
    return (3400.0 / (1.0 + math.exp(-0.002 * x))) - 1700.0


class ActiveViewHandler:
    """Holds the map reference + visited-pose Fisher state, scores candidates."""

    def __init__(
        self,
        cam: Camera,
        raster_cfg: RasterConfig,
        gain_cfg: GainConfig = GainConfig(),
        initial_pose: Optional[np.ndarray] = None,
        rng: Optional[np.random.Generator] = None,
    ):
        self.cam = cam
        self.raster_cfg = raster_cfg
        self.cfg = gain_cfg
        self.initial_pose = initial_pose  # world frame of the planner
        self.visited_poses: List[np.ndarray] = []  # c2w, SLAM frame
        self.h_train_inv: Optional[np.ndarray] = None
        self.rng = rng or np.random.default_rng(0)
        self._render = jax.jit(
            lambda p, a, r, t: render_for_loss(
                p, a, r, t, self.cam, self.raster_cfg,
                gaussians_grad=False, camera_grad=False,
            )[0]
        )
        # one compiled program per map capacity: an EAGER render_fisher
        # dispatches every op through the ~35 ms axon tunnel (measured
        # ~1.3 s/pose vs ~0.43 s jitted at 200k gaussians, 1200x680 —
        # tools/fisher_bench.py)
        self._fisher = jax.jit(
            lambda p, a, r, t: render_fisher(
                p, a, r, t, self.cam, self.raster_cfg,
                seed_value=self.cfg.fisher_seed,
            )
        )

    # -- rendering ---------------------------------------------------------
    def get_renders(self, params: Dict, active, w2c: np.ndarray):
        """(rgb, depth, silhouette) at a candidate pose
        (`ros_handler.py:955-985`)."""
        w2c = jnp.asarray(w2c, jnp.float32)
        rot = matrix_to_quaternion(w2c[:3, :3])
        gauss = {k: v for k, v in params.items() if not k.startswith("cam_")}
        out = self._render(gauss, active, rot, w2c[:3, 3])
        return out.color[:3], out.color[3:4], out.color[4]

    # -- Fisher bookkeeping --------------------------------------------------
    def _hessian_dev(self, params: Dict, active, w2c: np.ndarray):
        """(N, 4) diagonal Fisher at a pose as a DEVICE array."""
        w2c = jnp.asarray(w2c, jnp.float32)
        rot = matrix_to_quaternion(w2c[:3, :3])
        gauss = {k: v for k, v in params.items() if not k.startswith("cam_")}
        return self._fisher(gauss, active, rot, w2c[:3, 3])

    def compute_hessian(self, params: Dict, active, w2c: np.ndarray) -> np.ndarray:
        """(N, 4) diagonal Fisher at a pose (`ros_handler.py:839-902`)."""
        return np.asarray(self._hessian_dev(params, active, w2c))

    def add_visited_pose(self, c2w: np.ndarray) -> None:
        self.visited_poses.append(np.asarray(c2w))

    def recompute_h_train_inv(self, params: Dict, active) -> None:
        """H_train_inv over Monte-Carlo-subsampled visited poses
        (`ros_handler.py:807-829`)."""
        if not self.visited_poses:
            return
        poses = self.visited_poses
        mc = self.cfg.monte_carlo
        if mc is not None and len(poses) > mc:
            idx = self.rng.choice(len(poses), mc, replace=False)
            poses = [poses[i] for i in idx]
        h_train = None
        for c2w in poses:
            # accumulate ON DEVICE: a per-pose host fetch costs ~35 ms
            # through the tunnel; one fetch at the end instead
            h = self._hessian_dev(params, active, np.linalg.inv(c2w))
            h_train = h if h_train is None else h_train + h
        self.h_train_inv = np.asarray(1.0 / (h_train + self.cfg.h_train_eps))

    def compute_eig_score(self, params: Dict, active, w2c: np.ndarray) -> float:
        if self.h_train_inv is None:
            return 0.0
        h = self.compute_hessian(params, active, w2c)
        n = min(h.shape[0], self.h_train_inv.shape[0])
        return float(np.sum(h[:n] * self.h_train_inv[:n]))

    # -- gains ---------------------------------------------------------------
    def compute_gains(
        self,
        params: Dict,
        active,
        candidate_pose_vecs: Sequence[np.ndarray],
    ) -> List[Dict[str, float]]:
        """Score candidate planner poses ([tx ty tz qx qy qz qw] each);
        `send_gains` parity (`ros_handler.py:251-359`)."""
        cfg = self.cfg
        results = []
        for vec in candidate_pose_vecs:
            pose_mat = pose_matrix_from_quaternion(np.asarray(vec))
            if self.initial_pose is not None:
                pose_mat = relative_transformation(self.initial_pose, pose_mat)
            w2c = np.linalg.inv(pose_mat)
            _, _, sil = self.get_renders(params, active, w2c)
            g_sil = float((np.asarray(sil) < 0.5).sum()) / (
                self.cam.image_width * self.cam.image_height
            )
            g_eig = (
                self.compute_eig_score(params, active, w2c)
                if cfg.k_eig != 0 else 0.0
            )
            g_sil *= cfg.k_sil
            g_eig *= cfg.k_eig
            if cfg.nl_sil:
                g_sil = _nonlinear(g_sil)
            if cfg.nl_eig:
                g_eig = _nonlinear(g_eig)
            results.append(
                {"sil": g_sil, "eig": g_eig, "gain": cfg.k_sum * (g_eig + g_sil)}
            )
        return results
