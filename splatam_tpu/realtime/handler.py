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
from splatam_tpu.fisher import (
    fisher_gains_batch,
    fisher_h_train,
    render_fisher,
    render_gains,
    sized_fisher_config,
)
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import Camera


def _w2c_rt(w2c: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """w2c 4x4 -> (quaternion wxyz, translation), on the HOST.

    An eager jnp matrix_to_quaternion costs one ~35 ms tunneled dispatch per
    op on the remote chip; scipy is free and any unit quaternion sign is
    equivalent downstream.
    """
    from scipy.spatial.transform import Rotation

    q_xyzw = Rotation.from_matrix(np.asarray(w2c[:3, :3], np.float64)).as_quat()
    rot = np.roll(q_xyzw, 1).astype(np.float32)  # -> (w, x, y, z)
    return rot, np.asarray(w2c[:3, 3], np.float32)


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
        self._h_train_inv_dev = None  # same, device-resident for the EIG dot
        self.rng = rng or np.random.default_rng(0)
        self._render = jax.jit(
            lambda p, a, r, t: render_for_loss(
                p, a, r, t, self.cam, self.raster_cfg,
                gaussians_grad=False, camera_grad=False,
            )[0]
        )
        # Fisher-path programs are built LAZILY at snug sized capacities
        # (sized_fisher_config probe): the safe max_instances-derived shapes
        # cost ~2x device time per pose, and an EAGER render_fisher
        # dispatches every op through the ~35 ms axon tunnel (measured
        # ~1.3 s/pose eager vs 0.37 s jitted-safe vs sized numbers in
        # PROFILE.md — tools/fisher_bench.py). Programs re-build when the
        # gaussian capacity changes or a pose overflows the margin.
        self._margin = 1.6
        self._size_key = None
        self._sized_cfg: Optional[RasterConfig] = None
        self._fisher = None
        self._gains_sil = None
        self._gains_eig = None
        self._htrain = None

    # -- sized program cache -------------------------------------------------
    def _ensure_sized(self, params: Dict, active, rot, tran) -> None:
        key = (int(params["means3D"].shape[0]), self._margin)
        if self._size_key == key:
            return
        cfg = sized_fisher_config(
            params, active, jnp.asarray(rot), jnp.asarray(tran),
            self.cam, self.raster_cfg, margin=self._margin,
        )
        self._sized_cfg = cfg
        self._size_key = key
        seed = self.cfg.fisher_seed
        self._fisher = jax.jit(
            lambda p, a, r, t: render_fisher(
                p, a, r, t, self.cam, cfg, seed_value=seed,
                with_overflow=True,
            )
        )
        self._gains_sil = jax.jit(
            lambda p, a, r, t: render_gains(
                p, a, r, t, self.cam, cfg, None, seed
            )
        )
        self._gains_eig = jax.jit(
            lambda p, a, r, t, hinv: render_gains(
                p, a, r, t, self.cam, cfg, hinv, seed
            )
        )
        self._gains_batch_sil = jax.jit(
            lambda p, a, r, t, w: fisher_gains_batch(
                p, a, r, t, w, self.cam, cfg, None, seed
            )
        )
        self._gains_batch_eig = jax.jit(
            lambda p, a, r, t, w, hinv: fisher_gains_batch(
                p, a, r, t, w, self.cam, cfg, hinv, seed
            )
        )
        self._htrain = jax.jit(
            lambda p, a, r, t, w: fisher_h_train(
                p, a, r, t, w, self.cam, cfg, seed_value=seed
            )
        )

    def _grow(self) -> None:
        """A pose overflowed the sized margin: double it and re-jit."""
        self._margin *= 2.0
        self._size_key = None

    @staticmethod
    def _gauss(params: Dict) -> Dict:
        return {k: v for k, v in params.items() if not k.startswith("cam_")}

    # -- rendering ---------------------------------------------------------
    def get_renders(self, params: Dict, active, w2c: np.ndarray):
        """(rgb, depth, silhouette) at a candidate pose
        (`ros_handler.py:955-985`)."""
        rot, tran = _w2c_rt(np.asarray(w2c))
        out = self._render(
            self._gauss(params), active, jnp.asarray(rot), jnp.asarray(tran)
        )
        return out.color[:3], out.color[3:4], out.color[4]

    # -- Fisher bookkeeping --------------------------------------------------
    def compute_hessian(self, params: Dict, active, w2c: np.ndarray) -> np.ndarray:
        """(N, 4) diagonal Fisher at a pose (`ros_handler.py:839-902`)."""
        rot, tran = _w2c_rt(np.asarray(w2c))
        gauss = self._gauss(params)
        for _ in range(4):
            self._ensure_sized(gauss, active, rot, tran)
            h, over = self._fisher(
                gauss, active, jnp.asarray(rot), jnp.asarray(tran)
            )
            h = np.asarray(h)
            if not bool(over):
                return h
            self._grow()
        return h

    def add_visited_pose(self, c2w: np.ndarray) -> None:
        self.visited_poses.append(np.asarray(c2w))

    def recompute_h_train_inv(self, params: Dict, active) -> None:
        """H_train_inv over Monte-Carlo-subsampled visited poses
        (`ros_handler.py:807-829`).

        One device-side scan over a power-of-two-padded pose batch: the
        round-3 host loop paid a dispatch + fetch per pose (~35 ms tunnel
        each, 3.8 s per 40-pose rebuild); padded tiers keep recompiles
        O(log poses) while the steady state (>= monte_carlo poses) is a
        single fixed-shape program.
        """
        if not self.visited_poses:
            return
        poses = self.visited_poses
        mc = self.cfg.monte_carlo
        if mc is not None and len(poses) > mc:
            idx = self.rng.choice(len(poses), mc, replace=False)
            poses = [poses[i] for i in idx]
        pad = 1
        while pad < len(poses):
            pad *= 2
        if mc is not None:
            pad = min(pad, mc)
        rots = np.zeros((pad, 4), np.float32)
        rots[:, 0] = 1.0
        trans = np.zeros((pad, 3), np.float32)
        wgt = np.zeros((pad,), np.float32)
        for i, c2w in enumerate(poses):
            rots[i], trans[i] = _w2c_rt(np.linalg.inv(c2w))
            wgt[i] = 1.0
        gauss = self._gauss(params)
        for _ in range(4):
            self._ensure_sized(gauss, active, rots[0], trans[0])
            h_train, over = self._htrain(
                gauss, active, jnp.asarray(rots), jnp.asarray(trans),
                jnp.asarray(wgt),
            )
            if not bool(over):
                break
            self._grow()
        self._h_train_inv_dev = 1.0 / (h_train + self.cfg.h_train_eps)
        self.h_train_inv = np.asarray(self._h_train_inv_dev)

    def compute_eig_score(self, params: Dict, active, w2c: np.ndarray) -> float:
        if self.h_train_inv is None:
            return 0.0
        h = self.compute_hessian(params, active, w2c)
        n = min(h.shape[0], self.h_train_inv.shape[0])
        return float(np.sum(h[:n] * self.h_train_inv[:n]))

    # -- gains ---------------------------------------------------------------
    def _gains_one(self, gauss: Dict, active, w2c: np.ndarray, use_eig: bool):
        """(g_sil_raw, g_eig_raw) for one candidate — ONE fused program
        (shared binning; three scalars fetched, not images)."""
        rot, tran = _w2c_rt(w2c)
        for _ in range(4):
            self._ensure_sized(gauss, active, rot, tran)
            if use_eig:
                g_sil, g_eig, over = self._gains_eig(
                    gauss, active, jnp.asarray(rot), jnp.asarray(tran),
                    self._h_train_inv_dev,
                )
            else:
                g_sil, g_eig, over = self._gains_sil(
                    gauss, active, jnp.asarray(rot), jnp.asarray(tran)
                )
            out = np.asarray(jnp.stack([g_sil, g_eig]))
            if not bool(over):
                return float(out[0]), float(out[1])
            self._grow()
        return float(out[0]), float(out[1])

    def compute_gains(
        self,
        params: Dict,
        active,
        candidate_pose_vecs: Sequence[np.ndarray],
    ) -> List[Dict[str, float]]:
        """Score candidate planner poses ([tx ty tz qx qy qz qw] each);
        `send_gains` parity (`ros_handler.py:251-359`).

        The whole PoseArray is scored by ONE device program
        (fisher_gains_batch, padded to power-of-two tiers so recompiles are
        O(log candidates)): the per-candidate host loop paid the ~35 ms
        tunnel dispatch chain per pose (132.6 ms/candidate, PROFILE.md r4)
        — the same fix as the H_train padded-batch scan above.
        """
        cfg = self.cfg
        if not candidate_pose_vecs:
            return []
        gauss = self._gauss(params)
        use_eig = cfg.k_eig != 0 and self._h_train_inv_dev is not None
        n = len(candidate_pose_vecs)
        pad = 1
        while pad < n:
            pad *= 2
        rots = np.zeros((pad, 4), np.float32)
        rots[:, 0] = 1.0
        trans = np.zeros((pad, 3), np.float32)
        wgt = np.zeros((pad,), np.float32)
        for i, vec in enumerate(candidate_pose_vecs):
            pose_mat = pose_matrix_from_quaternion(np.asarray(vec))
            if self.initial_pose is not None:
                pose_mat = relative_transformation(self.initial_pose, pose_mat)
            rots[i], trans[i] = _w2c_rt(np.linalg.inv(pose_mat))
            wgt[i] = 1.0
        for _ in range(4):
            self._ensure_sized(gauss, active, rots[0], trans[0])
            if use_eig:
                sils, eigs, over = self._gains_batch_eig(
                    gauss, active, jnp.asarray(rots), jnp.asarray(trans),
                    jnp.asarray(wgt), self._h_train_inv_dev,
                )
            else:
                sils, eigs, over = self._gains_batch_sil(
                    gauss, active, jnp.asarray(rots), jnp.asarray(trans),
                    jnp.asarray(wgt),
                )
            out = np.asarray(jnp.concatenate([sils, eigs]))
            if not bool(over):
                break
            self._grow()
        sils_h, eigs_h = out[:pad], out[pad:]
        results = []
        for i in range(n):
            g_sil = float(sils_h[i]) * cfg.k_sil
            g_eig = float(eigs_h[i]) * cfg.k_eig
            if cfg.nl_sil:
                g_sil = _nonlinear(g_sil)
            if cfg.nl_eig:
                g_eig = _nonlinear(g_eig)
            results.append(
                {"sil": g_sil, "eig": g_eig, "gain": cfg.k_sum * (g_eig + g_sil)}
            )
        return results
