"""Absolute trajectory error via Horn closed-form alignment.

Parity: `align` / `evaluate_ate` (`utils/eval_helpers.py:23-77`), the
TUM-benchmark Horn method.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def align(model: np.ndarray, data: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Align two trajectories (3, N) with the method of Horn.

    Returns (rot 3x3, trans 3x1, per-point translation error (N,)).
    """
    model_zc = model - model.mean(1, keepdims=True)
    data_zc = data - data.mean(1, keepdims=True)

    W = model_zc @ data_zc.T
    U, _, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(1, keepdims=True) - rot @ model.mean(1, keepdims=True)

    model_aligned = rot @ model + trans
    err = model_aligned - data
    trans_error = np.sqrt(np.sum(err * err, axis=0))
    return rot, trans, trans_error


def evaluate_ate(
    gt_traj: Sequence[np.ndarray], est_traj: Sequence[np.ndarray]
) -> float:
    """Mean translational alignment error between two lists of 4x4 w2c poses.

    (The reference names this RMSE but computes the MEAN of per-point errors,
    `utils/eval_helpers.py:60-77` — we keep its semantics for parity.)
    """
    gt_pts = np.stack([np.asarray(p)[:3, 3] for p in gt_traj]).T
    est_pts = np.stack([np.asarray(p)[:3, 3] for p in est_traj]).T
    _, _, trans_error = align(gt_pts, est_pts)
    return float(trans_error.mean())


def trajectory_from_params(params, first_w2c: np.ndarray, gt_w2c_list: List[np.ndarray]):
    """Build the (gt, est) pose lists the way the reference's eval does
    (`utils/eval_helpers.py:556-577`): frame 0 uses first_w2c; NaN gt poses
    are skipped."""
    from splatam_tpu.core.transforms import pose_to_w2c

    num_frames = params["cam_unnorm_rots"].shape[-1]
    est = [np.asarray(first_w2c)]
    gt = [np.asarray(gt_w2c_list[0])]
    for idx in range(1, min(num_frames, len(gt_w2c_list))):
        if np.isnan(gt_w2c_list[idx]).any():
            continue
        from splatam_tpu.core.params import get_pose

        w2c = np.asarray(pose_to_w2c(*get_pose(params, idx)))
        est.append(w2c)
        gt.append(np.asarray(gt_w2c_list[idx]))
    return gt, est
