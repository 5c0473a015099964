"""Realtime driver + active-view-selection gains on a replayed stream."""
import numpy as np
import pytest

from splatam_tpu.data.synthetic import SyntheticDataset
from splatam_tpu.realtime import (
    GainConfig,
    ReplaySource,
    associate_timestamps,
    realtime_slam,
)


def _config():
    return {
        "scene_radius_depth_ratio": 3.0,
        "gaussian_distribution": "isotropic",
        "seed": 0,
        "keyframe_every": 2,
        "mapping_window_size": 5,
        "data": {"max_frames": 16},
        "raster": {"max_instances": 2**16, "max_per_tile": 512, "chunk": 32,
                   "backend": "jnp"},
        "tracking": {
            "num_iters": 8, "forward_prop": True, "use_gt_poses": False,
            "use_sil_for_loss": True, "sil_thres": 0.99,
            "ignore_outlier_depth_loss": False,
            "loss_weights": {"im": 0.5, "depth": 1.0},
            "lrs": {"cam_unnorm_rots": 2e-3, "cam_trans": 4e-3},
        },
        "mapping": {
            "num_iters": 8, "add_new_gaussians": True, "sil_thres": 0.5,
            "use_sil_for_loss": False, "ignore_outlier_depth_loss": False,
            "loss_weights": {"im": 0.5, "depth": 1.0},
            "prune_gaussians": False, "pruning_dict": {},
            "lrs": {"means3D": 1e-4, "rgb_colors": 2.5e-3,
                    "unnorm_rotations": 1e-3, "logit_opacities": 0.05,
                    "log_scales": 1e-3, "cam_unnorm_rots": 0.0,
                    "cam_trans": 0.0},
        },
    }


def test_realtime_slam_with_gains():
    ds = SyntheticDataset(num_frames=5, width=64, height=48, seed=0)
    # planner asks for gains before frame 3: two candidate poses
    # ([tx ty tz qx qy qz qw]) — one at the current view, one far away
    candidates = [
        np.array([0.0, 0.0, 0.0, 0, 0, 0, 1.0]),
        np.array([0.0, 0.0, -2.5, 0, 0, 0, 1.0]),
    ]
    source = ReplaySource(ds, gain_requests={3: candidates})
    state, handler = realtime_slam(
        _config(), source,
        gain_cfg=GainConfig(k_sil=1.0, k_eig=1.0, k_sum=1.0, monte_carlo=4),
        progress=False,
    )
    assert int(np.asarray(state.variables["active"]).sum()) > 100
    assert len(handler.visited_poses) == 5
    assert handler.h_train_inv is not None and handler.h_train_inv.shape[1] == 4

    assert len(source.published) == 1
    gains = source.published[0]
    assert len(gains) == 2
    for g in gains:
        assert np.isfinite(g["gain"]) and g["sil"] >= 0
    # the far-away pose sees mostly unmapped space -> higher silhouette gain
    assert gains[1]["sil"] > gains[0]["sil"]


def test_associate_timestamps():
    a = np.array([0.0, 0.1, 0.2, 0.35])
    b = np.array([0.01, 0.11, 0.29])
    pairs = associate_timestamps(a, b, max_dt=0.08)
    assert (0, 0) in pairs and (1, 1) in pairs
    assert all(j < len(b) for _, j in pairs)
    # 0.2 matches nothing within 0.08... closest is 0.11 (0.09) or 0.29 (0.09)
    assert not any(i == 2 for i, _ in pairs)
