"""Golden-data frame-stream dump / replay.

Parity with the reference's DUMP_DATA/LOAD_DATA hooks
(`scripts/splatam.py:40-41,540-551`, `utils/plot_utils.py:284-307`
`dump_realtime_dataset`): serialize a frame stream to per-frame npz so a
live/realtime run can be replayed deterministically offline — the closest
thing the reference has to a test fixture, kept as the interchange here.
"""
from __future__ import annotations

import glob
import os
from typing import Tuple

import numpy as np


def dump_dataset(dataset, out_dir: str) -> None:
    """Write every frame as frame_{i:06d}.npz (color/depth/intrinsics/gt_pose)."""
    os.makedirs(out_dir, exist_ok=True)
    for i in range(len(dataset)):
        color, depth, intrinsics, pose = dataset[i]
        np.savez(
            os.path.join(out_dir, f"frame_{i:06d}.npz"),
            color=np.asarray(color),
            depth=np.asarray(depth),
            intrinsics=np.asarray(intrinsics),
            gt_pose=np.asarray(pose),
        )


class DumpedDataset:
    """Replays a dumped frame stream with the dataset protocol."""

    def __init__(self, dump_dir: str):
        self.paths = sorted(glob.glob(os.path.join(dump_dir, "frame_*.npz")))
        if not self.paths:
            raise FileNotFoundError(f"no frame_*.npz under {dump_dir}")

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, ...]:
        d = np.load(self.paths[idx])
        return d["color"], d["depth"], d["intrinsics"], d["gt_pose"]
