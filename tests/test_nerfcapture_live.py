"""Live NeRFCapture path with a mocked DDS reader (VERDICT r2 item 6).

The cyclonedds dependency is import-gated to make_reader(); everything else
— sample decode, the capture loop, and the online DDSFrameSource — runs
against any object with `read_next()`. These tests fabricate samples with
the exact SplatCaptureFrame field layout (`scripts/nerfcapture2dataset.py:
42-60`), drive frame reception -> dataset -> SLAM steps end-to-end.
"""
import json
import os
from dataclasses import dataclass, field

import numpy as np
import pytest

from splatam_tpu.tools.nerfcapture2dataset import (
    dataset_capture_loop,
    decode_frame,
)


@dataclass
class FakeSample:
    """Field-for-field mirror of the reference's SplatCaptureFrame IDL."""

    id: int
    timestamp: float
    fl_x: float
    fl_y: float
    cx: float
    cy: float
    transform_matrix: list
    width: int
    height: int
    image: bytes
    has_depth: bool
    depth_width: int = 0
    depth_height: int = 0
    depth_scale: float = 10.0
    depth_image: bytes = b""


class FakeReader:
    """read_next() protocol of the cyclonedds DataReader, with dropouts."""

    def __init__(self, samples, dropout_every=3):
        self.samples = list(samples)
        self.calls = 0
        self.dropout_every = dropout_every

    def read_next(self):
        self.calls += 1
        if self.dropout_every and self.calls % self.dropout_every == 0:
            return None  # no sample pending — the loop must retry
        return self.samples.pop(0) if self.samples else None


def _make_sample(i, w=32, h=24, dw=16, dh=12, rng=None):
    rng = rng or np.random.default_rng(i)
    rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    depth = rng.uniform(0.5, 3.0, (dh, dw)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.01 * i, 0.0, 0.002 * i]
    return FakeSample(
        id=i, timestamp=float(i) * 0.033,
        fl_x=30.0, fl_y=30.0, cx=w / 2, cy=h / 2,
        # column-major flat, as ARKit publishes (decode transposes)
        transform_matrix=pose.T.reshape(-1).tolist(),
        width=w, height=h,
        image=rgb.tobytes(),
        has_depth=True, depth_width=dw, depth_height=dh,
        depth_image=depth.tobytes(),
    ), rgb, depth, pose


def test_decode_frame_roundtrip():
    sample, rgb, depth, pose = _make_sample(0)
    out_rgb, out_depth, x_wv = decode_frame(sample)
    np.testing.assert_array_equal(out_rgb, rgb)
    np.testing.assert_allclose(x_wv, pose, atol=1e-7)
    # depth comes back nearest-resized to the RGB resolution
    assert out_depth.shape == (24, 32)
    assert set(np.unique(out_depth)) <= set(np.unique(depth))


def test_capture_loop_writes_dataset_and_slam_consumes_it(tmp_path):
    samples = [_make_sample(i)[0] for i in range(4)]
    reader = FakeReader(samples, dropout_every=3)
    save = str(tmp_path / "seq")
    n = dataset_capture_loop(reader, save, 4, depth_scale=10.0,
                             progress=False)
    assert n == 4
    meta = json.load(open(os.path.join(save, "transforms.json")))
    assert meta["w"] == 32 and meta["h"] == 24
    assert len(meta["frames"]) == 4
    assert meta["frames"][0]["depth_path"] == "depth/0.png"
    assert abs(meta["integer_depth_scale"] - 10.0 / 65535.0) < 1e-9

    # frame reception -> dataset -> SLAM steps (replay demo path)
    from splatam_tpu.tools.iphone_demo import demo_config
    from splatam_tpu.data.datasets import NeRFCaptureDataset
    from splatam_tpu.realtime import GainConfig, ReplaySource, realtime_slam

    ds = NeRFCaptureDataset(str(tmp_path), "seq", desired_height=24,
                            desired_width=32)
    assert len(ds) == 4
    cfg = demo_config(num_iters=1)
    cfg["raster"] = {"max_instances": 2**14, "max_per_tile": 256,
                     "chunk": 128}
    state, _ = realtime_slam(cfg, ReplaySource(ds), GainConfig(),
                             progress=False)
    assert state.params is not None


def test_dds_frame_source_feeds_realtime_slam():
    from splatam_tpu.realtime import GainConfig, realtime_slam
    from splatam_tpu.tools.iphone_demo import DDSFrameSource, demo_config

    samples = [_make_sample(i)[0] for i in range(3)]
    reader = FakeReader(samples, dropout_every=4)
    source = DDSFrameSource(reader, num_frames=3, height=24, width=32)
    cfg = demo_config(num_iters=1)
    cfg["raster"] = {"max_instances": 2**14, "max_per_tile": 256,
                     "chunk": 128}
    state, _ = realtime_slam(cfg, source, GainConfig(), progress=False)
    assert source.finished() and source.count == 3
    # first pose is the identity after relative normalization
    assert state.params is not None
