"""Native C++ frame decoder: bit-parity with the python (cv2) path."""
import numpy as np
import pytest

from splatam_tpu.native import native_available
from tests.test_datasets import _camera_params, replica_dir  # noqa: F401


@pytest.mark.skipif(not native_available(), reason="no native loader")
def test_native_matches_python_decode(replica_dir, monkeypatch):  # noqa: F811
    from splatam_tpu.data import ReplicaDataset

    cfg = {"dataset_name": "replica", "camera_params": _camera_params(64, 48, 6553.5)}
    ds = ReplicaDataset(cfg, str(replica_dir), "room0",
                        desired_height=24, desired_width=32)
    # native path (auto-selected when available)
    assert ds._load_native(0) is not None
    c_n, d_n, k_n, p_n = ds[1]

    # force the python path
    monkeypatch.setattr(ds, "_load_native", lambda i: None)
    c_p, d_p, k_p, p_p = ds[1]

    np.testing.assert_array_equal(c_n, c_p)
    np.testing.assert_array_equal(d_n, d_p)
    np.testing.assert_array_equal(k_n, k_p)


@pytest.mark.skipif(not native_available(), reason="no native loader")
def test_native_decoder_direct(tmp_path):
    import cv2

    from splatam_tpu.native import NativeFrameDecoder

    dec = NativeFrameDecoder()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    dep = rng.integers(100, 60000, (48, 64), dtype=np.uint16)
    jp = str(tmp_path / "a.jpg")
    pp = str(tmp_path / "d.png")
    cp = str(tmp_path / "c.png")
    cv2.imwrite(jp, img[..., ::-1])
    cv2.imwrite(pp, dep)
    cv2.imwrite(cp, img[..., ::-1])

    ref = cv2.resize(
        cv2.imread(jp)[..., ::-1].astype(np.float32), (32, 24),
        interpolation=cv2.INTER_LINEAR,
    )
    np.testing.assert_array_equal(dec.jpeg_rgb(jp, 24, 32), ref)

    refd = cv2.resize(dep.astype(np.float32), (32, 24),
                      interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(dec.png(pp, 24, 32, 1, nearest=True)[..., 0], refd)

    refc = cv2.resize(cv2.imread(cp)[..., ::-1].astype(np.float32), (32, 24),
                      interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(dec.png(cp, 24, 32, 3, nearest=False), refc)
    assert dec.png_channels(pp) == 1 and dec.png_channels(cp) == 3
