"""LPIPS (AlexNet backbone) in JAX.

The reference uses `torchmetrics LPIPS(net_type='alex')`
(`utils/eval_helpers.py:20-21`). This module implements the same network —
AlexNet features + learned linear heads + imagenet normalization — natively
in JAX. Pretrained weights cannot be bundled (zero-egress build environment),
so weights load from an `.npz` at ``SPLATAM_TPU_LPIPS_WEIGHTS`` (or an
explicit path); `convert_torch_lpips` converts a torchvision/lpips
checkpoint. Without weights, `lpips_fn()` returns None and the eval runner
reports NaN for LPIPS (documented deviation, SURVEY.md §7 hard-part #6).

Expected npz keys:
  conv0..conv4 kernels 'features.{0,3,6,8,10}.weight' / '.bias' (OIHW),
  lin heads 'lin{0..4}.model.1.weight' (O, I, 1, 1).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_CONV_KEYS = ["features.0", "features.3", "features.6", "features.8", "features.10"]
_STRIDES = [4, 1, 1, 1, 1]
_PADS = [2, 2, 1, 1, 1]
_POOL_AFTER = {0, 1}  # maxpool after convs 0 and 1 (and relu after each)


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def lpips_forward(weights: Dict[str, jnp.ndarray], img1: jax.Array, img2: jax.Array):
    """LPIPS distance between (C, H, W) images in [0, 1]."""

    def norm_input(x):
        x = 2.0 * x - 1.0  # normalize=True convention
        return (x - jnp.asarray(_SHIFT)[:, None, None]) / jnp.asarray(_SCALE)[:, None, None]

    def features(x):
        x = x[None]
        feats = []
        for i, key in enumerate(_CONV_KEYS):
            x = _conv(
                x, weights[f"{key}.weight"], weights[f"{key}.bias"],
                _STRIDES[i], _PADS[i],
            )
            x = jax.nn.relu(x)
            feats.append(x)
            if i in _POOL_AFTER:
                x = _maxpool(x)
        return feats

    f1 = features(norm_input(img1))
    f2 = features(norm_input(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        lin = weights[f"lin{i}.model.1.weight"][:, :, 0, 0]  # (1, C)
        total = total + jnp.mean(
            jnp.einsum("nchw,oc->nohw", diff, lin), axis=(1, 2, 3)
        )
    return total[0]


def load_lpips(path: Optional[str] = None) -> Optional[Callable]:
    """Return a jitted lpips(img1, img2) -> scalar, or None if no weights."""
    path = path or os.environ.get("SPLATAM_TPU_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    raw = dict(np.load(path))
    weights = {k: jnp.asarray(v) for k, v in raw.items()}
    return jax.jit(lambda a, b: lpips_forward(weights, a, b))


def convert_torch_lpips(torch_lpips_state: Dict, out_path: str):
    """Convert a torchmetrics/lpips state_dict into the npz this module reads.

    The lpips package stores the AlexNet convs under `net.sliceK.<idx>` where
    <idx> is the ORIGINAL torchvision features index (0/3/6/8/10) — the
    slice number is packaging, not an index — and the learned heads under
    `lin{i}.model.1.weight` (torchmetrics prefixes everything with one more
    `net.`). Validated against an independent torch forward in
    tests/test_lpips.py.
    """
    import re

    out = {}
    for k, v in torch_lpips_state.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        m = re.search(r"slice\d+\.(\d+)\.(weight|bias)$", k)
        if m:
            out[f"features.{m.group(1)}.{m.group(2)}"] = arr
            continue
        m = re.search(r"(lin\d+\.model\.1\.weight)$", k)
        if m:
            out[m.group(1)] = arr
    expected = {f"{c}.{s}" for c in _CONV_KEYS for s in ("weight", "bias")}
    expected |= {f"lin{i}.model.1.weight" for i in range(5)}
    missing = expected - set(out)
    if missing:
        raise ValueError(f"state dict missing expected LPIPS keys: {missing}")
    np.savez(out_path, **out)
