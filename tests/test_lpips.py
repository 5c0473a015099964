"""Golden-activation test for the LPIPS port: the JAX forward + the torch
state-dict converter must reproduce an INDEPENDENT torch implementation of
the lpips-alex architecture on random weights (pretrained weights are not
available in the zero-egress build env, so architecture + conversion are
what can be pinned)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from splatam_tpu.eval.lpips import convert_torch_lpips, load_lpips

# AlexNet feature convs: (out, in, k, stride, pad), original feature indices
_CONVS = [
    (64, 3, 11, 4, 2, 0),
    (192, 64, 5, 1, 2, 3),
    (384, 192, 3, 1, 1, 6),
    (256, 384, 3, 1, 1, 8),
    (256, 256, 3, 1, 1, 10),
]
_SLICE_OF = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}


def _make_state(rng):
    state = {}
    for (o, i, k, _, _, idx) in _CONVS:
        state[f"net.slice{_SLICE_OF[idx]}.{idx}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (o, i, k, k)).astype(np.float32)
        )
        state[f"net.slice{_SLICE_OF[idx]}.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.05, (o,)).astype(np.float32)
        )
    for li, (o, *_rest) in enumerate(_CONVS):
        state[f"lin{li}.model.1.weight"] = torch.tensor(
            np.abs(rng.normal(0, 0.05, (1, o, 1, 1))).astype(np.float32)
        )
    return state


def _torch_lpips(state, img1, img2):
    """Independent torch forward of lpips-alex (normalize=True semantics)."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = 2.0 * x - 1.0
        x = (x - shift) / scale
        outs = []
        for ci, (o, i, k, s, p, idx) in enumerate(_CONVS):
            w = state[f"net.slice{_SLICE_OF[idx]}.{idx}.weight"]
            b = state[f"net.slice{_SLICE_OF[idx]}.{idx}.bias"]
            x = F.conv2d(x, w, b, stride=s, padding=p)
            x = F.relu(x)
            outs.append(x)
            if ci in (0, 1):
                x = F.max_pool2d(x, 3, stride=2)
        return outs

    f1, f2 = feats(img1), feats(img2)
    total = 0.0
    for li, (a, b) in enumerate(zip(f1, f2)):
        a = a / torch.sqrt((a**2).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b**2).sum(1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        lin = state[f"lin{li}.model.1.weight"]
        total = total + F.conv2d(d, lin).mean()
    return float(total)


def test_lpips_matches_independent_torch_forward(tmp_path):
    rng = np.random.default_rng(0)
    state = _make_state(rng)
    out = str(tmp_path / "lpips.npz")
    convert_torch_lpips(state, out)

    fn = load_lpips(out)
    assert fn is not None

    img1 = rng.uniform(0, 1, (3, 64, 96)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.1, img1.shape), 0, 1).astype(
        np.float32
    )
    got = float(fn(jnp.asarray(img1), jnp.asarray(img2)))
    want = _torch_lpips(
        state, torch.tensor(img1[None]), torch.tensor(img2[None])
    )
    assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (got, want)
    assert got > 0
    same = float(fn(jnp.asarray(img1), jnp.asarray(img1)))
    assert abs(same) < 1e-8


def test_convert_rejects_incomplete_state(tmp_path):
    state = _make_state(np.random.default_rng(1))
    state.pop("lin3.model.1.weight")
    with pytest.raises(ValueError, match="missing expected"):
        convert_torch_lpips(state, str(tmp_path / "x.npz"))


def test_convert_accepts_torchmetrics_prefix(tmp_path):
    """torchmetrics wraps the lpips module under one more `net.` prefix."""
    state = {f"net.{k}": v for k, v in _make_state(np.random.default_rng(2)).items()}
    # lin heads in torchmetrics live at net.lin{i}.model.1.weight
    convert_torch_lpips(state, str(tmp_path / "y.npz"))
    assert load_lpips(str(tmp_path / "y.npz")) is not None
