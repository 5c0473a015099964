"""On-TPU compiled-kernel parity check (VERDICT round-1 item 8a).

The CPU test suite runs the Pallas kernels in interpret mode only; a Mosaic
miscompile (or a bug in the DMA-ingest path, which interpret mode emulates)
would ship silently. This script renders a small scene on the REAL chip with
the compiled Pallas path and asserts forward images and parameter gradients
allclose against the jnp oracle path running on the same chip.

Runs in seconds (one small compile). Exits nonzero on mismatch.

Usage: python tools/tpu_parity_check.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.default_backend() != "cpu" or os.environ.get(
        "SPLATAM_ALLOW_CPU_PARITY"
    ), "parity check must run on the TPU (got cpu backend)"

    from bench import make_scene
    from splatam_tpu.core.losses import slam_loss
    from splatam_tpu.core.params import GAUSSIAN_KEYS
    from splatam_tpu.render.binning import RasterConfig

    n = 20_000
    w, h = 320, 192
    params, active, cam = make_scene(n, w, h, seed=3)
    rot = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    tran = jnp.zeros(3, jnp.float32)
    gt_im = jnp.zeros((3, h, w), jnp.float32)
    gt_depth = jnp.full((1, h, w), 2.5, jnp.float32)

    def make_cfg(backend):
        # mode string: backend plus -roll / -perm / -scatter / -align /
        # -split tokens (default aligned so the token matrix composes)
        scan, red, align, layout = "mxu", "sort", False, "aligned"
        chunk = 128
        for tok in backend.split("-")[1:]:
            if tok == "roll":
                scan = "roll"
            elif tok in ("perm", "scatter"):
                red = tok
            elif tok == "align":
                align = True
            elif tok == "split":
                layout = tok
            elif tok.startswith("c") and tok[1:].isdigit():
                chunk = int(tok[1:])
        return RasterConfig(
            max_instances=2**18, max_per_tile=1024, chunk=chunk,
            backend=backend.split("-")[0], scan_impl=scan, reduction=red,
            layout=layout,
        ), align

    def loss_and_renders(gauss, backend, binned=None):
        cfg, _ = make_cfg(backend)
        p = dict(params)
        p.update(gauss)
        out = slam_loss(
            p, active, rot, tran, gt_im, gt_depth, cam, cfg,
            tracking=False, loss_w_im=0.5, loss_w_depth=1.0,
            use_sil_for_loss=False, sil_thres=0.5,
            ignore_outlier_depth_loss=False, binned=binned,
        )
        return out.loss, (out.im, out.depth, out.silhouette)

    gauss = {k: params[k] for k in GAUSSIAN_KEYS}

    from splatam_tpu.core.losses import compute_binned
    from splatam_tpu.render.binning import alignment_order

    modes = (
        "pallas", "pallas-roll", "pallas-perm", "pallas-scatter",
        "pallas-align", "pallas-roll-perm-align",
        "pallas-split", "pallas-split-c256", "jnp",
    )
    results = {}
    for backend in modes:
        cfg_b, align = make_cfg(backend)
        binned = None
        if align:
            # aligned-window layout: rank from a probe binning's counts,
            # exactly as the SLAM driver feeds the previous rebin's counts
            probe = compute_binned(params, active, rot, tran, cam, cfg_b)
            rank = alignment_order(probe.counts, cfg_b.chunk)
            binned = compute_binned(
                params, active, rot, tran, cam, cfg_b, tile_rank=rank
            )
        f = jax.jit(
            lambda g, b=backend, bn=binned: jax.value_and_grad(
                lambda gg: loss_and_renders(gg, b, bn), has_aux=True
            )(g)
        )
        (loss, renders), grads = f(gauss)
        results[backend] = (
            float(loss),
            [np.asarray(r) for r in renders],
            {k: np.asarray(v) for k, v in grads.items()},
        )

    lj, rj, gj = results["jnp"]

    ok = True

    def check(name, a, b, atol, rtol=1e-4, q999=None):
        nonlocal ok
        err = np.max(np.abs(a - b)) if a.size else 0.0
        scale = np.max(np.abs(b)) + 1e-12
        good = np.allclose(a, b, atol=atol, rtol=rtol)
        msg = f"{name:<24} max_abs_err={err:.3e} rel={err/scale:.3e}"
        if q999 is not None and a.size:
            # the max is dominated by ALPHA_MIN keep-threshold flips (see
            # below); the error BODY must stay at f32-noise level
            p = np.quantile(np.abs(a - b), 0.999)
            good &= bool(p < q999)
            msg += f" p99.9={p:.2e}"
        print(msg + f" {'OK' if good else 'FAIL'}")
        ok &= bool(good)

    print("loss jnp=%.6f  " % lj + "  ".join(
        f"{m}={results[m][0]:.6f}"
        for m in modes if m != "jnp"
    ))
    for m in modes:
        ok &= abs(results[m][0] - lj) < 1e-3 * max(abs(lj), 1.0)
    # Forward tolerance: the kernels evaluate the exponent via an MXU
    # quadratic form while the oracle uses per-pair arithmetic; alphas that
    # land within ~1e-5 of the ALPHA_MIN=1/255 keep threshold can flip
    # inclusion between the two associations (the CUDA reference differs
    # from ANY reimplementation the same way), and each flip moves a pixel
    # by at most ~alpha_min * T * feature. Hence: max error bounded by
    # ~ALPHA_MIN, 99.9th percentile pinned at f32-noise level.
    for m in modes:
        if m == "jnp":
            continue
        tag = m.removeprefix("pallas")
        rm = results[m][1]
        check(f"im{tag}", rm[0], rj[0], 5e-3, q999=1e-4)
        check(f"depth{tag}", rm[1], rj[1], 2e-2, q999=1e-3)
        check(f"silhouette{tag}", rm[2], rj[2], 5e-3, q999=1e-4)
    # Gradient tolerance: at this scene density (~400 instances/tile, deep
    # saturated alpha stacks) the two f32 formulations (log-space MXU cumsum
    # vs sequential cumprod) accumulate ~1e-2 relative elementwise noise in
    # the alpha chain while agreeing directionally to ~2% (tools/fd_check.py)
    # and matching bitwise across runs; the linear color path agrees to 1e-5.
    for k in GAUSSIAN_KEYS:
        scale = np.max(np.abs(gj[k]))
        if scale < 1e-8:
            print(f"grad[{k}]  ref ~ 0 (scale={scale:.1e}); skipped")
            continue
        for m in modes:
            if m == "jnp":
                continue
            tag = m.removeprefix("pallas")
            check(f"grad[{k}]{tag}", results[m][2][k] / scale,
                  gj[k] / scale, 2e-2)

    # --- power=2 (fisher) kernel: compiled Mosaic vs per-pixel jacrev
    # through the jnp rasterizer (the same oracle tests/test_fisher.py pins
    # in interpret mode) on a small scene — VERDICT r2 item 5 gate
    # extension ---
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(
        __file__)), "..", "tests"))
    from splatam_tpu.fisher import render_fisher
    from tests.test_fisher import (  # noqa: E402
        SEED as _FSEED,
        _oracle_fisher,
        _params_from_scene,
    )
    from tests.test_oracle import make_scene as _mk  # noqa: E402

    rngf = np.random.default_rng(0)
    nf, wf, hf = 24, 48, 32
    mns, cols, ops_, scls, qts, camf = _mk(rngf, n=nf, w=wf, h=hf)
    pf, vf = _params_from_scene(mns, cols, ops_, scls, qts, nf)
    cfg_f = RasterConfig(
        max_instances=4096, max_per_tile=256, chunk=128, backend="pallas"
    )
    h_pal = np.asarray(render_fisher(
        pf, vf["active"], jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3), camf,
        cfg_f, seed_value=_FSEED,
    ))
    h_ref = _oracle_fisher(pf, vf["active"], camf, nf)
    fscale = np.abs(h_ref).max() + 1e-20
    # gradient-class tolerance (see the grad checks above): the compiled
    # MXU power association vs the oracle's per-pair chain, AMPLIFIED by
    # the squaring — measured 3.5e-3 of scale on chip (5e-5 in interpret
    # mode, where dots are emulated in plain f32)
    check("fisher(power=2)", h_pal / fscale, h_ref / fscale, 2e-2)

    # --- calc_ssim on-chip: the banded matmuls run at Precision.HIGH
    # (3-pass bf16 split) — CPU tests can't validate that (XLA:CPU ignores
    # precision settings), so pin the compiled-TPU SSIM against a float64
    # numpy evaluation of the same banded-matrix math (ADVICE r3) ---
    from splatam_tpu.core.losses import _band_matrix, calc_ssim

    rngs = np.random.default_rng(7)
    hs, ws = 191, 253  # non-128-multiples: exercise edge bands + padding
    im1 = rngs.uniform(0, 1, (3, hs, ws)).astype(np.float32)
    im2 = np.clip(im1 + rngs.normal(0, 0.08, im1.shape), 0, 1).astype(
        np.float32
    )
    ssim_tpu = float(jax.jit(calc_ssim)(jnp.asarray(im1), jnp.asarray(im2)))

    bh = _band_matrix(hs, 11, 1.5).astype(np.float64)
    bw = _band_matrix(ws, 11, 1.5).astype(np.float64)

    def conv64(x):
        return np.einsum("ih,chw,wv->civ", bh, x.astype(np.float64), bw)

    mu1, mu2 = conv64(im1), conv64(im2)
    s1 = conv64(im1 * im1) - mu1 * mu1
    s2 = conv64(im2 * im2) - mu2 * mu2
    s12 = conv64(im1 * im2) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_ref = float(
        (
            (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
            / ((mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
        ).mean()
    )
    derr = abs(ssim_tpu - ssim_ref)
    good = derr < 1e-5  # the torch-parity pin the HIGH split must stay inside
    print(f"{'calc_ssim(HIGH)':<24} abs_err={derr:.3e} {'OK' if good else 'FAIL'}")
    ok &= good

    if not ok:
        print("PARITY FAIL")
        sys.exit(1)
    print("PARITY OK (compiled pallas vs jnp oracle on TPU)")


if __name__ == "__main__":
    main()
