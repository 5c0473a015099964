"""Pallas kernel path vs the jnp scan path: forward and gradient parity.

On CPU the kernels run in Pallas interpret mode; the same code compiles to
Mosaic on TPU, so these tests pin the kernel semantics against the
XLA-autodiff oracle (which is itself pinned against the dense oracle in
test_tiled.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.render_tiled import rasterize_tiled

from tests.test_oracle import make_scene

CFG_JNP = RasterConfig(max_instances=4096, max_per_tile=256, chunk=128, backend="jnp")
CFG_PAL = RasterConfig(max_instances=4096, max_per_tile=256, chunk=128, backend="pallas")


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_forward_matches_jnp(seed):
    rng = np.random.default_rng(seed)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=80, w=72, h=56)
    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    ref, _ = rasterize_tiled(*args, cfg=CFG_JNP)
    out, aux = rasterize_tiled(*args, cfg=CFG_PAL)
    assert not bool(aux.overflow)
    # tolerance = the terms=2 transmittance budget (worst case
    # |log T_STOP| * 2^-17 ~ 7e-5 relative — _chunk_transmittance docstring)
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.depth), np.asarray(ref.depth), atol=1e-5, rtol=1e-4
    )
    # rtol + small atol so near-zero (saturated, ~T_STOP) transmittances
    # stay meaningfully constrained (ADVICE r3)
    np.testing.assert_allclose(
        np.asarray(out.final_t), np.asarray(ref.final_t), atol=2e-5, rtol=1e-4
    )


def test_pallas_forward_multifeat():
    """6-channel (RGB + depth/sil/z2) fused pass matches the jnp path."""
    rng = np.random.default_rng(7)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=60, w=64, h=48)
    depths_feat = rng.uniform(1.0, 5.0, (60, 1)).astype(np.float32)
    feats = np.concatenate(
        [colors, depths_feat, np.ones_like(depths_feat), depths_feat**2], axis=-1
    )
    args = (
        jnp.asarray(means), jnp.asarray(feats), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    ref, _ = rasterize_tiled(*args, cfg=CFG_JNP)
    out, _ = rasterize_tiled(*args, cfg=CFG_PAL)
    # rtol = the terms=2 transmittance budget (see above)
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), atol=1e-5, rtol=1e-4
    )


def test_pallas_gradients_match_jnp():
    rng = np.random.default_rng(3)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=40, w=48, h=32)
    args = [
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats),
    ]
    cot = jnp.asarray(rng.normal(size=(3, 32, 48)).astype(np.float32))

    def make_loss(cfg):
        def loss(m, c, o, s, q):
            out, _ = rasterize_tiled(m, c, o, s, q, cam, cfg=cfg)
            return (
                jnp.sum(out.color * cot)
                + jnp.sum(out.depth)
                + jnp.sum(out.final_t)
            )
        return loss

    g_ref = jax.grad(make_loss(CFG_JNP), argnums=tuple(range(5)))(*args)
    g_pal = jax.grad(make_loss(CFG_PAL), argnums=tuple(range(5)))(*args)
    for gr, gp, name in zip(
        g_ref, g_pal, ["means", "colors", "opac", "scales", "quats"]
    ):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(gp) / scale, np.asarray(gr) / scale, atol=5e-5, err_msg=name
        )


@pytest.mark.parametrize("reduction", ["perm", "scatter"])
def test_pallas_reduction_modes_match_sort(reduction):
    """The sort-free gradient reductions (RasterConfig.reduction) are exact
    re-associations of the default sort path — agreement at rounding noise."""
    import dataclasses

    rng = np.random.default_rng(11)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=60, w=64, h=48)
    args = [
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats),
    ]

    def make_loss(cfg):
        def loss(m, c, o, s, q):
            out, _ = rasterize_tiled(m, c, o, s, q, cam, cfg=cfg)
            return (
                jnp.sum(out.color**2) + jnp.sum(out.depth)
                + jnp.sum(out.final_t**2)
            )
        return loss

    g_sort = jax.grad(make_loss(CFG_PAL), argnums=tuple(range(5)))(*args)
    cfg = dataclasses.replace(CFG_PAL, reduction=reduction)
    g_alt = jax.grad(make_loss(cfg), argnums=tuple(range(5)))(*args)
    for gr, gp, name in zip(
        g_sort, g_alt, ["means", "colors", "opac", "scales", "quats"]
    ):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(gp) / scale, np.asarray(gr) / scale, atol=2e-4,
            err_msg=name,
        )


def test_pallas_means2d_dummy_gradient():
    rng = np.random.default_rng(4)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=20, w=48, h=32)
    dummy = jnp.zeros((20, 2), jnp.float32)

    def make_loss(cfg):
        def loss(d):
            out, _ = rasterize_tiled(
                jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
                jnp.asarray(scales), jnp.asarray(quats), cam, cfg=cfg,
                means2d_dummy=d,
            )
            return jnp.sum(out.color**2)
        return loss

    g_ref = np.asarray(jax.grad(make_loss(CFG_JNP))(dummy))
    g_pal = np.asarray(jax.grad(make_loss(CFG_PAL))(dummy))
    np.testing.assert_allclose(g_pal, g_ref, atol=2e-5 * (np.abs(g_ref).max() + 1))


def test_saturation_depth_cap_trims_and_matches():
    """aux.sat_depth fed back as binning depth_cap drops provably-dead
    instances (every pixel opaque before they are reached) without changing
    the render; the jnp oracle stays the cross-check."""
    from splatam_tpu.render.binning import bin_gaussians_csr
    from splatam_tpu.render.geometry import preprocess
    from splatam_tpu.core.transforms import normalize

    rng = np.random.default_rng(3)
    n, w, h = 400, 64, 48
    # opaque fronts: many near-1 opacity gaussians stacked in depth so most
    # tiles saturate early
    means = np.stack(
        [
            rng.uniform(-0.9, 0.9, n),
            rng.uniform(-0.7, 0.7, n),
            rng.uniform(0.5, 6.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacities = np.full(n, 0.95, np.float32)
    scales = np.full((n, 3), 0.25, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    from splatam_tpu.render.camera import setup_camera

    k = [[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]]
    cam = setup_camera(w, h, k, np.eye(4))

    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    ref, _ = rasterize_tiled(*args, cfg=CFG_JNP)
    out_full, aux_full = rasterize_tiled(*args, cfg=CFG_PAL)
    sat = aux_full.sat_depth
    assert sat is not None and sat.shape == (4 * 3,)  # 64x48 -> 4x3 tiles
    assert bool(jnp.isfinite(sat).any()), "no tile saturated — weak scene"

    proj = preprocess(
        jnp.asarray(means), jnp.asarray(scales),
        normalize(jnp.asarray(quats)), cam,
    )
    binned_full = bin_gaussians_csr(
        proj, cam, CFG_PAL, opacities=jnp.asarray(opacities)
    )
    binned_trim = bin_gaussians_csr(
        proj, cam, CFG_PAL, opacities=jnp.asarray(opacities), depth_cap=sat
    )
    n_full = int(binned_full.num_instances)
    n_trim = int(binned_trim.num_instances)
    assert n_trim < n_full, (n_trim, n_full)

    out_trim, aux_trim = rasterize_tiled(*args, cfg=CFG_PAL, binned=binned_trim)
    assert not bool(aux_trim.overflow)
    # rtol/atol = the terms=2 transmittance budget (~7e-5 relative worst
    # case — _chunk_transmittance docstring)
    np.testing.assert_allclose(
        np.asarray(out_trim.color), np.asarray(ref.color), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_trim.depth), np.asarray(ref.depth), atol=1e-5, rtol=1e-4
    )
    # rtol + small atol so near-zero (saturated, ~T_STOP) transmittances —
    # exactly where the sat-depth trim operates — stay meaningfully
    # constrained (ADVICE r3 / VERDICT r4 item 8)
    np.testing.assert_allclose(
        np.asarray(out_trim.final_t), np.asarray(ref.final_t),
        atol=2e-5, rtol=1e-4,
    )

    # gradients flow identically through the trimmed stream
    def loss_with(binned):
        def f(ms, cols, ops):
            o, _ = rasterize_tiled(
                ms, cols, ops, args[3], args[4], cam, cfg=CFG_PAL,
                binned=binned,
            )
            return jnp.sum(o.color**2) + jnp.sum(o.depth)
        return jax.grad(f, argnums=(0, 1, 2))(args[0], args[1], args[2])

    g_full = loss_with(binned_full)
    g_trim = loss_with(binned_trim)
    for a, b in zip(g_full, g_trim):
        # grads reach O(100) on this opaque scene; window realignment after
        # the trim changes f32 chunk-cumsum association (~1e-5 relative)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
        )


def test_depth_cap_with_tile_rank_fused_lookup_matches():
    """depth_cap AND tile_rank together take the fused (T, 2) bitcast/stack
    row-gather branch (binning.py:461); it must agree exactly with the
    separate-lookup paths in both counts and render/grads (ADVICE r3)."""
    from splatam_tpu.render.binning import alignment_order, bin_gaussians_csr
    from splatam_tpu.render.camera import setup_camera
    from splatam_tpu.render.geometry import preprocess
    from splatam_tpu.core.transforms import normalize

    rng = np.random.default_rng(5)
    n, w, h = 400, 64, 48
    means = np.stack(
        [
            rng.uniform(-0.9, 0.9, n),
            rng.uniform(-0.7, 0.7, n),
            rng.uniform(0.5, 6.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacities = np.full(n, 0.95, np.float32)
    scales = np.full((n, 3), 0.25, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    k = [[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]]
    cam = setup_camera(w, h, k, np.eye(4))
    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    _, aux_full = rasterize_tiled(*args, cfg=CFG_PAL)
    sat = aux_full.sat_depth
    assert bool(jnp.isfinite(sat).any()), "no tile saturated — weak scene"

    proj = preprocess(
        jnp.asarray(means), jnp.asarray(scales),
        normalize(jnp.asarray(quats)), cam,
    )
    binned_cap = bin_gaussians_csr(
        proj, cam, CFG_PAL, opacities=jnp.asarray(opacities), depth_cap=sat
    )
    rank = alignment_order(binned_cap.counts, CFG_PAL.chunk)
    binned_both = bin_gaussians_csr(
        proj, cam, CFG_PAL, opacities=jnp.asarray(opacities), depth_cap=sat,
        tile_rank=rank,
    )
    assert not bool(binned_both.overflow)
    # the fused lookup must drop exactly the same instances
    assert int(binned_both.num_instances) == int(binned_cap.num_instances)
    np.testing.assert_array_equal(
        np.asarray(binned_both.counts), np.asarray(binned_cap.counts)
    )

    out_cap, _ = rasterize_tiled(*args, cfg=CFG_PAL, binned=binned_cap)
    out_both, _ = rasterize_tiled(*args, cfg=CFG_PAL, binned=binned_both)
    np.testing.assert_allclose(
        np.asarray(out_both.color), np.asarray(out_cap.color),
        atol=2e-5, rtol=1e-4,
    )

    def grads(binned):
        def f(ms, cols, ops):
            o, _ = rasterize_tiled(
                ms, cols, ops, args[3], args[4], cam, cfg=CFG_PAL,
                binned=binned,
            )
            return jnp.sum(o.color**2) + jnp.sum(o.depth)
        return jax.grad(f, argnums=(0, 1, 2))(args[0], args[1], args[2])

    for a, b in zip(grads(binned_cap), grads(binned_both)):
        # realignment changes chunk-cumsum association only (~1e-5 relative)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
        )


def test_pallas_gradients_match_jnp_on_saturated_scene():
    """Regression: the bwd kernels' saturation early-exit must still emit
    real gid keys for skipped chunks (zero gradient rows) — BIG_KEY there
    misaligns the sort-reduction's analytic segment boundaries and corrupts
    every later gaussian's gradient (was grads off by O(1000) on opaque
    scenes; FD-verified)."""
    rng = np.random.default_rng(11)
    n, w, h = 300, 48, 32
    means = np.stack(
        [
            rng.uniform(-0.8, 0.8, n),
            rng.uniform(-0.6, 0.6, n),
            rng.uniform(0.5, 6.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacities = np.full(n, 0.97, np.float32)
    scales = np.full((n, 3), 0.3, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    from splatam_tpu.render.camera import setup_camera

    k = [[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]]
    cam = setup_camera(w, h, k, np.eye(4))
    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )

    def grads(cfg):
        def f(ms, cols, ops):
            o, _ = rasterize_tiled(ms, cols, ops, args[3], args[4], cam, cfg=cfg)
            return jnp.sum(o.color**2) + jnp.sum(o.depth)
        return jax.grad(f, argnums=(0, 1, 2))(args[0], args[1], args[2])

    g_pal = grads(CFG_PAL)
    g_jnp = grads(CFG_JNP)
    for a, b in zip(g_pal, g_jnp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
        )


def test_pallas_roll_scan_matches_mxu():
    """scan_impl='roll' (lane-roll cumprod transmittance) is an exact
    re-association of the 'mxu' log-space path — fwd and grads agree."""
    import dataclasses

    rng = np.random.default_rng(5)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=70, w=64, h=48)
    args = [
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats),
    ]
    cfg_roll = dataclasses.replace(CFG_PAL, scan_impl="roll")

    def make_loss(cfg):
        def loss(m, c, o, s, q):
            out, _ = rasterize_tiled(m, c, o, s, q, cam, cfg=cfg)
            return (
                jnp.sum(out.color**2) + jnp.sum(out.depth)
                + jnp.sum(out.final_t**2)
            )
        return loss

    ref, _ = rasterize_tiled(*args, cam, cfg=CFG_PAL)
    out, _ = rasterize_tiled(*args, cam, cfg=cfg_roll)
    # roll is an exact cumprod; mxu carries the terms=2 split error (~7e-5
    # relative worst case), so the cross-impl pin is the terms=2 budget
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.depth), np.asarray(ref.depth), atol=1e-5
    )
    g_mxu = jax.grad(make_loss(CFG_PAL), argnums=tuple(range(5)))(*args)
    g_roll = jax.grad(make_loss(cfg_roll), argnums=tuple(range(5)))(*args)
    for gr, gp, name in zip(
        g_mxu, g_roll, ["means", "colors", "opac", "scales", "quats"]
    ):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(gp) / scale, np.asarray(gr) / scale, atol=1e-4,
            err_msg=name,
        )


@pytest.mark.parametrize(
    "tracking,use_sil,ignore_outlier",
    [
        (False, False, False),   # mapping (bench shape)
        (False, False, True),    # mapping + outlier mask
        (True, True, False),     # Replica-style tracking
        (True, False, True),     # TUM-style tracking (median mask)
        (True, False, False),    # unmasked tracking
    ],
)
def test_tile_space_slam_loss_matches_oracle(tracking, use_sil, ignore_outlier):
    """The pallas backend's TILE-layout slam_loss (losses._slam_loss_blocks)
    equals the jnp-oracle image-layout loss: same scalars, same grads."""
    from splatam_tpu.core.losses import slam_loss
    from splatam_tpu.core.params import GAUSSIAN_KEYS

    rng = np.random.default_rng(9)
    n, w, h = 150, 72, 56  # h%16 != 0 -> exercises pad-pixel handling
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=n, w=w, h=h)
    params = {
        "means3D": jnp.asarray(means),
        "rgb_colors": jnp.asarray(colors),
        "unnorm_rotations": jnp.asarray(quats),
        "logit_opacities": jnp.asarray(
            np.log(opacities / (1 - opacities)).reshape(-1, 1).astype(np.float32)
        ),
        # ANISOTROPIC scales: with iso scales the true rotation gradient is
        # exactly zero and any backend comparison on it is cancellation noise
        "log_scales": jnp.asarray(np.log(scales).astype(np.float32)),
    }
    active = jnp.ones(n, bool)
    rot = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    tran = jnp.zeros(3, jnp.float32)
    gt_im = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
    gt_depth = jnp.asarray(
        (rng.uniform(0.5, 4.0, (1, h, w)) * (rng.uniform(size=(1, h, w)) > 0.1))
        .astype(np.float32)
    )

    def run(cfg):
        def f(gauss, r, t):
            p = dict(params, **gauss)
            out = slam_loss(
                p, active, r, t, gt_im, gt_depth, cam, cfg,
                tracking=tracking, loss_w_im=0.5, loss_w_depth=1.0,
                use_sil_for_loss=use_sil, sil_thres=0.5,
                ignore_outlier_depth_loss=ignore_outlier,
            )
            return out.loss, out
        gauss = {k: params[k] for k in GAUSSIAN_KEYS}
        if tracking:
            (loss, out), grads = jax.value_and_grad(
                lambda r, t: f(gauss, r, t)[0], argnums=(0, 1)
            )(rot, tran), None
            g = jax.grad(lambda r, t: f(gauss, r, t)[0], argnums=(0, 1))(rot, tran)
        else:
            loss = f(gauss, rot, tran)[0]
            g = jax.grad(lambda gs: f(gs, rot, tran)[0])(gauss)
        out = f(gauss, rot, tran)[1]
        return loss, g, out

    loss_j, g_j, out_j = run(CFG_JNP)
    loss_p, g_p, out_p = run(CFG_PAL)
    np.testing.assert_allclose(
        float(loss_p), float(loss_j), rtol=2e-4, atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_j)):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        d = np.abs(np.asarray(a) - np.asarray(b)).ravel() / scale
        # pallas-vs-jnp gradient parity pins p99.9, not max: ALPHA_MIN
        # keep-threshold flips bound the worst few pairs (CLAUDE.md)
        assert np.percentile(d, 99.9) <= 2e-4, np.percentile(d, 99.9)
        assert d.max() <= 3e-2, d.max()
    # image outputs agree too (pallas blocks -> image == oracle images)
    np.testing.assert_allclose(
        np.asarray(out_p.im), np.asarray(out_j.im), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_p.silhouette), np.asarray(out_j.silhouette), atol=1e-4
    )


@pytest.mark.parametrize("scan_impl", ["mxu", "roll"])
def test_pallas_chunk256_matches_jnp(scan_impl):
    """chunk=256 windows (the c256 bench token): fwd + grads match the
    oracle for both scan implementations."""
    rng = np.random.default_rng(11)
    means, colors, opacities, scales, quats, cam = make_scene(
        rng, n=90, w=64, h=48
    )
    args = [
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats),
    ]
    cfg_jnp = RasterConfig(
        max_instances=8192, max_per_tile=512, chunk=256, backend="jnp"
    )
    cfg_pal = RasterConfig(
        max_instances=8192, max_per_tile=512, chunk=256, backend="pallas",
        scan_impl=scan_impl,
    )
    ref, _ = rasterize_tiled(*args, cam, cfg=cfg_jnp)
    out, aux = rasterize_tiled(*args, cam, cfg=cfg_pal)
    assert not bool(aux.overflow)
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), atol=2e-5, rtol=1e-4
    )

    def loss(cfg):
        def f(m, c, o, s, q):
            o_, _ = rasterize_tiled(m, c, o, s, q, cam, cfg=cfg)
            return jnp.sum(o_.color) + jnp.sum(o_.final_t)
        return f

    g_ref = jax.grad(loss(cfg_jnp), argnums=(0, 2))(*args)
    g_pal = jax.grad(loss(cfg_pal), argnums=(0, 2))(*args)
    for a, b in zip(g_pal, g_ref):
        scale = np.max(np.abs(np.asarray(b))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4
        )


@pytest.mark.parametrize("saturate", [False, True])
def test_split_layout_matches_jnp(saturate):
    """layout='split' (zero-waste interiors + carry-seeded residue tails)
    must reproduce the jnp oracle's render AND gradients, including on a
    saturating scene (dead-segment carries, early-exited interior chunks
    feeding zero-grad key rows)."""
    rng = np.random.default_rng(11 if saturate else 7)
    means, colors, opacities, scales, quats, cam = make_scene(
        rng, n=150, w=96, h=64
    )
    if saturate:
        opacities = np.clip(opacities + 0.5, 0, 0.97)
    cfg_s = RasterConfig(
        max_instances=2**16, max_per_tile=1024, chunk=128,
        backend="pallas", layout="split",
    )
    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    out_s, aux_s = rasterize_tiled(*args, cfg=cfg_s)
    out_j, _ = rasterize_tiled(*args, cfg=CFG_JNP)
    assert not bool(aux_s.overflow)
    for nm in ("color", "depth", "final_t"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_s, nm)), np.asarray(getattr(out_j, nm)),
            atol=1e-5, rtol=1e-4,
        )

    def loss(ms, cols, ops, cfg):
        o, _ = rasterize_tiled(ms, cols, ops, args[3], args[4], cam, cfg=cfg)
        return jnp.sum(o.color**2) + jnp.sum(o.depth)

    g_s = jax.grad(loss, argnums=(0, 1, 2))(args[0], args[1], args[2], cfg_s)
    g_j = jax.grad(loss, argnums=(0, 1, 2))(
        args[0], args[1], args[2], CFG_JNP
    )
    for a, b in zip(g_s, g_j):
        scale = np.abs(np.asarray(b)).max() + 1e-20
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4
        )


def test_split_interior_only_and_empty_scene():
    """Edge coverage for the split compose: a tile whose count is an exact
    chunk multiple (aux comes from the INTERIOR call — no tail segment) and
    a fully empty scene (every tile takes the constant empty-aux block)."""
    n, w, h = 128, 64, 48
    rng = np.random.default_rng(3)
    # all gaussians tiny and centered in ONE tile -> that tile's count is
    # exactly 128 = one whole chunk, residue 0
    means = np.tile(np.array([[0.02, 0.02, 2.0]], np.float32), (n, 1))
    means[:, 2] += rng.uniform(0, 0.5, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacities = np.full(n, 0.4, np.float32)
    scales = np.full((n, 3), 0.002, np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    from splatam_tpu.render.camera import setup_camera

    cam = setup_camera(
        w, h, [[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.eye(4)
    )
    cfg_s = RasterConfig(
        max_instances=2**14, max_per_tile=1024, chunk=128,
        backend="pallas", layout="split",
    )
    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    out_s, aux_s = rasterize_tiled(*args, cfg=cfg_s)
    out_j, _ = rasterize_tiled(*args, cfg=CFG_JNP)
    assert not bool(aux_s.overflow)
    for nm in ("color", "depth", "final_t"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_s, nm)), np.asarray(getattr(out_j, nm)),
            atol=1e-5, rtol=1e-4,
        )

    # empty scene: all-inactive mask
    out_e, aux_e = rasterize_tiled(
        *args, cfg=cfg_s, active=jnp.zeros(n, bool)
    )
    np.testing.assert_allclose(np.asarray(out_e.final_t), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_e.color[:3]), 0.0, atol=1e-6
    )


@pytest.mark.parametrize("chunk", [256, 512])
def test_split_layout_chunk_sizes_match_jnp(chunk):
    """chunk=256 is the bench's shipped default for the split layout (r5:
    29.3 vs 28.7 Mpix/s at 128 — residues pair near-perfectly into
    256-wide tail chunks); pin fwd + gradient parity at 256 and 512 on a
    dense, saturating scene so the non-128 chunk paths (16-bit lim
    packing, residue pairing, segmented scans) stay covered."""
    rng = np.random.default_rng(9)
    means, colors, opacities, scales, quats, cam = make_scene(
        rng, n=400, w=96, h=64
    )
    opacities = np.clip(opacities + 0.4, 0, 0.97)
    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam,
    )
    cfg_j = RasterConfig(
        max_instances=2**16, max_per_tile=2048, chunk=128, backend="jnp"
    )
    cfg_s = RasterConfig(
        max_instances=2**16, max_per_tile=2048, chunk=chunk,
        backend="pallas", layout="split",
    )
    ref, _ = rasterize_tiled(*args, cfg=cfg_j)
    out, aux = rasterize_tiled(*args, cfg=cfg_s)
    assert not bool(aux.overflow)
    for nm in ("color", "depth", "final_t"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, nm)), np.asarray(getattr(ref, nm)),
            atol=2e-5, rtol=2e-4,
        )

    def loss(m, c, o, cfg):
        o_, _ = rasterize_tiled(m, c, o, args[3], args[4], cam, cfg=cfg)
        return jnp.sum(o_.color**2) + jnp.sum(o_.depth)

    g_s = jax.grad(loss, argnums=(0, 1, 2))(*args[:3], cfg_s)
    g_j = jax.grad(loss, argnums=(0, 1, 2))(*args[:3], cfg_j)
    for a, b in zip(g_s, g_j):
        scale = np.abs(np.asarray(b)).max() + 1e-20
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=7e-4
        )
