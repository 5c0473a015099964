"""Tile-order window alignment (binning.alignment_order).

Any tile_rank permutation must be render- and gradient-exact (it only
reorders tile segments within the sorted stream); alignment_order must
additionally shrink the chunk grid by pairing residue-complementary tiles.
"""
import numpy as np
import jax
import jax.numpy as jnp

from splatam_tpu.core.losses import compute_binned, slam_loss
from splatam_tpu.data.synthetic import SyntheticDataset
from splatam_tpu.render.binning import RasterConfig, alignment_order
from splatam_tpu.slam.initialize import initialize_first_timestep


def _chunks_for_order(counts, chunk, rank=None):
    """Reference chunk-count model: sum over tiles in stream order of
    ceil((count + start_residue)/chunk), empty tiles one init chunk."""
    counts = np.asarray(counts)
    order = np.argsort(rank) if rank is not None else np.arange(len(counts))
    s = 0
    total = 0
    for t in order:
        c = int(counts[t])
        if c == 0:
            total += 1
            continue
        total += -((c + s % chunk) // -chunk)
        s += c
    return total


def test_alignment_order_pairs_complements():
    counts = jnp.asarray([32, 64, 96, 64], jnp.int32)
    rank = alignment_order(counts, 128)
    r = np.asarray(rank)
    assert sorted(r.tolist()) == [0, 1, 2, 3]
    # perfectly pairable multiset reaches the sum-ceil(c/chunk) floor
    assert _chunks_for_order(counts, 128, r) == 4
    assert _chunks_for_order(counts, 128) == 5  # identity order wastes one


def test_alignment_order_handles_zeros_and_aligned():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 400, size=257).astype(np.int32)
    counts[::7] = 0
    counts[::11] = 128
    rank = alignment_order(jnp.asarray(counts), 128)
    r = np.asarray(rank)
    assert sorted(r.tolist()) == list(range(257))
    assert _chunks_for_order(counts, 128, r) <= _chunks_for_order(counts, 128)


def _scene(cfg, w=96, h=64):
    ds = SyntheticDataset(num_frames=1, width=w, height=h, seed=1)
    color, depth, k, pose = ds[0]
    params, variables, _, _, cam, _ = initialize_first_timestep(
        color, depth, k, pose, 1, 3.0, "isotropic"
    )
    rot = params["cam_unnorm_rots"][0, :, 0]
    tran = params["cam_trans"][0, :, 0]
    im = jnp.asarray(np.transpose(color, (2, 0, 1)) / 255.0, jnp.float32)
    dep = jnp.asarray(np.transpose(depth, (2, 0, 1)), jnp.float32)
    return params, variables["active"], rot, tran, im, dep, cam


def test_tile_rank_render_and_grads_exact():
    """Binning under alignment_order (and under a RANDOM permutation — the
    stale-counts worst case) renders identically and matches gradients."""
    cfg = RasterConfig(
        max_instances=2**16, max_per_tile=512, chunk=128,
        backend="pallas", layout="aligned"
    )
    params, active, rot, tran, im, dep, cam = _scene(cfg)

    def loss_fn(p, binned):
        out = slam_loss(
            p, active, rot, tran, im, dep, cam, cfg,
            tracking=False, loss_w_im=0.5, loss_w_depth=1.0,
            use_sil_for_loss=False, sil_thres=0.5,
            ignore_outlier_depth_loss=False, binned=binned,
        )
        return out.loss

    binned0 = compute_binned(params, active, rot, tran, cam, cfg)
    rank = alignment_order(binned0.counts, cfg.chunk)
    binned1 = compute_binned(
        params, active, rot, tran, cam, cfg, tile_rank=rank
    )
    assert not bool(binned1.overflow)
    assert int(binned1.num_instances) == int(binned0.num_instances)
    assert int(binned1.padded_total) <= int(binned0.padded_total)
    np.testing.assert_array_equal(
        np.asarray(binned1.counts), np.asarray(binned0.counts)
    )

    num_tiles = binned0.counts.shape[0]
    rng = np.random.default_rng(3)
    rand_rank = jnp.asarray(rng.permutation(num_tiles).astype(np.int32))
    binned2 = compute_binned(
        params, active, rot, tran, cam, cfg, tile_rank=rand_rank
    )

    v0, g0 = jax.value_and_grad(loss_fn)(params, binned0)
    for binned in (binned1, binned2):
        v, g = jax.value_and_grad(loss_fn)(params, binned)
        np.testing.assert_allclose(float(v), float(v0), rtol=1e-6)
        for key in g0:
            np.testing.assert_allclose(
                np.asarray(g[key]), np.asarray(g0[key]),
                atol=1e-5, rtol=1e-4, err_msg=key,
            )


def test_tile_rank_saves_chunks_on_synthetic_scene():
    cfg = RasterConfig(
        max_instances=2**17, max_per_tile=512, chunk=128,
        backend="pallas", layout="aligned"
    )
    params, active, rot, tran, _, _, cam = _scene(cfg, w=160, h=128)
    binned0 = compute_binned(params, active, rot, tran, cam, cfg)
    rank = alignment_order(binned0.counts, cfg.chunk)
    binned1 = compute_binned(
        params, active, rot, tran, cam, cfg, tile_rank=rank
    )
    saved = int(binned0.padded_total) - int(binned1.padded_total)
    # the model predicts the exact chunk counts for both orders
    assert int(binned0.padded_total) // cfg.chunk == _chunks_for_order(
        np.asarray(binned0.counts), cfg.chunk
    )
    assert int(binned1.padded_total) // cfg.chunk == _chunks_for_order(
        np.asarray(binned0.counts), cfg.chunk, np.asarray(rank)
    )
    # whether any chunks are SAVED depends on the scene's residue multiset
    # (the exact-conic cull shifts counts; this scene may have no
    # complementary pairs) — the pairing win itself is pinned by
    # test_alignment_order_pairs_complements on synthetic counts
    assert saved >= 0
