"""Tile-row-sharded Pallas rendering vs single-device on an 8-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatam_tpu.parallel.mesh import make_mesh
from splatam_tpu.parallel.pallas_sharded import rasterize_rows_sharded
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.render_tiled import rasterize_tiled

from tests.test_oracle import make_scene

CFG = RasterConfig(max_instances=2**14, max_per_tile=256, chunk=128, backend="pallas")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_tiles=8, n_data=1)


def test_sharded_forward_matches_single(mesh):
    rng = np.random.default_rng(0)
    # 128x144: 9 tile rows -> uneven split over 8 devices (pad row exercised)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=120, w=128, h=144)
    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats),
    )
    ref, _ = rasterize_tiled(*args, cam, cfg=CFG)
    out, aux = rasterize_rows_sharded(*args, cam, CFG, mesh, axis_name="tiles")
    assert not bool(aux.overflow)
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.final_t), np.asarray(ref.final_t), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out.radius), np.asarray(ref.radius))
    # median depth identical up to isolated crossing flips
    d = np.abs(np.asarray(out.depth) - np.asarray(ref.depth))
    assert (d > 1e-4).mean() < 1e-3


def test_sharded_gradients_match_single(mesh):
    rng = np.random.default_rng(1)
    means, colors, opacities, scales, quats, cam = make_scene(rng, n=60, w=64, h=64)
    args = [
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats),
    ]
    cot = jnp.asarray(rng.normal(size=(3, 64, 64)).astype(np.float32))

    def loss_single(m, c, o, s, q):
        out, _ = rasterize_tiled(m, c, o, s, q, cam, cfg=CFG)
        return jnp.sum(out.color * cot) + jnp.sum(out.final_t)

    def loss_sharded(m, c, o, s, q):
        out, _ = rasterize_rows_sharded(m, c, o, s, q, cam, CFG, mesh)
        return jnp.sum(out.color * cot) + jnp.sum(out.final_t)

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(*args)
    g_sh = jax.grad(loss_sharded, argnums=(0, 1, 2))(*args)
    for gr, gs, name in zip(g_ref, g_sh, ["means", "colors", "opac"]):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(gs) / scale, np.asarray(gr) / scale, atol=2e-5, err_msg=name
        )


def test_batched_map_size_harness():
    """tools/batched_map_size.py must compile the keyframe-batched step on
    the virtual mesh and report per-device memory; --check executes it."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from batched_map_size import measure

    stats = measure(96, 64, batch=4, gaussians=512, n_data=2, check=True)
    assert stats["devices"] == 8
    assert stats["total_mb"] > 0
    assert stats["fits_v5e_16gb"]
    import numpy as np
    assert np.isfinite(stats["loss"])
