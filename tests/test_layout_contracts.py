"""Layout-agnostic raster contracts (moved from the retired packed-layout
suite; the packed stream layout was deleted in r5 — PROFILE.md)."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from splatam_tpu.render.binning import RasterConfig
from tests.test_oracle import make_scene

CFG_JNP = RasterConfig(
    max_instances=2**15, max_per_tile=1024, chunk=128, backend="jnp"
)


@pytest.mark.parametrize("layout", ["aligned", "split"])
def test_carry_depth_grad_false_zeroes_median_depth_primal(layout):
    """ADVICE r2: carry_depth_grad=False zeroes a PRIMAL output (aux row 0,
    median depth) in addition to dropping its gradient row — pin the
    contract so a future caller reading res.aux[:, 0] under the flag gets a
    loud test instead of silent zeros."""
    from splatam_tpu.render.render_tiled import rasterize_tiled_blocks

    rng = np.random.default_rng(2)
    means, colors, opacities, scales, quats, cam = make_scene(
        rng, n=60, w=64, h=48
    )
    cfg = dataclasses.replace(CFG_JNP, backend="pallas", layout=layout)
    args = (
        jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray(scales), jnp.asarray(quats), cam, cfg,
    )
    res_on, _, _ = rasterize_tiled_blocks(*args, carry_depth_grad=True)
    res_off, _, _ = rasterize_tiled_blocks(*args, carry_depth_grad=False)
    assert float(jnp.abs(res_on.aux[:, 0]).max()) > 0.0
    np.testing.assert_array_equal(np.asarray(res_off.aux[:, 0]), 0.0)
    # the rest of aux (final T, sat depth) is unaffected by the flag
    np.testing.assert_allclose(
        np.asarray(res_off.aux[:, 1]), np.asarray(res_on.aux[:, 1]), atol=1e-6
    )


def test_mark_visible_frustum():
    """markVisible parity helper (`rasterizer_impl.cu:141-153`)."""
    from splatam_tpu.render.camera import setup_camera
    from splatam_tpu.render.geometry import mark_visible

    cam = setup_camera(
        64, 48, [[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.eye(4)
    )
    pts = jnp.asarray(
        np.array(
            [[0, 0, 2.0], [0, 0, 0.0005], [0, 0, -1.0], [5, 5, 3.0]],
            np.float32,
        )
    )
    vis = np.asarray(mark_visible(pts, cam))
    # off-screen but in front of the near plane is still "visible" (the
    # reference's NDC bound check is commented out)
    np.testing.assert_array_equal(vis, [True, False, False, True])


def test_resolve_auto_layout_threshold():
    """Density-adaptive layout pick (slam/pipeline.py): split below 2
    chunks/tile, aligned at/above — calibrated by the r5 on-chip crossover
    (212 inst/tile split wins, 308+ aligned wins, PROFILE.md)."""
    from splatam_tpu.slam.pipeline import resolve_auto_layout

    # bench scene shape: 683k instances / 3225 tiles = 212/tile -> split
    assert resolve_auto_layout(683_000, 3225, 128) == "split"
    # 900k scene: 992k instances / 3225 = 308/tile -> aligned
    assert resolve_auto_layout(992_000, 3225, 128) == "aligned"
    # SLAM density (522/tile) -> aligned
    assert resolve_auto_layout(1_682_997, 3225, 128) == "aligned"
    # threshold scales with chunk
    assert resolve_auto_layout(992_000, 3225, 256) == "split"
    assert resolve_auto_layout(0, 0, 128) == "split"  # degenerate: empty
