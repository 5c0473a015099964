"""Dense reference rasterizer — the differentiable oracle.

A pure-jnp O(N * H * W) implementation of the exact forward semantics of the
reference CUDA renderer (`cuda_rasterizer/forward.cu:261-393`), used as the
ground truth for unit tests of the production tiled/Pallas paths and as the
gradient oracle (JAX autodiff through this function defines the expected
backward, replacing `cuda_rasterizer/backward.cu`).

Sequential-compositing semantics are reproduced in closed form:
  * depth-stable ordering (radix-sort parity: ascending camera z, ties by
    Gaussian index),
  * a Gaussian g contributes to pixel p only if p's tile lies in g's tile
    rect (tile binning semantics),
  * skip if power > 0 or alpha < 1/255 (alpha capped at 0.99),
  * hard stop: the first contribution that would push transmittance below
    1e-4 is dropped along with everything behind it,
  * median depth: recorded where T crosses 0.5, else 15.0.

Only suitable for small N and small images; the production paths
(`render_tiled.py`, Pallas kernels) must match it exactly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatam_tpu.render.camera import Camera
from splatam_tpu.render.geometry import (
    ALPHA_CAP,
    ALPHA_MIN,
    MEDIAN_DEPTH_INIT,
    T_STOP,
    TILE,
    Projected,
    preprocess,
)


class RenderOutput(NamedTuple):
    color: jax.Array  # (3, H, W)
    radius: jax.Array  # (N,) int32
    depth: jax.Array  # (1, H, W) median depth
    final_t: jax.Array  # (H, W) final transmittance (silhouette = 1 - T)


def rasterize_dense(
    means3d: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,  # (N,) or (N, 1)
    scales: jax.Array,
    rotations: jax.Array,
    cam: Camera,
    active: jax.Array | None = None,
) -> RenderOutput:
    opacities = opacities.reshape(-1)
    proj: Projected = preprocess(means3d, scales, rotations, cam, active=active)
    h, w = cam.image_height, cam.image_width
    n = means3d.shape[0]

    valid = proj.radius > 0
    # Sort ascending by depth with invalid rows pushed to the back. Stable
    # sort ties on index — parity with cub radix sort over (tile, depth) keys.
    sort_depth = jnp.where(valid, proj.depths, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)

    s_mean2d = proj.means2d[order]
    s_conic = proj.conic[order]
    s_opacity = opacities[order]
    s_color = colors[order]
    s_depth = proj.depths[order]
    s_rect_min = proj.rect_min[order]
    s_rect_max = proj.rect_max[order]
    s_valid = valid[order]

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)
    tile_x = (jnp.arange(w) // TILE)[None, :]  # (1, W)
    tile_y = (jnp.arange(h) // TILE)[:, None]  # (H, 1)

    dx = s_mean2d[:, 0][:, None, None] - px[None]  # (N, H, W)
    dy = s_mean2d[:, 1][:, None, None] - py[None]
    a = s_conic[:, 0][:, None, None]
    b = s_conic[:, 1][:, None, None]
    c = s_conic[:, 2][:, None, None]
    # power is clamped to <= 0 rather than power>0 dropped: for the PD
    # conics the low-pass filter guarantees, power > 0 only ever arises from
    # float rounding at near-mean pixels (where the CUDA reference's
    # `forward.cu:338` guard computes power ~ -ulp and KEEPS alpha ~ op), so
    # the clamp matches the reference's effective behavior while being
    # robust to the Pallas kernels' matmul-evaluated power (~1e-5 noise).
    power = jnp.minimum(
        -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy, 0.0
    )

    in_rect = (
        (tile_x[None] >= s_rect_min[:, 0][:, None, None])
        & (tile_x[None] < s_rect_max[:, 0][:, None, None])
        & (tile_y[None] >= s_rect_min[:, 1][:, None, None])
        & (tile_y[None] < s_rect_max[:, 1][:, None, None])
    )

    alpha = jnp.minimum(ALPHA_CAP, s_opacity[:, None, None] * jnp.exp(power))
    contributes = s_valid[:, None, None] & in_rect & (alpha >= ALPHA_MIN)
    alpha = jnp.where(contributes, alpha, 0.0)

    # Transmittance before/after each contribution (front-to-back).
    one_minus = 1.0 - alpha
    t_after = jnp.cumprod(one_minus, axis=0)
    t_before = jnp.concatenate([jnp.ones_like(t_after[:1]), t_after[:-1]], axis=0)
    live = t_after >= T_STOP  # hard-stop rule; monotone in the sort order

    weight = alpha * t_before * live
    color = jnp.einsum(
        "nhw,nc->chw", weight, s_color, precision=jax.lax.Precision.HIGHEST
    )
    final_t = jnp.prod(jnp.where(live, one_minus, 1.0), axis=0)
    color = color + final_t[None] * cam.bg[:, None, None]

    crossing = (t_before > 0.5) & (t_after < 0.5) & live
    depth = jnp.sum(
        jnp.where(crossing, s_depth[:, None, None], 0.0), axis=0
    ) + MEDIAN_DEPTH_INIT * (1.0 - jnp.any(crossing, axis=0).astype(jnp.float32))

    # radius in original (unsorted) order
    return RenderOutput(
        color=color,
        radius=proj.radius,
        depth=depth[None],
        final_t=final_t,
    )
