"""Per-Gaussian projection geometry (the "preprocess" stage).

TPU-native re-expression of the reference CUDA preprocess kernel
(`cuda_rasterizer/forward.cu:20-256`): fully vectorized jnp over all N
Gaussians — XLA fuses this into a handful of elementwise/matmul ops, so no
hand-written kernel is needed for this stage.

Numerical-parity constants (see SURVEY.md §2.1):
  * near-cull z <= 0.001          (`auxiliary.h:154`)
  * w-eps 1e-7 in projection      (`forward.cu:199`)
  * fov clamp 1.3 * tanfov        (`forward.cu:82-87`)
  * cov2D low-pass +0.3           (`forward.cu:110-111`)
  * eigenvalue discriminant floor 0.1, radius = ceil(3 sqrt(lambda_max))
                                   (`forward.cu:229-232`)
  * ndc2Pix v -> ((v+1)*S - 1)/2  (`auxiliary.h:41-44`)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatam_tpu.render.camera import Camera

TILE = 16  # BLOCK_X = BLOCK_Y = 16 (`config.h:15-17`)


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """float32 matmul: small geometry matmuls must not drop to bf16 on TPU."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
ALPHA_CAP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_STOP = 1e-4
MEDIAN_DEPTH_INIT = 15.0


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities (all shape (N, ...))."""

    means2d: jax.Array  # (N, 2) pixel coords
    depths: jax.Array  # (N,) camera-frame z
    conic: jax.Array  # (N, 3) inverse 2D covariance (a, b, c)
    radius: jax.Array  # (N,) int32 screen radius, 0 => culled
    rect_min: jax.Array  # (N, 2) int32 tile rect min (x, y), inclusive
    rect_max: jax.Array  # (N, 2) int32 tile rect max (x, y), exclusive
    tiles_touched: jax.Array  # (N,) int32


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Normalized quaternion (w, x, y, z) -> rotation matrix. (..., 4) -> (..., 3, 3).

    Matches `utils/slam_external.py:25-42` (build_rotation) including the
    normalization step. Zero quaternions (inactive capacity-padding slots)
    map to the identity rotation instead of NaN, keeping reverse-mode
    gradients of active parameters clean.
    """
    q = q / jnp.sqrt(
        jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-24)
    )
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def compute_cov3d(scales: jax.Array, rotations: jax.Array, scale_modifier: float = 1.0) -> jax.Array:
    """3D covariance Sigma = R diag(s^2) R^T, packed as (N, 6) upper triangle.

    Packing order (xx, xy, xz, yy, yz, zz) matches `forward.cu:146-151`.
    ``rotations`` are assumed pre-normalized (the Python layer normalizes, as
    in `utils/slam_helpers.py:116`), mirroring that the CUDA kernel skips
    normalization (`forward.cu:127`).
    """
    # Closed form Sigma = sum_k s_k^2 c_k c_k^T over the rotation columns
    # c_k, fully elementwise: batched (N, 3, 3) matmuls lower to poorly
    # tiled dot_generals on TPU (~6.5 ms at 200k gaussians vs ~1 ms here).
    q = rotations  # normalization is idempotent on unit quats
    q = q / jnp.sqrt(
        jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-24)
    )
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = scales * scale_modifier
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    return jnp.stack(
        [
            s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02,
            s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12,
            s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22,
            s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12,
            s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22,
            s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22,
        ],
        axis=-1,
    )


def compute_cov2d(
    means3d: jax.Array,  # (N, 3) world-frame means
    cov3d: jax.Array,  # (N, 6) packed
    viewmatrix: jax.Array,  # (4, 4)
    focal_x: float, focal_y: float, tan_fovx: float, tan_fovy: float,
    valid: jax.Array | None = None,  # (N,) bool: sanitize divisions for culled rows
) -> jax.Array:
    """EWA-splatting 2D covariance (N, 3) = (cxx, cxy, cyy). `forward.cu:74-113`."""
    W = viewmatrix[:3, :3]
    t = _mm(means3d, W.T) + viewmatrix[:3, 3]
    tz = t[:, 2]
    if valid is not None:
        # Culled rows never contribute, but unguarded 1/tz would poison
        # reverse-mode grads with NaN/Inf through the jnp.where trap.
        tz = jnp.where(valid, tz, 1.0)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    # J rows: [fx/tz, 0, -fx tx / tz^2], [0, fy/tz, -fy ty / tz^2]
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2

    # V = R_w2c Sigma R_w2c^T; then cov2d = J V J^T using only rows 0,1 of J.
    # V_ab = wa Sigma wb^T expanded elementwise over the packed entries (W
    # rows are scalars), avoiding (N, 3, 3) intermediates (see compute_cov3d).
    xx, xy, xz, yy, yz, zz = (cov3d[:, i] for i in range(6))

    def ventry(a, b):
        wa, wb = W[a], W[b]
        return (
            wa[0] * wb[0] * xx + wa[1] * wb[1] * yy + wa[2] * wb[2] * zz
            + (wa[0] * wb[1] + wa[1] * wb[0]) * xy
            + (wa[0] * wb[2] + wa[2] * wb[0]) * xz
            + (wa[1] * wb[2] + wa[2] * wb[1]) * yz
        )

    v00, v01, v02 = ventry(0, 0), ventry(0, 1), ventry(0, 2)
    v11, v12, v22 = ventry(1, 1), ventry(1, 2), ventry(2, 2)

    cxx = j00 * j00 * v00 + 2 * j00 * j02 * v02 + j02 * j02 * v22
    cxy = j00 * j11 * v01 + j00 * j12 * v02 + j02 * j11 * v12 + j02 * j12 * v22
    cyy = j11 * j11 * v11 + 2 * j11 * j12 * v12 + j12 * j12 * v22
    # low-pass: every Gaussian is at least ~1px (`forward.cu:110-111`)
    return jnp.stack([cxx + 0.3, cxy, cyy + 0.3], axis=-1)


def ndc2pix(v: jax.Array, size: int) -> jax.Array:
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(
    means3d: jax.Array,  # (N, 3)
    scales: jax.Array,  # (N, 3)
    rotations: jax.Array,  # (N, 4) normalized (w, x, y, z)
    cam: Camera,
    active: jax.Array | None = None,  # (N,) bool; inactive slots are culled
    cov3d_precomp: jax.Array | None = None,  # (N, 6) optional
) -> Projected:
    """Project Gaussians to screen space; cull; compute conics and tile rects."""
    n = means3d.shape[0]
    grid_x = (cam.image_width + TILE - 1) // TILE
    grid_y = (cam.image_height + TILE - 1) // TILE

    # near culling (`auxiliary.h:139-164`)
    p_view = _mm(means3d, cam.viewmatrix[:3, :3].T) + cam.viewmatrix[:3, 3]
    depths = p_view[:, 2]
    valid = depths > 0.001
    if active is not None:
        valid = valid & active

    # projection (`forward.cu:197-200`)
    p_hom = _mm(means3d, cam.projmatrix[:3, :3].T) + cam.projmatrix[:3, 3]
    wclip = _mm(means3d, cam.projmatrix[3, :3, None])[:, 0] + cam.projmatrix[3, 3]
    p_w = 1.0 / jnp.where(valid, wclip + 1e-7, 1.0)
    p_proj = p_hom * p_w[:, None]
    mean_x = ndc2pix(p_proj[:, 0], cam.image_width)
    mean_y = ndc2pix(p_proj[:, 1], cam.image_height)
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    if cov3d_precomp is None:
        cov3d = compute_cov3d(scales, rotations, cam.scale_modifier)
    else:
        cov3d = cov3d_precomp
    cov2d = compute_cov2d(
        means3d, cov3d, cam.viewmatrix, cam.focal_x, cam.focal_y,
        cam.tanfovx, cam.tanfovy, valid=valid,
    )

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    valid = valid & (det != 0.0)
    det_inv = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    conic = jnp.stack(
        [cov2d[:, 2] * det_inv, -cov2d[:, 1] * det_inv, cov2d[:, 0] * det_inv], axis=-1
    )

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    # real (uncilled) rows have lambda1 >= 0.3 from the low-pass filter; the
    # clamp only sanitizes culled rows so radius stays NaN-free.
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
    radius = radius_f.astype(jnp.int32)

    # tile rect (`auxiliary.h:46-56`); radius participates as int
    rx0 = jnp.clip(jnp.floor((mean_x - radius_f) / TILE).astype(jnp.int32), 0, grid_x)
    ry0 = jnp.clip(jnp.floor((mean_y - radius_f) / TILE).astype(jnp.int32), 0, grid_y)
    rx1 = jnp.clip(
        jnp.floor((mean_x + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x
    )
    ry1 = jnp.clip(
        jnp.floor((mean_y + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y
    )
    tiles_touched = (rx1 - rx0) * (ry1 - ry0)
    valid = valid & (tiles_touched > 0)

    radius = jnp.where(valid, radius, 0)
    tiles_touched = jnp.where(valid, tiles_touched, 0)
    return Projected(
        means2d=means2d,
        depths=depths,
        conic=conic,
        radius=radius,
        rect_min=jnp.stack([rx0, ry0], axis=-1),
        rect_max=jnp.stack([rx1, ry1], axis=-1),
        tiles_touched=tiles_touched,
    )


def mark_visible(
    means3d: jax.Array,  # (N, 3)
    cam: Camera,
) -> jax.Array:
    """(N,) bool frustum visibility — the `markVisible` public API.

    Parity with `rasterizer_impl.cu:141-153` / the wrapper's `markVisible`
    (`__init__.py:150-160`): visible iff the view-space depth clears the
    near-cull threshold (`in_frustum`, `auxiliary.h:154` — this fork checks
    z > 0.001; the commented-out NDC bound check is dead code there too).
    """
    p_view = _mm(means3d, cam.viewmatrix[:3, :3].T) + cam.viewmatrix[:3, 3]
    return p_view[:, 2] > 0.001
