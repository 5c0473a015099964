"""Rigid-transform and quaternion utilities.

TPU-native counterparts of `utils/slam_helpers.py:21-103,252-304` and
`utils/slam_external.py:25-42` in the reference: pure functions over arrays,
safe under jit/vmap/grad.

Quaternions are (w, x, y, z) throughout, matching the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from splatam_tpu.render.geometry import quat_to_rotmat  # re-export path


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """F.normalize parity: v / max(||v||, eps).

    The max sits INSIDE the sqrt so the gradient at v=0 is 0 instead of NaN
    (capacity-padding slots hold zero quaternions; `jnp.linalg.norm` would
    poison reverse-mode through them).
    """
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), eps * eps))
    return v / n


def quat_mult(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, (..., 4) x (..., 4). `utils/slam_helpers.py:21-28`."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4), w first.

    Branch-free re-derivation of the pytorch3d algorithm used by the
    reference (`utils/slam_helpers.py:43-103`): compute all four candidate
    quaternions and select the best-conditioned one.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    quat_candidates = quat_by_rijk / denom
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]


def pose_to_w2c(cam_rot_unnorm: jax.Array, cam_tran: jax.Array) -> jax.Array:
    """(4,) unnormalized quat + (3,) translation -> 4x4 w2c matrix."""
    q = normalize(cam_rot_unnorm.reshape(4))
    rot = quat_to_rotmat(q)
    w2c = jnp.eye(4, dtype=jnp.float32)
    w2c = w2c.at[:3, :3].set(rot)
    w2c = w2c.at[:3, 3].set(cam_tran.reshape(3))
    return w2c


def transform_to_frame(
    means3d: jax.Array,  # (N, 3) world-frame
    unnorm_rotations: jax.Array,  # (N, 4)
    cam_rot_unnorm: jax.Array,  # (4,) or (1, 4)
    cam_tran: jax.Array,  # (3,) or (1, 3)
    transform_rots: bool,
    gaussians_grad: bool = True,
    camera_grad: bool = False,
):
    """Transform Gaussians from world to camera frame.

    Parity with `utils/slam_helpers.py:252-304`: means are rigidly moved by
    the (normalized-quat, translation) camera pose; rotations are rotated by
    the camera quat only for anisotropic Gaussians. Gradient gating
    (tracking optimizes the pose only, mapping the Gaussians only) is done
    with stop_gradient, replacing torch's .detach().

    Returns (transformed_means (N,3), transformed_unnorm_rots (N,4), rel_w2c (4,4)).
    """
    cam_rot = normalize(cam_rot_unnorm.reshape(4))
    cam_t = cam_tran.reshape(3)
    if not camera_grad:
        cam_rot = jax.lax.stop_gradient(cam_rot)
        cam_t = jax.lax.stop_gradient(cam_t)
    if not gaussians_grad:
        means3d = jax.lax.stop_gradient(means3d)
        unnorm_rotations = jax.lax.stop_gradient(unnorm_rotations)

    rot = quat_to_rotmat(cam_rot)
    transformed_pts = (
        jnp.matmul(means3d, rot.T, precision=jax.lax.Precision.HIGHEST) + cam_t
    )
    if transform_rots:
        norm_rots = normalize(unnorm_rotations)
        transformed_rots = quat_mult(cam_rot[None, :], norm_rots)
    else:
        transformed_rots = unnorm_rotations

    rel_w2c = jnp.eye(4, dtype=jnp.float32)
    rel_w2c = rel_w2c.at[:3, :3].set(rot)
    rel_w2c = rel_w2c.at[:3, 3].set(cam_t)
    return transformed_pts, transformed_rots, rel_w2c


def relative_transformation(trans_01: jax.Array, trans_02: jax.Array) -> jax.Array:
    """T_1->2 = inv(T_0->1) @ T_0->2 (gradslam `geometryutils.py:413`)."""
    r01, t01 = trans_01[..., :3, :3], trans_01[..., :3, 3]
    r_inv = jnp.swapaxes(r01, -1, -2)
    t_inv = -(r_inv @ t01[..., None])[..., 0]
    out = jnp.zeros_like(trans_02)
    out = out.at[..., :3, :3].set(r_inv @ trans_02[..., :3, :3])
    out = out.at[..., :3, 3].set(
        (r_inv @ trans_02[..., :3, 3][..., None])[..., 0] + t_inv
    )
    out = out.at[..., 3, 3].set(1.0)
    return out
