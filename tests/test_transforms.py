"""Tests for quaternion/rigid-transform utilities."""
import numpy as np
import jax.numpy as jnp

from splatam_tpu.core.transforms import (
    matrix_to_quaternion,
    normalize,
    pose_to_w2c,
    quat_mult,
    relative_transformation,
    transform_to_frame,
)
from splatam_tpu.render.geometry import quat_to_rotmat


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_orthonormal(rng):
    q = random_quats(rng, 32)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_mult_matches_rotation_composition(rng):
    q1 = random_quats(rng, 16)
    q2 = random_quats(rng, 16)
    q12 = np.asarray(quat_mult(jnp.asarray(q1), jnp.asarray(q2)))
    r1 = np.asarray(quat_to_rotmat(jnp.asarray(q1)))
    r2 = np.asarray(quat_to_rotmat(jnp.asarray(q2)))
    r12 = np.asarray(quat_to_rotmat(jnp.asarray(q12)))
    np.testing.assert_allclose(r12, np.einsum("nij,njk->nik", r1, r2), atol=1e-5)


def test_matrix_to_quaternion_roundtrip(rng):
    q = random_quats(rng, 64)
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(matrix_to_quaternion(R))
    # quaternion double cover: q and -q are the same rotation
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_transform_to_frame_rigid(rng):
    n = 20
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    rots = random_quats(rng, n)
    cam_q = random_quats(rng, 1)[0] * 2.0  # unnormalized on purpose
    cam_t = rng.normal(size=3).astype(np.float32)
    tp, tr, w2c = transform_to_frame(
        jnp.asarray(pts), jnp.asarray(rots), jnp.asarray(cam_q), jnp.asarray(cam_t),
        transform_rots=True,
    )
    # homogeneous check
    hom = np.concatenate([pts, np.ones((n, 1))], axis=-1)
    expected = (np.asarray(w2c) @ hom.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(tp), expected, atol=1e-5)
    # rotation composition check
    R_cam = np.asarray(quat_to_rotmat(jnp.asarray(normalize(jnp.asarray(cam_q)))))
    R_g = np.asarray(quat_to_rotmat(jnp.asarray(rots)))
    R_t = np.asarray(quat_to_rotmat(jnp.asarray(tr)))
    np.testing.assert_allclose(R_t, np.einsum("ij,njk->nik", R_cam, R_g), atol=1e-5)


def test_relative_transformation():
    rng = np.random.default_rng(0)
    q = random_quats(rng, 2)
    t = rng.normal(size=(2, 3)).astype(np.float32)
    T1 = np.asarray(pose_to_w2c(jnp.asarray(q[0]), jnp.asarray(t[0])))
    T2 = np.asarray(pose_to_w2c(jnp.asarray(q[1]), jnp.asarray(t[1])))
    rel = np.asarray(relative_transformation(jnp.asarray(T1), jnp.asarray(T2)))
    np.testing.assert_allclose(rel, np.linalg.inv(T1) @ T2, atol=1e-5)
