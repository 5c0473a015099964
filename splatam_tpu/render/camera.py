"""Camera model for the TPU Gaussian rasterizer.

Reproduces the camera convention of the reference SplaTAM stack
(`utils/recon_helpers.py:4-27` in the reference): an OpenGL-style projection
matrix built from pinhole intrinsics, composed with a world-to-camera matrix.
The reference stores transposed matrices for its CUDA column-major kernels; we
keep plain row-major math: ``p_view = w2c @ p`` and ``p_hom = proj @ w2c @ p``.

Static quantities (image size, fov tangents) live in pytree aux data so a
``Camera`` can be passed straight through ``jax.jit``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Rasterization camera settings.

    Mirrors ``GaussianRasterizationSettings`` of the reference
    (`hessian_diff_gaussian_rasterization_w_depth/__init__.py:140-153`) minus
    torch-specific fields.
    """

    # dynamic (traced) leaves
    viewmatrix: jax.Array  # (4, 4) world-to-camera
    projmatrix: jax.Array  # (4, 4) full projection = opengl_proj @ w2c
    campos: jax.Array  # (3,) camera center in world frame
    bg: jax.Array  # (3,) background color

    # static aux data
    image_height: int = dataclasses.field(metadata=dict(static=True))
    image_width: int = dataclasses.field(metadata=dict(static=True))
    tanfovx: float = dataclasses.field(metadata=dict(static=True))
    tanfovy: float = dataclasses.field(metadata=dict(static=True))
    scale_modifier: float = dataclasses.field(default=1.0, metadata=dict(static=True))

    @property
    def focal_x(self) -> float:
        # matches `rasterize_points.cu`: focal = W / (2 tanfov)
        return self.image_width / (2.0 * self.tanfovx)

    @property
    def focal_y(self) -> float:
        return self.image_height / (2.0 * self.tanfovy)


def opengl_projection(
    w: int, h: int, fx: float, fy: float, cx: float, cy: float,
    near: float = 0.01, far: float = 100.0,
) -> np.ndarray:
    """OpenGL-style projection matrix used by the reference SLAM stack.

    Reference: `utils/recon_helpers.py:9-12`.
    """
    return np.array(
        [
            [2 * fx / w, 0.0, -(w - 2 * cx) / w, 0.0],
            [0.0, 2 * fy / h, -(h - 2 * cy) / h, 0.0],
            [0.0, 0.0, far / (far - near), -(far * near) / (far - near)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        dtype=np.float64,
    )


def setup_camera(
    w: int, h: int, k, w2c, near: float = 0.01, far: float = 100.0,
    bg: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> Camera:
    """Build a ``Camera`` from intrinsics ``k`` (3x3) and a 4x4 ``w2c``.

    Parity with `utils/recon_helpers.py:4-27`: tanfovx = w/(2 fx),
    full projection = opengl_proj @ w2c, campos = inv(w2c)[:3, 3].
    """
    k = np.asarray(k, dtype=np.float64)
    w2c_np = np.asarray(w2c, dtype=np.float64)
    fx, fy, cx, cy = k[0][0], k[1][1], k[0][2], k[1][2]
    proj = opengl_projection(w, h, fx, fy, cx, cy, near, far) @ w2c_np
    cam_center = np.linalg.inv(w2c_np)[:3, 3]
    return Camera(
        viewmatrix=jnp.asarray(w2c_np, dtype=jnp.float32),
        projmatrix=jnp.asarray(proj, dtype=jnp.float32),
        campos=jnp.asarray(cam_center, dtype=jnp.float32),
        bg=jnp.asarray(bg, dtype=jnp.float32),
        image_height=int(h),
        image_width=int(w),
        tanfovx=float(w / (2.0 * fx)),
        tanfovy=float(h / (2.0 * fy)),
    )


def replace_pose(cam: Camera, k, w2c) -> Camera:
    """Return a camera with the same intrinsics but a new extrinsic ``w2c``.

    The full projection matrix is recomputed; useful for candidate-view
    scoring where many poses share one pinhole model.
    """
    k = np.asarray(k, dtype=np.float64)
    w2c_np = np.asarray(w2c, dtype=np.float64)
    fx, fy, cx, cy = k[0][0], k[1][1], k[0][2], k[1][2]
    proj = opengl_projection(cam.image_width, cam.image_height, fx, fy, cx, cy) @ w2c_np
    cam_center = np.linalg.inv(w2c_np)[:3, 3]
    return dataclasses.replace(
        cam,
        viewmatrix=jnp.asarray(w2c_np, dtype=jnp.float32),
        projmatrix=jnp.asarray(proj, dtype=jnp.float32),
        campos=jnp.asarray(cam_center, dtype=jnp.float32),
    )
