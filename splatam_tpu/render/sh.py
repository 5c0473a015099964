"""Spherical-harmonics (deg <= 3) view-dependent color evaluation.

Parity with the reference rasterizer's `computeColorFromSH`
(`cuda_rasterizer/forward.cu:20-71`, constants `auxiliary.h:22-39`): the
view direction is the normalized (mean - campos), the DC band is offset by
+0.5 and the result clamped at 0 (gradients gate through the clamp, which
XLA autodiff reproduces exactly — `backward.cu:107-121` zeroes dL/dRGB where
the forward clamped, as `jnp.maximum(x, 0)` does).

Evaluated per Gaussian BEFORE tile binning (the color is constant across the
pixels of one view), so the rasterizer's feature path is unchanged — this
runs as plain vectorized XLA, not inside the Pallas kernels, exactly like
the reference runs it in its preprocess (not render) kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(
    degree: int,
    shs: jax.Array,  # (N, K, 3) with K >= (degree+1)^2
    means3d: jax.Array,  # (N, 3) in the same frame as campos
    campos: jax.Array,  # (3,)
) -> jax.Array:
    """(N, 3) RGB from SH coefficients at the per-Gaussian view direction."""
    if not 0 <= degree <= 3:
        raise ValueError(f"sh degree must be 0..3, got {degree}")
    need = num_sh_coeffs(degree)
    if shs.shape[1] < need:
        raise ValueError(
            f"degree {degree} needs {need} coefficients, shs has {shs.shape[1]}"
        )
    d = means3d - campos[None, :]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]

    result = SH_C0 * shs[:, 0]
    if degree > 0:
        result = (
            result
            - SH_C1 * y * shs[:, 1]
            + SH_C1 * z * shs[:, 2]
            - SH_C1 * x * shs[:, 3]
        )
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (
            result
            + SH_C2[0] * xy * shs[:, 4]
            + SH_C2[1] * yz * shs[:, 5]
            + SH_C2[2] * (2.0 * zz - xx - yy) * shs[:, 6]
            + SH_C2[3] * xz * shs[:, 7]
            + SH_C2[4] * (xx - yy) * shs[:, 8]
        )
    if degree > 2:
        result = (
            result
            + SH_C3[0] * y * (3.0 * xx - yy) * shs[:, 9]
            + SH_C3[1] * xy * z * shs[:, 10]
            + SH_C3[2] * y * (4.0 * zz - xx - yy) * shs[:, 11]
            + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * shs[:, 12]
            + SH_C3[4] * x * (4.0 * zz - xx - yy) * shs[:, 13]
            + SH_C3[5] * z * (xx - yy) * shs[:, 14]
            + SH_C3[6] * x * (xx - 3.0 * yy) * shs[:, 15]
        )
    # +0.5 offset then clamp at 0 (`forward.cu:64-70`); jnp.maximum's grad
    # reproduces the reference's clamped-gradient gating (`backward.cu:107`)
    return jnp.maximum(result + 0.5, 0.0)


def rgb_to_sh_dc(rgb: jax.Array) -> jax.Array:
    """Inverse of the DC band: the Inria PLY convention (rgb - 0.5) / C0."""
    return (rgb - 0.5) / SH_C0


def sh_dc_to_rgb(dc: jax.Array) -> jax.Array:
    return dc * SH_C0 + 0.5
