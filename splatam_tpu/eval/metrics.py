"""Image-quality metrics in JAX: PSNR (reference parity), SSIM, MS-SSIM.

Replaces `calc_psnr` (`utils/slam_external.py:49-51`) and the external
`pytorch_msssim.ms_ssim` dependency (`utils/eval_helpers.py:19`, SURVEY.md
§2.4) with native implementations:

  * psnr: per-channel MSE -> 20 log10(1/sqrt(mse)), averaged over channels —
    exactly the reference's formula.
  * ms_ssim: Wang et al. 5-scale MS-SSIM, 11x11 Gaussian window sigma 1.5,
    VALID padding, 2x average-pool downsampling, standard weights —
    pytorch_msssim-compatible (relu-clamped cs terms).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """(C, H, W) pair -> scalar; per-channel PSNR averaged (reference parity)."""
    c = img1.shape[0]
    mse = jnp.mean((img1 - img2).reshape(c, -1) ** 2, axis=1)
    return jnp.mean(20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    g = jnp.array(
        [math.exp(-((x - size // 2) ** 2) / (2 * sigma**2)) for x in range(size)],
        dtype=jnp.float32,
    )
    g = g / g.sum()
    return g[:, None] @ g[None, :]


def _filter_valid(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise VALID conv of (C, H, W) with a separable (k, k) window."""
    c = x.shape[0]
    size = kernel.shape[0]
    g = kernel[:, size // 2]
    g = g / g.sum()
    kh = jnp.tile(g[None, None, :, None], (c, 1, 1, 1))
    kw = jnp.tile(g[None, None, None, :], (c, 1, 1, 1))
    y = jax.lax.conv_general_dilated(
        x[None], kh, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.lax.conv_general_dilated(
        y, kw, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )[0]


def _ssim_maps(img1, img2, kernel, data_range=1.0, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu1 = _filter_valid(img1, kernel)
    mu2 = _filter_valid(img2, kernel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter_valid(img1 * img1, kernel) - mu1_sq
    sigma2_sq = _filter_valid(img2 * img2, kernel) - mu2_sq
    sigma12 = _filter_valid(img1 * img2, kernel) - mu1_mu2
    cs = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return ssim, cs


def ssim(img1: jax.Array, img2: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Single-scale SSIM over (C, H, W), VALID padding."""
    kernel = _gaussian_kernel()
    s, _ = _ssim_maps(img1, img2, kernel, data_range)
    return s.mean()


def _avg_pool2(x: jax.Array) -> jax.Array:
    """2x2 average pool with reflect-free torch-style padding (pad if odd)."""
    c, h, w = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw)))
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID"
    ) / 4.0


def ms_ssim(
    img1: jax.Array, img2: jax.Array, data_range: float = 1.0,
    weights=MS_SSIM_WEIGHTS,
) -> jax.Array:
    """Multi-scale SSIM over (C, H, W). Needs min(H, W) > 10 * 2^4 = 160 for
    all 5 scales; fewer scales are used (weights renormalized) on small
    images so tests can run at toy sizes."""
    kernel = _gaussian_kernel()
    levels = len(weights)
    min_dim = min(img1.shape[1], img1.shape[2])
    usable = max(1, min(levels, int(math.log2(max(min_dim // 11, 1))) + 1))
    w = jnp.array(weights[:usable])
    w = w / w.sum()

    mcs = []
    x, y = img1, img2
    val = None
    for i in range(usable):
        s, cs = _ssim_maps(x, y, kernel, data_range)
        if i < usable - 1:
            mcs.append(jax.nn.relu(cs.mean()))
            x, y = _avg_pool2(x), _avg_pool2(y)
        else:
            val = jax.nn.relu(s.mean())
    terms = jnp.stack(mcs + [val])
    return jnp.prod(terms ** w)
