"""Reconstruction losses: L1/L2, SSIM, relaxed multi-scale SSIM, TV, PSNR.

TPU-native rebuild of utils/loss_utils.py (l1/l2 :25-29, ssim :41-71,
_relaxed_ssim/relaxed_ms_ssim :73-211, TVLoss :324-340). Numerics follow the
reference exactly (same Gaussian windows, same valid-conv MS-SSIM pyramid
with `start_level` skipping of fine scales, same odd-size avg-pool padding),
so the optimization objectives match for metric parity.

Layout: images are NHWC float in [0, data_range].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ["l1_loss", "l2_loss", "ssim", "relaxed_ms_ssim", "tv_loss", "psnr"]

_MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def _gauss_1d(size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(xs**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _depthwise_conv(
    x: jnp.ndarray, kernel: jnp.ndarray, padding
) -> jnp.ndarray:
    """x: (N, H, W, C); kernel: (kh, kw); depthwise conv, zero padding."""
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel[..., None, None], kernel.shape + (1, c))
    return jax.lax.conv_general_dilated(
        x,
        k.astype(x.dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _separable_gauss(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Valid-padding separable Gaussian (pytorch_msssim.gaussian_filter)."""
    x = _depthwise_conv(x, win[:, None], padding="VALID")
    x = _depthwise_conv(x, win[None, :], padding="VALID")
    return x


@functools.partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM with a 2-D Gaussian window and SAME padding (loss_utils.py:41-71).

    img1/img2: (N, H, W, C) in [0, 1]."""
    win1d = _gauss_1d(window_size, 1.5)
    win2d = win1d[:, None] * win1d[None, :]
    pad = window_size // 2
    padding = ((pad, pad), (pad, pad))

    conv = lambda z: _depthwise_conv(z, win2d, padding)
    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def _relaxed_ssim_level(
    x: jnp.ndarray,
    y: jnp.ndarray,
    win: jnp.ndarray,
    data_range: float,
    k: tuple[float, float],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2
    mu1 = _separable_gauss(x, win)
    mu2 = _separable_gauss(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _separable_gauss(x * x, win) - mu1_sq
    sigma2_sq = _separable_gauss(y * y, win) - mu2_sq
    sigma12 = _separable_gauss(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = (2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1) * cs_map
    # flatten spatial -> per (batch, channel)
    return jnp.mean(ssim_map, axis=(1, 2)), jnp.mean(cs_map, axis=(1, 2))


def _avg_pool2_torch(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """torch F.avg_pool2d(kernel=2, padding=(ph, pw), count_include_pad=True)
    on NHWC input."""
    x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return summed / 4.0


@functools.partial(
    jax.jit,
    static_argnames=("start_level", "data_range", "size_average", "win_size", "win_sigma"),
)
def relaxed_ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    start_level: int = 0,
    data_range: float = 255.0,
    size_average: bool = True,
    win_size: int = 11,
    win_sigma: float = 1.5,
    weights: tuple[float, ...] = _MS_SSIM_WEIGHTS,
    k: tuple[float, float] = (0.01, 0.03),
) -> jnp.ndarray:
    """MS-SSIM with `start_level` skipping of fine scales
    (loss_utils.py:125-211): levels below `start_level` contribute identity
    (ones), so the loss only constrains coarse structure — used by both
    post-optimization stages with start_level=1 (generate.py:416,510).

    x/y: (N, H, W, C); the smaller spatial side must exceed
    (win_size-1)*16 = 160 at the default window."""
    if x.shape != y.shape:
        raise ValueError(f"shape mismatch {x.shape} vs {y.shape}")
    smaller = min(x.shape[1], x.shape[2])
    needed = (win_size - 1) * 2 ** (len(weights) - 1)
    if smaller <= needed:
        raise ValueError(
            f"image side {smaller} too small for {len(weights)}-level ms-ssim "
            f"(needs > {needed})"
        )
    win = _gauss_1d(win_size, win_sigma)
    weights_arr = jnp.asarray(weights, dtype=x.dtype)
    levels = len(weights)

    mcs = []
    ssim_pc = None
    for i in range(levels):
        if i >= start_level:
            ssim_pc, cs = _relaxed_ssim_level(x, y, win, data_range, k)
        else:
            ssim_pc = jnp.ones(x.shape[:1] + x.shape[-1:], dtype=x.dtype)
            cs = jnp.ones_like(ssim_pc)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool2_torch(x, x.shape[1] % 2, x.shape[2] % 2)
            y = _avg_pool2_torch(y, y.shape[1] % 2, y.shape[2] % 2)

    stack = jnp.stack(mcs + [jax.nn.relu(ssim_pc)], axis=0)  # (L, N, C)
    val = jnp.prod(stack ** weights_arr[:, None, None], axis=0)
    if size_average:
        return jnp.mean(val)
    return jnp.mean(val, axis=1)


@jax.jit
def tv_loss(x: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Total-variation loss (loss_utils.py:324-340). x: (N, H, W, C)."""
    n, h, w, c = x.shape
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, : h - 1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, : w - 1, :]) ** 2)
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / n


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))
