"""Color-space ops: AdaIN renormalization, SH DC transforms, quadratic color
correction.

Rebuilds utils/general_utils.py:137-156 (calc_mean_std / AdaIN — used to
match yt-plane noise statistics to the xy-plane during multi-axis denoising),
utils/sh_utils.py:114-118 (RGB2SH/SH2RGB — the Unique Video Tensor stores
degree-0 spherical-harmonic DC coefficients), and utils/loss_utils.py:213-251
(color_correct — per-channel quadratic least-squares color matching).
Layout: NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "calc_mean_std",
    "adaptive_instance_normalization",
    "RGB2SH",
    "SH2RGB",
    "color_correct",
]

C0 = 0.28209479177387814  # sqrt(1 / (4 pi)) — deg-0 SH basis constant


def calc_mean_std(
    feat: jnp.ndarray, eps: float = 1e-5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(sample, channel) spatial mean/std. feat: (N, H, W, C) ->
    (N, 1, 1, C) each. Variance is unbiased (ddof=1) to match torch."""
    n, h, w, c = feat.shape
    flat = feat.reshape(n, h * w, c)
    mean = jnp.mean(flat, axis=1)
    var = jnp.var(flat, axis=1, ddof=1) + eps
    return mean[:, None, None, :], jnp.sqrt(var)[:, None, None, :]


@jax.jit
def adaptive_instance_normalization(
    content_feat: jnp.ndarray, style_feat: jnp.ndarray
) -> jnp.ndarray:
    """AdaIN: renormalize content statistics to style statistics
    (general_utils.py:148-156)."""
    style_mean, style_std = calc_mean_std(style_feat)
    content_mean, content_std = calc_mean_std(content_feat)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std + style_mean


def RGB2SH(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / C0


def SH2RGB(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5


@functools.partial(jax.jit, static_argnames=("num_iters",))
def color_correct(
    img: jnp.ndarray, ref: jnp.ndarray, num_iters: int = 5, eps: float = 0.5 / 255
) -> jnp.ndarray:
    """Warp `img`'s colors to match `ref` with a per-channel quadratic
    least-squares fit over unclipped pixels (loss_utils.py:213-251).

    img/ref: (..., C) in [0, 1]."""
    num_channels = img.shape[-1]
    img_mat = img.reshape(-1, num_channels)
    ref_mat = ref.reshape(-1, num_channels)

    def is_unclipped(z):
        return (z >= eps) & (z <= 1 - eps)

    mask0 = is_unclipped(img_mat)

    def features(m):
        cols = [m[:, c : c + 1] * m[:, c:] for c in range(num_channels)]
        cols.append(m)
        cols.append(jnp.ones_like(m[:, :1]))
        return jnp.concatenate(cols, axis=-1)

    def body(_, mat):
        a_mat = features(mat)
        warps = []
        for c in range(num_channels):
            b = ref_mat[:, c]
            mask = mask0[:, c] & is_unclipped(mat[:, c]) & is_unclipped(b)
            ma = jnp.where(mask[:, None], a_mat, 0.0)
            mb = jnp.where(mask, b, 0.0)
            # least squares via normal equations w/ small ridge for stability
            gram = ma.T @ ma + 1e-8 * jnp.eye(ma.shape[1], dtype=ma.dtype)
            w = jnp.linalg.solve(gram, ma.T @ mb)
            warps.append(w)
        warp = jnp.stack(warps, axis=-1)
        return jnp.clip(a_mat @ warp, 0.0, 1.0)

    img_mat = jax.lax.fori_loop(0, num_iters, body, img_mat)
    return img_mat.reshape(img.shape)
