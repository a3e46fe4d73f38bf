"""Image resampling primitives: bilinear / bicubic sampling at arbitrary
pixel coordinates with zero padding.

TPU-native equivalent of ``torch.nn.functional.grid_sample`` as used by the
reference's flow warper (utils/flow_utils.py:5-16: bicubic, padding_mode
'zeros', align_corners=True). Everything is NHWC (XLA's preferred conv/image
layout on TPU) and implemented with static-shape gathers that XLA lowers to
efficient dynamic-gathers; no data-dependent control flow.

Coordinates are in *pixel* space: ``coords[..., 0] = x`` (column),
``coords[..., 1] = y`` (row). The reference normalizes to [-1, 1] and back
(flow_utils.py:9-14); with align_corners=True that round-trip is the
identity, so we sample in pixel space directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["bilinear_sample", "bicubic_sample", "grid_sample_2d"]


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather img[(iy, ix)] with zero padding for out-of-bounds indices.

    img: (H, W, C); iy/ix: int32 arrays of identical shape S -> (S..., C).
    """
    H, W = img.shape[0], img.shape[1]
    valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    iy_c = jnp.clip(iy, 0, H - 1)
    ix_c = jnp.clip(ix, 0, W - 1)
    vals = img[iy_c, ix_c]
    return jnp.where(valid[..., None], vals, 0.0)


def _bilinear_hw(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    v00 = _gather_hw(img, iy0, ix0)
    v01 = _gather_hw(img, iy0, ix0 + 1)
    v10 = _gather_hw(img, iy0 + 1, ix0)
    v11 = _gather_hw(img, iy0 + 1, ix0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _cubic_weights(t: jnp.ndarray, a: float = -0.75) -> tuple[jnp.ndarray, ...]:
    """Cubic-convolution weights for taps at offsets (-1, 0, 1, 2) relative
    to floor(x); `a=-0.75` matches torch's bicubic."""
    # Keys (1981) cubic convolution kernel:
    #   |s|<=1: (a+2)|s|^3 - (a+3)|s|^2 + 1
    #   1<|s|<2: a|s|^3 - 5a|s|^2 + 8a|s| - 4a
    s0 = 1.0 + t  # distance to tap -1   (in (1, 2])
    s1 = t        # distance to tap 0    (in [0, 1))
    s2 = 1.0 - t  # distance to tap +1   (in (0, 1])
    s3 = 2.0 - t  # distance to tap +2   (in (1, 2])

    def near(s):
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def far(s):
        return (((s - 5.0) * s + 8.0) * s - 4.0) * a

    return far(s0), near(s1), near(s2), far(s3)


def _bicubic_hw(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    wx = _cubic_weights(tx)
    wy = _cubic_weights(ty)
    out = None
    for j, wyj in enumerate(wy):
        row = None
        for i, wxi in enumerate(wx):
            v = _gather_hw(img, iy0 + (j - 1), ix0 + (i - 1))
            contrib = v * wxi[..., None]
            row = contrib if row is None else row + contrib
        contrib = row * wyj[..., None]
        out = contrib if out is None else out + contrib
    return out


@functools.partial(jax.jit, static_argnames=("mode",))
def grid_sample_2d(
    images: jnp.ndarray, coords: jnp.ndarray, mode: str = "bicubic"
) -> jnp.ndarray:
    """Sample `images` (N, H, W, C) at pixel `coords` (N, Ho, Wo, 2) [x, y].

    Zero padding outside the image; `mode` in {'bilinear', 'bicubic'}.
    Matches torch grid_sample(..., padding_mode='zeros', align_corners=True)
    on coords normalized the reference's way (flow_utils.py:9-14).
    """
    fn = {"bilinear": _bilinear_hw, "bicubic": _bicubic_hw}[mode]
    return jax.vmap(lambda im, c: fn(im, c[..., 0], c[..., 1]))(images, coords)


def bilinear_sample(images: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    return grid_sample_2d(images, coords, mode="bilinear")


def bicubic_sample(images: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    return grid_sample_2d(images, coords, mode="bicubic")


def identity_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) grid of pixel coordinates [x, y]."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    return jnp.stack([xs, ys], axis=-1)
