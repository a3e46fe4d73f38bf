"""Resampling vs torch.grid_sample (CPU oracle) + closed-form checks."""

import numpy as np
import pytest
import jax.numpy as jnp

from tclight_tpu.ops.resample import (
    bicubic_sample,
    bilinear_sample,
    grid_sample_2d,
    identity_grid,
)


def _torch_grid_sample(images_nhwc, coords, mode):
    import torch
    import torch.nn.functional as F

    n, h, w, c = images_nhwc.shape
    imgs = torch.from_numpy(np.moveaxis(images_nhwc, -1, 1).copy())
    gx = coords[..., 0] / (w - 1) * 2 - 1
    gy = coords[..., 1] / (h - 1) * 2 - 1
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1).astype(np.float32))
    out = F.grid_sample(
        imgs, grid, mode=mode, padding_mode="zeros", align_corners=True
    )
    return np.moveaxis(out.numpy(), 1, -1)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_matches_torch(rng, mode):
    n, h, w, c = 2, 13, 17, 3
    imgs = rng.standard_normal((n, h, w, c)).astype(np.float32)
    coords = np.stack(
        [
            rng.uniform(-2, w + 1, (n, h, w)),
            rng.uniform(-2, h + 1, (n, h, w)),
        ],
        axis=-1,
    ).astype(np.float32)
    ours = np.asarray(grid_sample_2d(jnp.asarray(imgs), jnp.asarray(coords), mode=mode))
    ref = _torch_grid_sample(imgs, coords, mode)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_identity_sampling(rng):
    imgs = rng.standard_normal((1, 8, 9, 2)).astype(np.float32)
    grid = identity_grid(8, 9)[None]
    out = np.asarray(bilinear_sample(jnp.asarray(imgs), grid))
    np.testing.assert_allclose(out, imgs, atol=1e-6)
    out_c = np.asarray(bicubic_sample(jnp.asarray(imgs), grid))
    np.testing.assert_allclose(out_c, imgs, atol=1e-5)


def test_integer_shift():
    img = np.zeros((1, 6, 6, 1), np.float32)
    img[0, 2, 3, 0] = 1.0
    grid = np.asarray(identity_grid(6, 6))[None].copy()
    grid[..., 0] += 1.0  # sample at x+1 => shifts content left
    out = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(grid)))
    assert out[0, 2, 2, 0] == pytest.approx(1.0)
    assert out[0, 2, 3, 0] == pytest.approx(0.0)


def test_zero_padding_outside():
    img = np.ones((1, 4, 4, 1), np.float32)
    coords = np.full((1, 1, 2, 2), -10.0, np.float32)
    for mode in ("bilinear", "bicubic"):
        out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords), mode=mode))
        np.testing.assert_allclose(out, 0.0, atol=1e-7)
