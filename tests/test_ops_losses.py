"""Losses vs torch/pytorch-independent oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from tclight_tpu.ops.losses import (
    l1_loss,
    l2_loss,
    psnr,
    relaxed_ms_ssim,
    ssim,
    tv_loss,
)
from tclight_tpu.ops.color import (
    RGB2SH,
    SH2RGB,
    adaptive_instance_normalization,
    calc_mean_std,
    color_correct,
)
from tclight_tpu.ops.schedules import expon_lr_schedule


def test_l1_l2():
    x = jnp.asarray([[1.0, 2.0]])
    y = jnp.asarray([[0.0, 4.0]])
    assert float(l1_loss(x, y)) == pytest.approx(1.5)
    assert float(l2_loss(x, y)) == pytest.approx(2.5)


def test_ssim_identity(rng):
    img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    val = float(ssim(jnp.asarray(img), jnp.asarray(img)))
    assert val == pytest.approx(1.0, abs=1e-5)


def test_ssim_decreases_with_noise(rng):
    img = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape).astype(np.float32), 0, 1)
    clean = float(ssim(jnp.asarray(img), jnp.asarray(img)))
    deg = float(ssim(jnp.asarray(img), jnp.asarray(noisy)))
    assert deg < clean - 0.05


def _torch_ssim(img1, img2):
    """Independent torch implementation of the same 11x11 Gaussian SSIM."""
    import torch
    import torch.nn.functional as F
    from math import exp

    window_size, channel = 11, img1.shape[-1]
    g = torch.tensor(
        [exp(-((x - 5) ** 2) / (2 * 1.5**2)) for x in range(window_size)]
    )
    g = (g / g.sum()).float()
    win = (g[:, None] @ g[None, :]).expand(channel, 1, window_size, window_size)
    a = torch.from_numpy(np.moveaxis(img1, -1, 1).copy())
    b = torch.from_numpy(np.moveaxis(img2, -1, 1).copy())
    conv = lambda z: F.conv2d(z, win, padding=5, groups=channel)
    mu1, mu2 = conv(a), conv(b)
    s1 = conv(a * a) - mu1**2
    s2 = conv(b * b) - mu2**2
    s12 = conv(a * b) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    return float(m.mean())


def test_ssim_matches_torch_oracle(rng):
    a = rng.uniform(size=(2, 24, 28, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _torch_ssim(a, b)
    assert ours == pytest.approx(ref, abs=1e-5)


def test_relaxed_ms_ssim_identity(rng):
    img = rng.uniform(size=(1, 176, 176, 3)).astype(np.float32)
    v = float(relaxed_ms_ssim(jnp.asarray(img), jnp.asarray(img), data_range=1.0))
    assert v == pytest.approx(1.0, abs=1e-4)


def test_relaxed_ms_ssim_start_level_ignores_fine_noise(rng):
    """start_level=1 skips the finest scale: high-frequency noise is much
    less penalized than at start_level=0."""
    img = rng.uniform(size=(1, 176, 176, 3)).astype(np.float32)
    noise = rng.choice([-0.2, 0.2], size=img.shape).astype(np.float32)
    noisy = np.clip(img + noise, 0, 1)
    full = float(relaxed_ms_ssim(jnp.asarray(img), jnp.asarray(noisy), data_range=1.0))
    relaxed = float(
        relaxed_ms_ssim(jnp.asarray(img), jnp.asarray(noisy), data_range=1.0, start_level=1)
    )
    assert relaxed > full


def test_relaxed_ms_ssim_small_image_raises(rng):
    img = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        relaxed_ms_ssim(jnp.asarray(img), jnp.asarray(img))


def test_tv_loss():
    # ramp image: known TV
    x = np.zeros((1, 3, 3, 1), np.float32)
    x[0, :, :, 0] = [[0, 1, 2], [0, 1, 2], [0, 1, 2]]
    # h_tv = 0; w_tv = 6 * 1 = 6; count_h = 1*2*3=6, count_w = 1*3*2=6
    val = float(tv_loss(jnp.asarray(x)))
    assert val == pytest.approx(2 * (0 / 6 + 6 / 6), abs=1e-6)


def test_psnr():
    a = jnp.zeros((1, 4, 4, 1))
    b = jnp.ones((1, 4, 4, 1)) * 0.1
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-4)


def test_sh_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(size=(5, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(SH2RGB(RGB2SH(rgb))), np.asarray(rgb), atol=1e-6)


def test_adain_transfers_stats(rng):
    content = jnp.asarray(rng.normal(2.0, 3.0, (2, 8, 8, 4)).astype(np.float32))
    style = jnp.asarray(rng.normal(-1.0, 0.5, (2, 8, 8, 4)).astype(np.float32))
    out = adaptive_instance_normalization(content, style)
    om, os_ = calc_mean_std(out)
    sm, ss = calc_mean_std(style)
    np.testing.assert_allclose(np.asarray(om), np.asarray(sm), atol=1e-4)
    np.testing.assert_allclose(np.asarray(os_), np.asarray(ss), atol=1e-3)


def test_color_correct_recovers_affine(rng):
    ref = rng.uniform(0.1, 0.9, (32, 32, 3)).astype(np.float32)
    img = np.clip(ref * 0.7 + 0.1, 0, 1).astype(np.float32)  # affine distortion
    out = np.asarray(color_correct(jnp.asarray(img), jnp.asarray(ref)))
    assert np.abs(out - ref).mean() < 0.01


def test_expon_lr_schedule():
    sched = expon_lr_schedule(0.01, 0.001, max_steps=100)
    assert float(sched(0)) == pytest.approx(0.01, rel=1e-5)
    assert float(sched(100)) == pytest.approx(0.001, rel=1e-5)
    assert float(sched(50)) == pytest.approx(np.sqrt(0.01 * 0.001), rel=1e-4)
    # delayed variant eases in
    sched_d = expon_lr_schedule(0.01, 0.001, lr_delay_steps=10, lr_delay_mult=0.1, max_steps=100)
    assert float(sched_d(0)) == pytest.approx(0.001, rel=1e-4)
