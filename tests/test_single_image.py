import numpy as np
import pytest

from tclight_tpu.pipeline.iclight import build_tiny_iclight
from tclight_tpu.pipeline.single_image import (
    BGSource,
    BGSourceFBC,
    SingleImageRelighter,
    fbc_background,
    gradient_background,
    normals_from_relights,
    resize_and_center_crop,
)


def test_gradient_backgrounds():
    for src in BGSource:
        bg = gradient_background(8, 10, src)
        assert bg.shape == (8, 10, 3)
        assert (bg >= 0).all() and (bg <= 1).all()
    left = gradient_background(4, 8, BGSource.LEFT)
    # full-range ramp like the reference's linspace(255, 0)
    assert left[0, 0, 0] == pytest.approx(1.0)
    assert left[0, -1, 0] == pytest.approx(0.0)


def test_fbc_backgrounds(rng):
    up = rng.uniform(0, 1, (8, 10, 3)).astype(np.float32)
    assert np.array_equal(fbc_background(8, 10, BGSourceFBC.UPLOAD, up), up)
    assert np.array_equal(
        fbc_background(8, 10, BGSourceFBC.UPLOAD_FLIP, up), np.fliplr(up))
    grey = fbc_background(8, 10, BGSourceFBC.GREY)
    assert grey == pytest.approx(64.0 / 255.0)
    # gradients span the reference's 224..32 uint8 range
    left = fbc_background(8, 10, BGSourceFBC.LEFT)
    assert left[0, 0, 0] == pytest.approx(224.0 / 255.0)
    assert left[0, -1, 0] == pytest.approx(32.0 / 255.0)
    for src in (BGSourceFBC.RIGHT, BGSourceFBC.TOP, BGSourceFBC.BOTTOM):
        bg = fbc_background(8, 10, src)
        assert bg.shape == (8, 10, 3)
        assert bg.min() == pytest.approx(32.0 / 255.0)
        assert bg.max() == pytest.approx(224.0 / 255.0)


def test_resize_and_center_crop(rng):
    img = rng.uniform(0, 1, (64, 32, 3)).astype(np.float32)
    out = resize_and_center_crop(img, 16, 16)
    assert out.shape == (16, 16, 3)
    # aspect preserved: the tall input is cropped vertically, so the crop
    # must come from the resized 16x32, centered
    out2 = resize_and_center_crop(img, 32, 16)
    assert out2.shape == (16, 32, 3)


def test_normals_from_relights(rng):
    h, w = 12, 10
    base = rng.uniform(0.3, 0.7, (h, w, 3)).astype(np.float32)
    matting = np.ones((h, w, 1), np.float32)
    normal, ratios = normals_from_relights(base, base, base, base, matting)
    assert normal.shape == (h, w, 3)
    # identical lights -> flat normal pointing at the camera
    assert normal[..., :2] == pytest.approx(0.0, abs=1e-5)
    assert normal[..., 2] == pytest.approx(1.0, abs=1e-5)
    assert len(ratios) == 4
    # outside the matte the normal is forced to (0, 0, 1)
    normal0, _ = normals_from_relights(
        base * 1.2, base, base, base, np.zeros((h, w, 1), np.float32))
    assert normal0[..., 2] == pytest.approx(1.0, abs=1e-5)


@pytest.mark.slow
def test_fc_process(rng):
    models = build_tiny_iclight(in_channels=8, num_inference_steps=2)
    r = SingleImageRelighter(models, steps=2)
    img = rng.uniform(0.2, 0.8, (128, 128, 3)).astype(np.float32)
    # LEFT routes through the img2img lowres pass (initial-latent steering)
    out = r.process(img, "warm light", BGSource.LEFT, seed=1,
                    highres_scale=0.0, lowres_size=128)
    assert out.shape[2] == 3
    assert np.isfinite(out).all() and (out >= 0).all() and (out <= 1).all()
    # NONE routes through the t2i pass + highres img2img
    out2 = r.process(img, "warm light", BGSource.NONE, seed=1,
                     highres_scale=1.5, lowres_size=128)
    assert np.isfinite(out2).all()
    assert out2.shape[0] == 192  # 128 * 1.5 rounded to /64


@pytest.mark.slow
def test_fbc_process(rng):
    models = build_tiny_iclight(in_channels=12, num_inference_steps=2)
    r = SingleImageRelighter(models, steps=2)
    fg = rng.uniform(0.2, 0.8, (128, 128, 3)).astype(np.float32)
    bg = rng.uniform(0.2, 0.8, (128, 128, 3)).astype(np.float32)
    out = r.process_bg(fg, bg, "studio light", seed=1, lowres_size=128,
                       highres_scale=0.0)
    assert np.isfinite(out).all()
    # gradient background source needs no upload; flipped upload flips
    out2 = r.process_bg(fg, None, "studio light", BGSourceFBC.LEFT, seed=1,
                        lowres_size=128, highres_scale=0.0)
    assert np.isfinite(out2).all()


@pytest.mark.slow
def test_fbc_highres_pass(rng):
    models = build_tiny_iclight(in_channels=12, num_inference_steps=2)
    r = SingleImageRelighter(models, steps=2)
    fg = rng.uniform(0.2, 0.8, (128, 128, 3)).astype(np.float32)
    bg = rng.uniform(0.2, 0.8, (128, 128, 3)).astype(np.float32)
    out = r.process_bg(fg, bg, "studio light", seed=1, lowres_size=128,
                       highres_scale=1.5)
    assert out.shape[0] == 192
    assert np.isfinite(out).all()
