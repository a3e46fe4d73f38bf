import numpy as np
import pytest

from tclight_tpu.pipeline.iclight import build_tiny_iclight
from tclight_tpu.pipeline.single_image import (
    BGSource,
    SingleImageRelighter,
    gradient_background,
)


def test_gradient_backgrounds():
    for src in BGSource:
        bg = gradient_background(8, 10, src)
        assert bg.shape == (8, 10, 3)
        assert (bg >= 0).all() and (bg <= 1).all()
    left = gradient_background(4, 8, BGSource.LEFT)
    assert left[0, 0, 0] > left[0, -1, 0]


@pytest.mark.slow
def test_fc_process(rng):
    models = build_tiny_iclight(in_channels=8, num_inference_steps=2)
    r = SingleImageRelighter(models, steps=2)
    img = rng.uniform(0.2, 0.8, (128, 128, 3)).astype(np.float32)
    out = r.process(img, "warm light", BGSource.LEFT, seed=1,
                    highres_scale=0.0, lowres_size=128)
    assert out.shape[2] == 3
    assert np.isfinite(out).all() and (out >= 0).all() and (out <= 1).all()


@pytest.mark.slow
def test_fbc_process(rng):
    models = build_tiny_iclight(in_channels=12, num_inference_steps=2)
    r = SingleImageRelighter(models, steps=2)
    fg = rng.uniform(0.2, 0.8, (128, 128, 3)).astype(np.float32)
    bg = rng.uniform(0.2, 0.8, (128, 128, 3)).astype(np.float32)
    out = r.process_bg(fg, bg, "studio light", seed=1, lowres_size=128)
    assert np.isfinite(out).all()
