import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.data.controlnet_utils import (
    CONTROLNET_DICT,
    control_preprocess,
)
from tclight_tpu.models.vgg_lpips import (
    LPIPS,
    VGG16Features,
    VGGPerceptualLoss,
    convert_vgg16_features,
)


def test_controlnet_registry_and_canny(rng):
    assert set(CONTROLNET_DICT) >= {"tile", "canny", "depth", "openpose"}
    frames = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    edges = control_preprocess(frames, "canny")
    assert edges.shape == frames.shape
    assert set(np.unique(edges)).issubset({0.0, 1.0})
    tiles = control_preprocess(frames, "tile")
    np.testing.assert_allclose(tiles, frames)
    with pytest.raises(NotImplementedError):
        control_preprocess(frames, "depth")
    with pytest.raises(KeyError):
        control_preprocess(frames, "bogus")


@pytest.mark.slow
def test_vgg_features_and_losses(rng):
    model = VGG16Features()
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert len(feats) == 5
    assert feats[0].shape == (1, 64, 64, 64)
    assert feats[-1].shape[-1] == 512

    loss = VGGPerceptualLoss(variables)
    same = float(loss(x, x))
    assert same == pytest.approx(0.0, abs=1e-6)
    y = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    assert float(loss(x, y)) > 0.01

    lin = [np.ones(c, np.float32) for c in (64, 128, 256, 512, 512)]
    lp = LPIPS(variables, lin)
    d_same = lp(x, x)
    d_diff = lp(x, y)
    assert d_same[0] == pytest.approx(0.0, abs=1e-5)
    assert d_diff[0] > d_same[0]


def test_vgg_converter_structure():
    # synthesize a torchvision-style features state dict
    sd = {}
    layer_idx = 0
    from tclight_tpu.models.vgg_lpips import _VGG16_PLAN

    in_ch = 3
    for item in _VGG16_PLAN:
        if item == "M":
            layer_idx += 1
            continue
        sd[f"features.{layer_idx}.weight"] = np.zeros((item, in_ch, 3, 3), np.float32)
        sd[f"features.{layer_idx}.bias"] = np.zeros((item,), np.float32)
        in_ch = item
        layer_idx += 2
    params = convert_vgg16_features(sd)["params"]
    assert params["conv_0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["conv_12"]["kernel"].shape == (3, 3, 512, 512)
