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


def test_hed_parity_with_torch_replica(rng):
    """ControlNetHED vs a torch replica of the controlnet_aux network."""
    import torch
    import torch.nn as nn_t
    import torch.nn.functional as F
    import jax.numpy as jnp

    from tclight_tpu.models.hed import ControlNetHED, convert_hed, hed_edges

    plan = ((3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3),
            (512, 512, 3))
    mult = 0.125

    class DoubleConvBlock(nn_t.Module):
        def __init__(self, inp, out, layers):
            super().__init__()
            self.convs = nn_t.ModuleList()
            self.convs.append(nn_t.Conv2d(inp, out, 3, 1, 1))
            for _ in range(layers - 1):
                self.convs.append(nn_t.Conv2d(out, out, 3, 1, 1))
            self.projection = nn_t.Conv2d(out, 1, 1)

        def forward(self, x, down=False):
            if down:
                x = F.max_pool2d(x, 2, 2)
            for c in self.convs:
                x = F.relu(c(x))
            return x, self.projection(x)

    class HEDRef(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.norm = nn_t.Parameter(torch.zeros(1, 3, 1, 1))
            szs = [(max(1, int(i * mult)) if i != 3 else 3,
                    max(1, int(o * mult)), l) for i, o, l in plan]
            for bi, (i, o, l) in enumerate(szs, start=1):
                setattr(self, f"block{bi}", DoubleConvBlock(i, o, l))

        def forward(self, x):
            h = x - self.norm
            outs = []
            for bi in range(1, 6):
                h, p = getattr(self, f"block{bi}")(h, down=bi > 1)
                outs.append(p)
            return outs

    torch.manual_seed(0)
    ref = HEDRef().eval()
    with torch.no_grad():
        ref.norm += torch.rand(1, 3, 1, 1) * 100
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_hed(sd)
    model = ControlNetHED(width_mult=mult)

    imgs = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        refs = ref(torch.from_numpy(np.moveaxis(imgs * 255.0, -1, 1).copy()))
    ours = model.apply(params, jnp.asarray(imgs * 255.0))
    for o, r in zip(ours, refs):
        np.testing.assert_allclose(
            np.asarray(o)[..., 0], r.numpy()[:, 0], atol=2e-2, rtol=1e-4)

    edges = hed_edges(model, params, imgs)
    assert edges.shape == (2, 32, 32)
    assert (edges >= 0).all() and (edges <= 1).all()
