"""Lineart-anime annotator parity vs a torch pix2pix UnetGenerator replica
(the architecture behind controlnet_aux's LineartAnimeDetector /
Anime2Sketch netG.pth; reference lineart_anime_prepreocess,
utils/VidToMe/controlnet_utils.py:75-77), random weights through
convert_lineart_anime — validates the recursive Sequential key walk, the
ConvTranspose kernel layout, and the norm/skip plumbing end to end."""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tclight_tpu.models.lineart import (  # noqa: E402
    LineartAnimeUNet, convert_lineart_anime, lineart_anime_map)


class _SkipBlock(tnn.Module):
    """pix2pix UnetSkipConnectionBlock with
    InstanceNorm2d(affine=False) — bias convs, param-free norms."""

    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False):
        super().__init__()
        self.outermost = outermost
        if input_nc is None:
            input_nc = outer_nc
        norm = lambda ch: tnn.InstanceNorm2d(ch, affine=False)  # noqa: E731
        downconv = tnn.Conv2d(input_nc, inner_nc, 4, 2, 1, bias=True)
        downrelu = tnn.LeakyReLU(0.2, True)
        uprelu = tnn.ReLU(True)
        if outermost:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
            model = [downconv, submodule, uprelu, upconv, tnn.Tanh()]
        elif innermost:
            upconv = tnn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1,
                                         bias=True)
            model = [downrelu, downconv, uprelu, upconv, norm(outer_nc)]
        else:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1,
                                         bias=True)
            model = [downrelu, downconv, norm(inner_nc), submodule,
                     uprelu, upconv, norm(outer_nc)]
        self.model = tnn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


class _UnetGenerator(tnn.Module):
    def __init__(self, input_nc=3, output_nc=1, num_downs=8, ngf=64):
        super().__init__()
        block = _SkipBlock(ngf * 8, ngf * 8, innermost=True)
        for _ in range(num_downs - 5):
            block = _SkipBlock(ngf * 8, ngf * 8, submodule=block)
        block = _SkipBlock(ngf * 4, ngf * 8, submodule=block)
        block = _SkipBlock(ngf * 2, ngf * 4, submodule=block)
        block = _SkipBlock(ngf, ngf * 2, submodule=block)
        self.model = _SkipBlock(output_nc, ngf, input_nc=input_nc,
                                submodule=block, outermost=True)

    def forward(self, x):
        return self.model(x)


@pytest.mark.parametrize("ngf,num_downs,size", [(8, 8, 256), (8, 6, 64)])
def test_lineart_anime_network_parity(ngf, num_downs, size, rng):
    torch.manual_seed(0)
    net = _UnetGenerator(ngf=ngf, num_downs=num_downs).eval()
    with torch.no_grad():
        for p in net.parameters():
            p.normal_(0.0, 0.08)

    x = rng.normal(size=(2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    model = LineartAnimeUNet(ngf=ngf, num_downs=num_downs)
    params = convert_lineart_anime(sd, num_downs=num_downs)
    import jax.numpy as jnp

    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_lineart_map_shape_and_range(rng):
    torch.manual_seed(1)
    net = _UnetGenerator(ngf=8, num_downs=6).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    model = LineartAnimeUNet(ngf=8, num_downs=6)
    params = convert_lineart_anime(sd, num_downs=6)
    frames = rng.uniform(0, 1, (2, 40, 56, 3)).astype(np.float32)
    # num_downs=6 needs multiples of 64; lineart_anime_map pads to 256
    m = lineart_anime_map(model, params, frames)
    assert m.shape == (2, 40, 56)
    assert m.min() >= 0.0 and m.max() <= 1.0
