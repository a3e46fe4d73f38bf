"""Lineart-anime annotator in Flax (controlnet_aux `lineart_anime` — the
reference's `lineart_anime_prepreocess`, utils/VidToMe/controlnet_utils.py
:75-77).

The network is Anime2Sketch's pix2pix `UnetGenerator(3, 1, num_downs=8,
ngf=64, norm_layer=InstanceNorm2d(affine=False), use_dropout=False)`:
a recursive U-Net of stride-2 4x4 convs down and 4x4 transposed convs up
with skip concatenation, LeakyReLU(0.2) on the way down, ReLU up, Tanh
head. InstanceNorm carries no parameters (affine=False), so the
checkpoint (netG.pth) is pure conv weights in the nested
`model.model.{i}...` Sequential layout — `convert_lineart_anime` walks
that recursion.

Annotator contract (controlnet_aux lineart_anime.py): resize input up to
the next multiple of 256 (cubic), feed x/127.5 - 1, take channel 0,
map y*127.5+127.5, resize back, clip to uint8 — dark lines on white.
"""

from __future__ import annotations

from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LineartAnimeUNet", "convert_lineart_anime", "lineart_anime_map",
           "lineart_model_fn"]


def _instance_norm(x):
    # InstanceNorm2d(affine=False, track_running_stats=False), eps 1e-5
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)


class _Down(nn.Module):
    ch: int
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.ch, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), name="conv")(x)
        return _instance_norm(x) if self.norm else x


class _Up(nn.Module):
    ch: int
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        # torch ConvTranspose2d(k=4, s=2, p=1): SAME-ish upsample x2
        # SAME == torch ConvTranspose2d(k=4, s=2, p=1) (verified vs torch)
        x = nn.ConvTranspose(self.ch, (4, 4), strides=(2, 2),
                             padding="SAME",
                             transpose_kernel=True, name="conv")(x)
        return _instance_norm(x) if self.norm else x


class LineartAnimeUNet(nn.Module):
    """__call__(x (B, H, W, 3) in [-1, 1], H/W multiples of 256) ->
    (B, H, W, 1) in [-1, 1]."""

    ngf: int = 64
    num_downs: int = 8

    @nn.compact
    def __call__(self, x):
        g = self.ngf
        # channel plan outermost->innermost
        downs = [g, g * 2, g * 4] + [g * 8] * (self.num_downs - 3)
        skips = []
        h = nn.Conv(downs[0], (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), name="down0")(x)
        skips.append(h)
        for i, ch in enumerate(downs[1:], start=1):
            # inner blocks: LeakyReLU -> conv -> norm (innermost: no norm)
            h = _Down(ch, norm=(i < self.num_downs - 1),
                      name=f"down{i}")(h)
            if i < self.num_downs - 1:
                skips.append(h)
        # up path: innermost block has no input concat
        ups = list(reversed(downs[:-1]))  # channels after each up conv
        for i, ch in enumerate(ups):
            h = _Up(ch, name=f"up{i}")(h)
            h = jnp.concatenate([skips[-(i + 1)], h], axis=-1)
        h = nn.relu(h)
        h = nn.ConvTranspose(1, (4, 4), strides=(2, 2),
                             padding="SAME",
                             transpose_kernel=True, name="head")(h)
        return jnp.tanh(h)


def _tk(w):
    """torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _tkt(w):
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax
    transpose_kernel=True layout (kh, kw, out, in)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_lineart_anime(sd: Mapping[str, np.ndarray],
                          num_downs: int = 8) -> dict:
    """netG.pth (pix2pix UnetSkipConnectionBlock recursion) -> params.

    torch Sequential indices per block:
      outermost: [0]=downconv  [1]=submodule [3]=upconv(head)
      middle:    [1]=downconv  [3]=submodule [5]=upconv
      innermost: [1]=downconv  [3]=upconv
    """
    sd = {k.removeprefix("module."): np.asarray(v) for k, v in sd.items()}
    p: dict = {}

    prefix = "model."
    # outermost
    p["down0"] = {"kernel": _tk(sd[prefix + "model.0.weight"]),
                  "bias": np.asarray(sd[prefix + "model.0.bias"])}
    p["head"] = {"kernel": _tkt(sd[prefix + "model.3.weight"]),
                 "bias": np.asarray(sd[prefix + "model.3.bias"])}
    prefix += "model.1."
    for i in range(1, num_downs):
        inner = i == num_downs - 1
        up_idx = 3 if inner else 5
        p[f"down{i}"] = {"conv": {
            "kernel": _tk(sd[prefix + "model.1.weight"]),
            "bias": np.asarray(sd[prefix + "model.1.bias"])}}
        p[f"up{num_downs - 1 - i}"] = {"conv": {
            "kernel": _tkt(sd[prefix + f"model.{up_idx}.weight"]),
            "bias": np.asarray(sd[prefix + f"model.{up_idx}.bias"])}}
        prefix += "model.3." if not inner else ""
    return {"params": p}


def lineart_anime_map(model: LineartAnimeUNet, params, frames: np.ndarray,
                      batch: int = 2) -> np.ndarray:
    """frames (N, H, W, 3) [0,1] -> lineart maps (N, H, W) [0,1]
    (controlnet_aux pre/post: pad-to-256-multiple via cubic resize,
    x*2-1 feed, y/2+0.5 out, resize back)."""
    import cv2

    n, h, w, _ = frames.shape
    h2 = 256 * int(np.ceil(h / 256.0))
    w2 = 256 * int(np.ceil(w / 256.0))
    fn = jax.jit(lambda p, x: model.apply(p, x))
    out = np.zeros((n, h, w), np.float32)
    for i in range(0, n, batch):
        chunk = frames[i:i + batch]
        big = np.stack([
            cv2.resize(f, (w2, h2), interpolation=cv2.INTER_CUBIC)
            for f in chunk
        ])
        y = np.asarray(fn(params, jnp.asarray(big * 2.0 - 1.0)))[..., 0]
        y = (y + 1.0) / 2.0
        for j, m in enumerate(y):
            out[i + j] = cv2.resize(m, (w, h),
                                    interpolation=cv2.INTER_CUBIC)
    return np.clip(out, 0.0, 1.0)


def lineart_model_fn(ckpt_path, ngf: int = 64, num_downs: int = 8):
    """Generator hook: ckpt (netG.pth or .safetensors) -> model_fn for
    control_preprocess('lineart')."""
    from tclight_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(ckpt_path)
    model = LineartAnimeUNet(ngf=ngf, num_downs=num_downs)
    params = convert_lineart_anime(sd, num_downs=num_downs)

    def model_fn(frames: np.ndarray) -> np.ndarray:
        m = lineart_anime_map(model, params, frames)
        return np.repeat(m[..., None], 3, axis=-1).astype(np.float32)

    return model_fn
