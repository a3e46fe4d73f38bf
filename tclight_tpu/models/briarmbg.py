"""BriaRMBG (RMBG-1.4): U^2-Net saliency/matting network.

Rebuild of briarmbg.py (:1-462): RSU7..RSU4F encoder/decoder producing a
foreground alpha matte, used for background-conditioned relighting
(generate.py prepare_data :147-167 resizes to ~256^2 px area, runs RMBG,
upsamples the matte, and composites frames over the background).

Flax/NHWC; BatchNorm runs with stored running statistics (inference).
Weights convert from the HF `briaai/RMBG-1.4` torch checkpoint via
`convert_rmbg_params`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class REBNCONV(nn.Module):
    out_ch: int
    dirate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dirate
        x = nn.Conv(self.out_ch, (3, 3), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), dtype=self.dtype, name="conv_s1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, name="bn_s1")(x)
        return nn.relu(x)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    )


def _upsample_like(x, ref):
    b, h, w, c = x.shape
    th, tw = ref.shape[1], ref.shape[2]
    return jax.image.resize(x, (b, th, tw, c), method="bilinear")


class RSU(nn.Module):
    """Residual U-block of given height (RSU7 -> height 7, etc.)."""

    height: int
    mid_ch: int
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hin = REBNCONV(self.out_ch, 1, self.dtype, name="rebnconvin")(x)

        encs = []
        h = hin
        for i in range(1, self.height):
            h = REBNCONV(self.mid_ch, 1, self.dtype, name=f"rebnconv{i}")(h)
            encs.append(h)
            if i < self.height - 1:
                h = _maxpool2(h)
        h = REBNCONV(self.mid_ch, 2, self.dtype, name=f"rebnconv{self.height}")(h)

        for i in range(self.height - 1, 0, -1):
            skip = encs[i - 1]
            if h.shape[1:3] != skip.shape[1:3]:
                h = _upsample_like(h, skip)
            ch = self.out_ch if i == 1 else self.mid_ch
            h = REBNCONV(ch, 1, self.dtype, name=f"rebnconv{i}d")(
                jnp.concatenate([h, skip], axis=-1)
            )
        return h + hin


class RSU4F(nn.Module):
    """Dilated (no pooling) residual U-block."""

    mid_ch: int
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hin = REBNCONV(self.out_ch, 1, self.dtype, name="rebnconvin")(x)
        h1 = REBNCONV(self.mid_ch, 1, self.dtype, name="rebnconv1")(hin)
        h2 = REBNCONV(self.mid_ch, 2, self.dtype, name="rebnconv2")(h1)
        h3 = REBNCONV(self.mid_ch, 4, self.dtype, name="rebnconv3")(h2)
        h4 = REBNCONV(self.mid_ch, 8, self.dtype, name="rebnconv4")(h3)
        h3d = REBNCONV(self.mid_ch, 4, self.dtype, name="rebnconv3d")(
            jnp.concatenate([h4, h3], -1))
        h2d = REBNCONV(self.mid_ch, 2, self.dtype, name="rebnconv2d")(
            jnp.concatenate([h3d, h2], -1))
        h1d = REBNCONV(self.out_ch, 1, self.dtype, name="rebnconv1d")(
            jnp.concatenate([h2d, h1], -1))
        return h1d + hin


class BriaRMBG(nn.Module):
    """Input: (B, H, W, 3) in [0, 255] (the reference feeds x*255,
    generate.py:160) -> list of 6 sigmoid saliency maps at input
    resolution; the first is the final matte."""

    dtype: Dtype = jnp.float32
    width_mult: int = 1  # 1 = RMBG-1.4; smaller for tests

    @nn.compact
    def __call__(self, x):
        m = self.width_mult
        x = x / 255.0
        dt = self.dtype

        s1 = RSU(7, 32 * m, 64 * m, dt, name="stage1")(x)
        p1 = _maxpool2(s1)
        s2 = RSU(6, 32 * m, 128 * m, dt, name="stage2")(p1)
        p2 = _maxpool2(s2)
        s3 = RSU(5, 64 * m, 256 * m, dt, name="stage3")(p2)
        p3 = _maxpool2(s3)
        s4 = RSU(4, 128 * m, 512 * m, dt, name="stage4")(p3)
        p4 = _maxpool2(s4)
        s5 = RSU4F(256 * m, 512 * m, dt, name="stage5")(p4)
        p5 = _maxpool2(s5)
        s6 = RSU4F(256 * m, 512 * m, dt, name="stage6")(p5)

        d5 = RSU4F(256 * m, 512 * m, dt, name="stage5d")(
            jnp.concatenate([_upsample_like(s6, s5), s5], -1))
        d4 = RSU(4, 128 * m, 256 * m, dt, name="stage4d")(
            jnp.concatenate([_upsample_like(d5, s4), s4], -1))
        d3 = RSU(5, 64 * m, 128 * m, dt, name="stage3d")(
            jnp.concatenate([_upsample_like(d4, s3), s3], -1))
        d2 = RSU(6, 32 * m, 64 * m, dt, name="stage2d")(
            jnp.concatenate([_upsample_like(d3, s2), s2], -1))
        d1 = RSU(7, 16 * m, 64 * m, dt, name="stage1d")(
            jnp.concatenate([_upsample_like(d2, s1), s1], -1))

        sides = []
        for name, feat in (("side1", d1), ("side2", d2), ("side3", d3),
                           ("side4", d4), ("side5", d5), ("side6", s6)):
            s = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                        name=name)(feat)
            sides.append(nn.sigmoid(_upsample_like(s, x)))
        return sides


def convert_rmbg_params(sd: dict) -> dict:
    """HF briaai/RMBG-1.4 torch state dict -> our params (conv OIHW->HWIO,
    BatchNorm stats into 'batch_stats')."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        if parts[-2].startswith("bn"):
            mod_path = parts[:-1]
            leaf = parts[-1]
            if leaf == "weight":
                put(params, mod_path + ["scale"], v)
            elif leaf == "bias":
                put(params, mod_path + ["bias"], v)
            elif leaf == "running_mean":
                put(stats, mod_path + ["mean"], v)
            elif leaf == "running_var":
                put(stats, mod_path + ["var"], v)
        elif parts[-2].startswith("conv") or parts[-2].startswith("side"):
            leaf = parts[-1]
            if leaf == "weight":
                put(params, parts[:-1] + ["kernel"], np.transpose(v, (2, 3, 1, 0)))
            else:
                put(params, parts[:-1] + ["bias"], v)
    return {"params": params, "batch_stats": stats}


def compute_alpha_mattes(model, variables, frames: np.ndarray,
                         batch: int = 8) -> np.ndarray:
    """Foreground mattes for [0,1] frames at the reference's working
    resolution (~256^2 px area, rounded to 64; generate.py:152-163)."""
    import cv2

    n, h, w, _ = frames.shape
    scale = (256.0 / float(h * w)) ** 0.5
    rh = max(64, int(64 * round(h * scale)))
    rw = max(64, int(64 * round(w * scale)))
    small = np.stack([cv2.resize(f, (rw, rh)) for f in frames])

    fn = jax.jit(lambda x: model.apply(variables, x)[0])
    outs = []
    for i in range(0, n, batch):
        outs.append(np.asarray(fn(jnp.asarray(small[i : i + batch] * 255.0))))
    alpha_small = np.concatenate(outs)[..., 0]
    alpha = np.stack([cv2.resize(a, (w, h)) for a in alpha_small])
    return np.clip(alpha, 0.0, 1.0)
