"""VGG16 feature extractor: perceptual loss + LPIPS.

Rebuild of utils/loss_utils.py `VGGPerceptualLoss` (:253-301) and the LPIPS
metric used by eval (eval_utils.py `FrameLPIPS` :369, `lpips_func`
:390-443). VGG16 runs in Flax (NHWC); torchvision VGG16 weights convert via
`convert_vgg16_features`; LPIPS linear-head weights (lpips 'vgg' variant)
load from a local state dict. Without checkpoints the modules run with
random weights (useful for wiring tests only — scores are then meaningless,
and the eval CLI reports LPIPS only when weights are configured).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision ImageNet normalization
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

# VGG16 features: conv channel plan with 'M' = maxpool
_VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M")
# slice points after ReLU of blocks 1_2, 2_2, 3_3, 4_3, 5_3 (LPIPS taps)
_LPIPS_TAPS = (1, 3, 6, 9, 12)  # conv indices (0-based, counting convs only)


class VGG16Features(nn.Module):
    """Returns the feature maps at the LPIPS tap points."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: (B, H, W, 3) in [0, 1]."""
        h = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        feats = []
        conv_i = 0
        for item in _VGG16_PLAN:
            if item == "M":
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            else:
                h = nn.Conv(item, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv_{conv_i}")(h)
                h = nn.relu(h)
                if conv_i in _LPIPS_TAPS:
                    feats.append(h)
                conv_i += 1
        return feats


def convert_vgg16_features(sd: dict) -> dict:
    """torchvision vgg16 state dict ('features.N.weight') -> our params."""
    params: dict = {}
    conv_i = 0
    layer_idx = 0
    for item in _VGG16_PLAN:
        if item == "M":
            layer_idx += 1  # the MaxPool module
            continue
        w = np.asarray(sd[f"features.{layer_idx}.weight"])
        b = np.asarray(sd[f"features.{layer_idx}.bias"])
        params[f"conv_{conv_i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
        conv_i += 1
        layer_idx += 2  # Conv + ReLU
    return {"params": params}


class VGGPerceptualLoss:
    """Mean L1 distance between VGG features (loss_utils.py:253-301)."""

    def __init__(self, variables, layers: Sequence[int] = (0, 1, 2, 3)):
        self.model = VGG16Features()
        self.variables = variables
        self.layers = tuple(layers)
        self._fn = jax.jit(lambda v, a, b: self._loss(v, a, b))

    def _loss(self, variables, a, b):
        fa = self.model.apply(variables, a)
        fb = self.model.apply(variables, b)
        return sum(jnp.mean(jnp.abs(fa[i] - fb[i])) for i in self.layers)

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._fn(self.variables, a, b)


class LPIPS:
    """LPIPS(vgg): unit-normalize channel features, weight with the linear
    heads, spatial-average, sum over taps."""

    def __init__(self, vgg_variables, lin_weights: Sequence[np.ndarray]):
        """lin_weights: per-tap (C,) nonnegative channel weights (the 1x1
        conv weights of the lpips 'vgg' checkpoint)."""
        self.model = VGG16Features()
        self.vgg_variables = vgg_variables
        self.lin = [jnp.asarray(w).reshape(1, 1, 1, -1) for w in lin_weights]
        self._fn = jax.jit(self._dist)

    def _dist(self, a, b):
        fa = self.model.apply(self.vgg_variables, a)
        fb = self.model.apply(self.vgg_variables, b)
        total = 0.0
        for f1, f2, w in zip(fa, fb, self.lin):
            n1 = f1 * jax.lax.rsqrt(jnp.sum(f1**2, -1, keepdims=True) + 1e-10)
            n2 = f2 * jax.lax.rsqrt(jnp.sum(f2**2, -1, keepdims=True) + 1e-10)
            total = total + jnp.mean(
                jnp.sum((n1 - n2) ** 2 * w, axis=-1), axis=(1, 2)
            )
        return total

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> np.ndarray:
        return np.asarray(self._fn(a, b))


def load_lpips_lin_weights(sd: dict) -> list[np.ndarray]:
    """lpips 'vgg' checkpoint: lin{i}.model.1.weight (1, C, 1, 1)."""
    out = []
    for i in range(5):
        w = np.asarray(sd[f"lin{i}.model.1.weight"]).reshape(-1)
        out.append(np.maximum(w, 0.0))
    return out
