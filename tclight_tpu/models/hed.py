"""HED (holistically-nested edge detection) softedge annotator in Flax.

Stands in for controlnet_aux's HEDdetector (the reference's
softedge/scribble preprocessors, utils/VidToMe/controlnet_utils.py:60-62):
the ControlNetHED_Apache2 network — five VGG-style double-conv blocks with
maxpool downsampling, a per-block 1x1 projection to an edge logit map —
fused by resizing the five logit maps to input size, averaging, and
applying a sigmoid. Converter consumes the ControlNetHED .safetensors
layout (norm + blockN.convs.M + blockN.projection)."""

from __future__ import annotations

import re
from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ControlNetHED", "convert_hed", "hed_edges", "softedge_model_fn"]

_BLOCK_PLAN = ((3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3),
               (512, 512, 3))


class ControlNetHED(nn.Module):
    """__call__(x (B, H, W, 3) 0..255 RGB) -> list of 5 edge-logit maps at
    strides 1/1, 1/2, 1/4, 1/8, 1/16."""

    width_mult: float = 1.0     # <1 shrinks the net for tests

    @nn.compact
    def __call__(self, x):
        norm = self.param("norm", nn.initializers.zeros, (1, 1, 1, 3))
        h = x - norm
        projections = []
        for bi, (_, out_ch, n_layers) in enumerate(_BLOCK_PLAN, start=1):
            out_ch = max(1, int(out_ch * self.width_mult))
            if bi > 1:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            for li in range(n_layers):
                h = nn.relu(nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)),
                                    name=f"block{bi}_conv{li}")(h))
            projections.append(
                nn.Conv(1, (1, 1), name=f"block{bi}_projection")(h))
        return projections


def convert_hed(sd: Mapping[str, np.ndarray]) -> dict:
    """ControlNetHED_Apache2 state dict -> params."""
    p: dict = {}

    def put(path, v):
        node = p
        parts = path.split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = np.asarray(v)

    for k, v in sd.items():
        if k == "norm":
            put("norm", np.asarray(v).reshape(1, 1, 1, 3))
        elif m := re.fullmatch(r"block(\d)\.convs\.(\d)\.(weight|bias)", k):
            bi, li, wb = m.groups()
            val = np.transpose(v, (2, 3, 1, 0)) if wb == "weight" else v
            put(f"block{bi}_conv{li}/{'kernel' if wb == 'weight' else 'bias'}",
                val)
        elif m := re.fullmatch(r"block(\d)\.projection\.(weight|bias)", k):
            bi, wb = m.groups()
            val = np.transpose(v, (2, 3, 1, 0)) if wb == "weight" else v
            put(f"block{bi}_projection/"
                f"{'kernel' if wb == 'weight' else 'bias'}", val)
        else:
            raise KeyError(f"unmatched HED key {k}")
    return {"params": p}


def hed_edges(model: ControlNetHED, params, frames: np.ndarray,
              batch: int = 4, safe: bool = False) -> np.ndarray:
    """frames (N, H, W, 3) [0,1] -> edge maps (N, H, W) in [0,1]
    (HEDdetector fusion: resize logits, mean, sigmoid; optional safe_step)."""
    import cv2

    n, h, w, _ = frames.shape
    fn = jax.jit(lambda p, x: model.apply(p, x))
    out = np.zeros((n, h, w), np.float32)
    for i in range(0, n, batch):
        chunk = jnp.asarray(frames[i : i + batch] * 255.0)
        projs = fn(params, chunk)
        for b in range(chunk.shape[0]):
            maps = [
                cv2.resize(np.asarray(pm[b, ..., 0], np.float32), (w, h),
                           interpolation=cv2.INTER_LINEAR)
                for pm in projs
            ]
            edge = 1.0 / (1.0 + np.exp(-np.mean(np.stack(maps), axis=0,
                                                dtype=np.float64)))
            if safe:
                # controlnet_aux safe_step: quantize to coarse steps
                y = edge.astype(np.float64) * 2.0
                edge = (np.floor(y * 2.0 + 0.5) / 2.0 / 2.0).clip(0, 1)
            out[i + b] = edge.astype(np.float32)
    return out


def softedge_model_fn(ckpt_path):
    """Build the `model_fn` the controlnet preprocessors accept
    (data/controlnet_utils.py): frames -> 3-channel softedge maps."""
    from tclight_tpu.models.convert import load_torch_state_dict

    model = ControlNetHED()
    params = convert_hed(load_torch_state_dict(ckpt_path))

    def fn(frames: np.ndarray) -> np.ndarray:
        edges = hed_edges(model, params, frames)
        return np.repeat(edges[..., None], 3, axis=-1)

    return fn
