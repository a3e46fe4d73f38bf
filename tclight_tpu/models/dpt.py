"""DPT (dense prediction transformer) monocular depth estimator in Flax.

Stands in for the sd2-depth pipeline's `depth_estimator`
(DPTForDepthEstimation) that the reference drives through prepare_depth /
prepare_depth_map (utils/VidToMe/utils.py:215-301). Covers BOTH layouts:

- plain-ViT DPT (dpt-large / midas-v3, transformers key names);
- DPT-hybrid (`is_hybrid=True`, the backbone sd2-depth actually ships):
  a BiT/ResNetV2 stem (weight-standardized convs + group norm,
  bottleneck stages [3, 4, 9]) whose stage-3 map feeds the ViT, with the
  stage-1/2 maps wired straight into the first two neck positions
  (reassemble layers 0-1 are identity; transformers
  models/dpt/modeling_dpt.py DPTViTHybridEmbeddings +
  DPTReassembleStage._init_reassemble_dpt_hybrid).

Converter `convert_dpt` consumes a transformers `DPTForDepthEstimation`
state dict (either variant); `test_dpt.py` holds the exact-parity tests
vs transformers.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    backbone_out_indices: tuple = (5, 11, 17, 23)
    neck_hidden_sizes: tuple = (256, 512, 1024, 1024)
    reassemble_factors: tuple = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    # DPT-hybrid (BiT/ResNetV2 stem); only out_indices[2:] feed the neck,
    # positions 0-1 come from the BiT stage-1/2 feature maps
    is_hybrid: bool = False
    bit_embedding_size: int = 64
    bit_hidden_sizes: tuple = (256, 512, 1024)
    bit_depths: tuple = (3, 4, 9)
    bit_num_groups: int = 32
    dtype: Any = jnp.float32

    @staticmethod
    def large() -> "DPTConfig":
        return DPTConfig()

    @staticmethod
    def hybrid() -> "DPTConfig":
        """Intel/dpt-hybrid-midas — the depth model stabilityai/
        stable-diffusion-2-depth ships (reference prepare_depth path)."""
        return DPTConfig(hidden_size=768, num_layers=12, num_heads=12,
                         intermediate_size=3072,
                         backbone_out_indices=(2, 5, 8, 11),
                         neck_hidden_sizes=(256, 512, 768, 768),
                         reassemble_factors=(1, 1, 1, 0.5),
                         is_hybrid=True)

    @staticmethod
    def tiny() -> "DPTConfig":
        return DPTConfig(image_size=64, patch_size=16, hidden_size=32,
                         num_layers=4, num_heads=2, intermediate_size=64,
                         backbone_out_indices=(0, 1, 2, 3),
                         neck_hidden_sizes=(16, 24, 32, 40),
                         fusion_hidden_size=32)

    @staticmethod
    def tiny_hybrid() -> "DPTConfig":
        return DPTConfig(image_size=64, patch_size=16, hidden_size=32,
                         num_layers=4, num_heads=2, intermediate_size=64,
                         backbone_out_indices=(0, 1, 2, 3),
                         neck_hidden_sizes=(16, 24, 32, 32),
                         reassemble_factors=(1, 1, 1, 0.5),
                         fusion_hidden_size=32, is_hybrid=True,
                         bit_embedding_size=16,
                         bit_hidden_sizes=(16, 24, 32),
                         bit_depths=(1, 1, 1), bit_num_groups=4)


def _resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                     align_corners: bool) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear') for NHWC, both align modes
    (jax.image.resize only covers align_corners=False)."""
    b, h, w, c = x.shape

    def axis_weights(n_in, n_out):
        if align_corners and n_out > 1:
            pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        else:
            pos = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
            pos = jnp.clip(pos, 0.0, n_in - 1.0)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.minimum(lo + 1, n_in - 1)
        whi = (pos - lo).astype(x.dtype)
        return lo, hi, whi

    ylo, yhi, wy = axis_weights(h, out_h)
    rows = x[:, ylo] * (1 - wy)[None, :, None, None] + \
        x[:, yhi] * wy[None, :, None, None]
    xlo, xhi, wx = axis_weights(w, out_w)
    return rows[:, :, xlo] * (1 - wx)[None, None, :, None] + \
        rows[:, :, xhi] * wx[None, None, :, None]


class _ViTLayer(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d = c.hidden_size
        head_dim = d // c.num_heads
        h = nn.LayerNorm(epsilon=1e-12, name="layernorm_before")(x)
        q = nn.Dense(d, name="query")(h)
        k = nn.Dense(d, name="key")(h)
        v = nn.Dense(d, name="value")(h)
        b, s, _ = h.shape
        q = q.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(head_dim)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        o = nn.Dense(d, name="attention_output")(o)
        x = x + o
        h = nn.LayerNorm(epsilon=1e-12, name="layernorm_after")(x)
        h = nn.Dense(c.intermediate_size, name="intermediate")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="output")(h)
        return x + h


# ------------------------------------------------ BiT / ResNetV2 stem
# (DPT-hybrid backbone: transformers models/bit/modeling_bit.py, layer_type
# "bottleneck", global_padding SAME, weight-standardized convs + group norm)


def _make_div(value: float, divisor: int = 8) -> int:
    new = max(divisor, int(value + divisor / 2) // divisor * divisor)
    if new < 0.9 * value:
        new += divisor
    return new


class _WSConv(nn.Module):
    """Weight-standardized conv with TF-SAME padding, no bias
    (WeightStandardizedConv2d: per-out-channel batch_norm of the kernel,
    eps 1e-8, biased variance)."""

    features: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features))
        flat = k.reshape(-1, self.features)
        mean = flat.mean(axis=0)
        var = flat.var(axis=0)  # biased, like F.batch_norm(training=True)
        ks = (k - mean) * jax.lax.rsqrt(var + 1e-8)
        return jax.lax.conv_general_dilated(
            x, ks.astype(x.dtype), (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _BitGroupNorm(nn.Module):
    groups: int
    act: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="gn")(x)
        return nn.relu(y) if self.act else y


class _BitBottleneck(nn.Module):
    """Non-preactivation bottleneck (BitBottleneckLayer); downsample
    shortcut on the first layer of a stage."""

    cfg: DPTConfig
    out_channels: int
    stride: int = 1
    is_first: bool = False

    @nn.compact
    def __call__(self, x):
        g = self.cfg.bit_num_groups
        mid = _make_div(self.out_channels * 0.25)
        shortcut = x
        if self.is_first:
            shortcut = _WSConv(self.out_channels, 1, self.stride,
                               name="downsample_conv")(x)
            shortcut = _BitGroupNorm(g, act=False,
                                     name="downsample_norm")(shortcut)
        h = _WSConv(mid, 1, name="conv1")(x)
        h = _BitGroupNorm(g, name="norm1")(h)
        h = _WSConv(mid, 3, self.stride, name="conv2")(h)
        h = _BitGroupNorm(g, name="norm2")(h)
        h = _WSConv(self.out_channels, 1, name="conv3")(h)
        h = _BitGroupNorm(g, act=False, name="norm3")(h)
        return nn.relu(h + shortcut)


def _same_max_pool(x: jnp.ndarray, k: int = 3, s: int = 2) -> jnp.ndarray:
    """BitMaxPool2d: TF-SAME dynamic zero-pad + max pool (zero padding is
    exact here: the input is post-ReLU, so pad(0) never beats a real
    value that a -inf pad would have kept)."""
    def pad_amount(n):
        return max((-(-n // s) - 1) * s + k - n, 0)

    ph, pw = pad_amount(x.shape[1]), pad_amount(x.shape[2])
    x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                    (pw // 2, pw - pw // 2), (0, 0)))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


class _BitBackbone(nn.Module):
    """Stem + 3 bottleneck stages; returns (stage1, stage2, stage3)
    feature maps at 1/4, 1/8, 1/16 resolution."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = _WSConv(c.bit_embedding_size, 7, 2, name="stem_conv")(x)
        x = _BitGroupNorm(c.bit_num_groups, name="stem_norm")(x)
        x = _same_max_pool(x)
        feats = []
        for s, (depth, width) in enumerate(zip(c.bit_depths,
                                               c.bit_hidden_sizes)):
            for layer in range(depth):
                x = _BitBottleneck(
                    c, _make_div(width),
                    stride=(2 if s > 0 and layer == 0 else 1),
                    is_first=layer == 0,
                    name=f"stage_{s}_layer_{layer}")(x)
            feats.append(x)
        return feats


class DPTForDepthEstimation(nn.Module):
    """__call__(images (B, H, W, 3) normalized) -> depth (B, H/2, W/2)."""

    config: DPTConfig = DPTConfig()

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        b, h, w, _ = pixel_values.shape
        ph, pw = h // c.patch_size, w // c.patch_size

        # --- backbone: ViT patches, or BiT stem + ViT on its 1/16 map
        bit_feats = []
        if c.is_hybrid:
            bit_feats = _BitBackbone(c, name="bit")(pixel_values)
            x = nn.Conv(c.hidden_size, (1, 1),
                        name="hybrid_projection")(bit_feats[-1])
            ph, pw = x.shape[1], x.shape[2]
            x = x.reshape(b, ph * pw, c.hidden_size)
        else:
            x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                        strides=(c.patch_size, c.patch_size),
                        name="patch_projection")(pixel_values)
            x = x.reshape(b, ph * pw, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.hidden_size))
        pos = self.param(
            "position_embeddings", nn.initializers.zeros,
            (1, (c.image_size // c.patch_size) ** 2 + 1, c.hidden_size))
        # resize the grid part of the position embeddings to (ph, pw)
        old = int(np.sqrt(pos.shape[1] - 1))
        pos_grid = pos[:, 1:].reshape(1, old, old, c.hidden_size)
        pos_grid = _resize_bilinear(pos_grid, ph, pw, align_corners=False)
        pos_r = jnp.concatenate(
            [pos[:, :1], pos_grid.reshape(1, ph * pw, c.hidden_size)], axis=1)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.hidden_size)), x],
                            axis=1) + pos_r

        # hybrid: only the last two out indices tap the ViT; neck
        # positions 0-1 are the BiT stage-1/2 maps (modeling_dpt.py
        # DPTForDepthEstimation.forward, is_hybrid branch)
        vit_indices = (c.backbone_out_indices[2:] if c.is_hybrid
                       else c.backbone_out_indices)
        taps = []
        out_idx = set(vit_indices)
        for i in range(c.num_layers):
            x = _ViTLayer(c, name=f"layer_{i}")(x)
            if i in out_idx:
                taps.append(x)

        # --- reassemble: readout-project, reshape, 1x1 project, resize
        feats = []
        for i, t in enumerate(bit_feats[:2] if c.is_hybrid else []):
            p = nn.Conv(c.fusion_hidden_size, (3, 3),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=f"neck_conv_{i}")(t)
            feats.append(p)
        for i, t in enumerate(taps, start=2 if c.is_hybrid else 0):
            patches, readout = t[:, 1:], t[:, :1]
            readout = jnp.broadcast_to(readout, patches.shape)
            p = nn.Dense(c.hidden_size, name=f"readout_project_{i}")(
                jnp.concatenate([patches, readout], axis=-1))
            p = nn.gelu(p, approximate=False)
            p = p.reshape(b, ph, pw, c.hidden_size)
            p = nn.Conv(c.neck_hidden_sizes[i], (1, 1),
                        name=f"reassemble_projection_{i}")(p)
            f = c.reassemble_factors[i]
            if f > 1:
                f = int(f)
                p = nn.ConvTranspose(c.neck_hidden_sizes[i], (f, f),
                                     strides=(f, f), padding="VALID",
                                     name=f"reassemble_resize_{i}")(p)
            elif f < 1:
                s = int(round(1 / f))
                p = nn.Conv(c.neck_hidden_sizes[i], (3, 3), strides=(s, s),
                            padding=((1, 1), (1, 1)),
                            name=f"reassemble_resize_{i}")(p)
            p = nn.Conv(c.fusion_hidden_size, (3, 3),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=f"neck_conv_{i}")(p)
            feats.append(p)

        # --- fusion, deepest first (DPTFeatureFusionStage)
        def residual_unit(y, name):
            r = y
            y = nn.relu(y)
            y = nn.Conv(c.fusion_hidden_size, (3, 3),
                        padding=((1, 1), (1, 1)), name=f"{name}_conv1")(y)
            y = nn.relu(y)
            y = nn.Conv(c.fusion_hidden_size, (3, 3),
                        padding=((1, 1), (1, 1)), name=f"{name}_conv2")(y)
            return y + r

        fused = None
        for j, feat in enumerate(feats[::-1]):
            name = f"fusion_{j}"
            if fused is None:
                state = feat
            else:
                if fused.shape[1:3] != feat.shape[1:3]:
                    fused = _resize_bilinear(fused, feat.shape[1],
                                             feat.shape[2],
                                             align_corners=False)
                state = feat + residual_unit(fused, f"{name}_res1")
            state = residual_unit(state, f"{name}_res2")
            state = _resize_bilinear(state, state.shape[1] * 2,
                                     state.shape[2] * 2, align_corners=True)
            fused = nn.Conv(c.fusion_hidden_size, (1, 1),
                            name=f"{name}_projection")(state)

        # --- head
        y = nn.Conv(c.fusion_hidden_size // 2, (3, 3),
                    padding=((1, 1), (1, 1)), name="head_0")(fused)
        y = _resize_bilinear(y, y.shape[1] * 2, y.shape[2] * 2,
                             align_corners=True)
        y = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="head_2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), name="head_4")(y)
        y = nn.relu(y)
        return y[..., 0]


def _conv_t(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _convtrans_t(w):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax HWIO (kh, kw, in, out)
    return np.transpose(np.asarray(w), (2, 3, 0, 1))


def dpt_config_for_state_dict(sd: Mapping[str, Any]) -> DPTConfig:
    """Pick the layout a transformers DPT checkpoint uses: the BiT stem
    key marks DPT-hybrid (sd2-depth's Intel/dpt-hybrid-midas); otherwise
    plain-ViT dpt-large."""
    if "dpt.embeddings.backbone.bit.embedder.convolution.weight" in sd:
        return DPTConfig.hybrid()
    return DPTConfig.large()


def convert_dpt(sd: Mapping[str, np.ndarray], cfg: DPTConfig) -> dict:
    """transformers DPTForDepthEstimation (plain or hybrid) -> params."""
    p: dict = {}

    def put(path, v):
        node = p
        parts = path.split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = np.asarray(v)

    _bit = "dpt.embeddings.backbone.bit."
    fusion_n = len(cfg.neck_hidden_sizes)
    for k, v in sd.items():
        if k == "dpt.embeddings.cls_token":
            put("cls_token", v)
        elif k == "dpt.embeddings.position_embeddings":
            put("position_embeddings", v)
        elif k == "dpt.embeddings.patch_embeddings.projection.weight":
            put("patch_projection/kernel", _conv_t(v))
        elif k == "dpt.embeddings.patch_embeddings.projection.bias":
            put("patch_projection/bias", v)
        elif k == "dpt.embeddings.projection.weight":
            put("hybrid_projection/kernel", _conv_t(v))
        elif k == "dpt.embeddings.projection.bias":
            put("hybrid_projection/bias", v)
        elif k == _bit + "embedder.convolution.weight":
            put("bit/stem_conv/kernel", _conv_t(v))
        elif m := re.fullmatch(_bit.replace(".", r"\.") +
                               r"embedder\.norm\.(weight|bias)", k):
            put("bit/stem_norm/gn/"
                f"{'scale' if m.group(1) == 'weight' else 'bias'}", v)
        elif m := re.fullmatch(
                _bit.replace(".", r"\.") +
                r"encoder\.stages\.(\d+)\.layers\.(\d+)\.(.+)", k):
            s, layer, rest = m.groups()
            base = f"bit/stage_{s}_layer_{layer}"
            if cm := re.fullmatch(r"conv(\d)\.weight", rest):
                put(f"{base}/conv{cm.group(1)}/kernel", _conv_t(v))
            elif cm := re.fullmatch(r"norm(\d)\.(weight|bias)", rest):
                put(f"{base}/norm{cm.group(1)}/gn/"
                    f"{'scale' if cm.group(2) == 'weight' else 'bias'}", v)
            elif rest == "downsample.conv.weight":
                put(f"{base}/downsample_conv/kernel", _conv_t(v))
            elif cm := re.fullmatch(r"downsample\.norm\.(weight|bias)", rest):
                put(f"{base}/downsample_norm/gn/"
                    f"{'scale' if cm.group(1) == 'weight' else 'bias'}", v)
            else:
                raise KeyError(f"unmatched BiT key {k}")
        elif k in ("dpt.layernorm.weight", "dpt.layernorm.bias"):
            continue  # applied only to the pooled output path, unused here
        elif m := re.fullmatch(
                r"dpt\.encoder\.layer\.(\d+)\.(.+)\.(weight|bias)", k):
            i, rest, wb = m.groups()
            names = {
                "attention.attention.query": "query",
                "attention.attention.key": "key",
                "attention.attention.value": "value",
                "attention.output.dense": "attention_output",
                "intermediate.dense": "intermediate",
                "output.dense": "output",
                "layernorm_before": "layernorm_before",
                "layernorm_after": "layernorm_after",
            }
            name = names[rest]
            if "layernorm" in name:
                put(f"layer_{i}/{name}/{'scale' if wb == 'weight' else 'bias'}", v)
            else:
                put(f"layer_{i}/{name}/{'kernel' if wb == 'weight' else 'bias'}",
                    np.transpose(v) if wb == "weight" else v)
        elif m := re.fullmatch(
                r"neck\.reassemble_stage\.readout_projects\.(\d+)\.0\.(weight|bias)", k):
            i, wb = m.groups()
            put(f"readout_project_{i}/{'kernel' if wb == 'weight' else 'bias'}",
                np.transpose(v) if wb == "weight" else v)
        elif m := re.fullmatch(
                r"neck\.reassemble_stage\.layers\.(\d+)\.projection\.(weight|bias)", k):
            i, wb = m.groups()
            put(f"reassemble_projection_{i}/"
                f"{'kernel' if wb == 'weight' else 'bias'}",
                _conv_t(v) if wb == "weight" else v)
        elif m := re.fullmatch(
                r"neck\.reassemble_stage\.layers\.(\d+)\.resize\.(weight|bias)", k):
            i, wb = m.groups()
            factor = cfg.reassemble_factors[int(i)]
            if wb == "bias":
                put(f"reassemble_resize_{i}/bias", v)
            elif factor > 1:
                put(f"reassemble_resize_{i}/kernel", _convtrans_t(v))
            else:
                put(f"reassemble_resize_{i}/kernel", _conv_t(v))
        elif m := re.fullmatch(r"neck\.convs\.(\d+)\.weight", k):
            put(f"neck_conv_{m.group(1)}/kernel", _conv_t(v))
        elif m := re.fullmatch(
                r"neck\.fusion_stage\.layers\.(\d+)\.projection\.(weight|bias)", k):
            i, wb = m.groups()
            put(f"fusion_{i}_projection/{'kernel' if wb == 'weight' else 'bias'}",
                _conv_t(v) if wb == "weight" else v)
        elif m := re.fullmatch(
                r"neck\.fusion_stage\.layers\.(\d+)\.residual_layer(\d)"
                r"\.convolution(\d)\.(weight|bias)", k):
            i, rl, cv, wb = m.groups()
            put(f"fusion_{i}_res{rl}_conv{cv}/"
                f"{'kernel' if wb == 'weight' else 'bias'}",
                _conv_t(v) if wb == "weight" else v)
        elif m := re.fullmatch(r"head\.head\.(\d)\.(weight|bias)", k):
            i, wb = m.groups()
            put(f"head_{i}/{'kernel' if wb == 'weight' else 'bias'}",
                _conv_t(v) if wb == "weight" else v)
        else:
            raise KeyError(f"unmatched DPT key {k}")
    return {"params": p}


# ------------------------------------------------ depth conditioning prep

_DPT_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
_DPT_STD = np.array([0.5, 0.5, 0.5], np.float32)


def prepare_depth_maps(model, params, frames: np.ndarray,
                       latent_hw: tuple[int, int],
                       batch: int = 4, input_size: int = 384) -> jnp.ndarray:
    """frames (N, H, W, 3) [0,1] -> depth channel (N, lh, lw, 1) in [-1,1]
    (prepare_depth_map semantics: per-frame min/max normalization after a
    bicubic resize to latent resolution; utils/VidToMe/utils.py:244-301)."""
    import cv2

    lh, lw = latent_hw
    fn = jax.jit(lambda p, x: model.apply(p, x))
    outs = []
    for i in range(0, len(frames), batch):
        chunk = frames[i : i + batch]
        resized = np.stack([
            cv2.resize(f, (input_size, input_size),
                       interpolation=cv2.INTER_CUBIC) for f in chunk
        ])
        norm = (resized - _DPT_MEAN) / _DPT_STD
        outs.append(np.asarray(fn(params, jnp.asarray(norm))))
    depth = np.concatenate(outs)[..., None]  # (N, h', w', 1)
    depth_lat = np.asarray(_resize_bilinear(
        jnp.asarray(depth), lh, lw, align_corners=False))
    lo = depth_lat.min(axis=(1, 2, 3), keepdims=True)
    hi = depth_lat.max(axis=(1, 2, 3), keepdims=True)
    return jnp.asarray(2.0 * (depth_lat - lo) / np.maximum(hi - lo, 1e-8) - 1.0)
