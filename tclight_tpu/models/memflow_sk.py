"""MemFlowNet (GMA-SK2 / "skflow" variant) — checkpoint-exact rebuild.

This is the network `MemFlowNet_things.pth` actually parameterizes
(reference: utils/evaluation/memflow/core/Networks/MemFlowNet/MemFlow.py
with the things config — cnet/fnet 'basicencoder', gma 'GMA-SK2',
configs/things_memflownet.py:38-52):

- feature/context encoders: RAFT BasicEncoder (instance / batch norm) —
  shared with models/raft.py, whose torch-oracle parity test pins the
  conventions;
- SKII update block (sk2.py SKUpdateBlock6_Deep_nopoolres_AllDecoder2_
  Mem_skflow): PCBlock4_Deep_nopool_res stacks — depthwise large-kernel
  convs ([1,15] encoder / [1,7] GRU) with GELU residues;
- GMA aggregation (gma.py Aggregate.to_v + gamma) feeding a cross-frame
  *memory attention*: per decoder iteration, context queries attend over
  the concatenated [memory keys | current key] with the length-adaptive
  scale  d^-1/2 * log_L(train_avg_length)  (MemFlow.py:146,
  memory_manager_skflow.py:57);
- working memory = the reference's KeyValueMemoryStore under the things
  inference config (mem_every=1, max_mid_term=2, min_mid_term=1): add the
  frame's (key, value), sieve to the most recent min_mid_term*HW elements
  when full (inference_core_skflow.py:50-52, memory_manager:add_memory).

TPU design: the 15-iteration decoder is one `lax.scan` inside a single
jitted step; memory is a static-capacity buffer + valid count (attention
masks the empty tail; the softmax scale uses the true length). The host
`InferenceCoreSK` only rolls the buffer between frames.

`convert_memflow_params` maps MemFlowNet_things.pth (module.-prefix
stripped) onto this tree; numerics are pinned by a torch-oracle test on
the random-init reference net (tests/test_oracle_memflow.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.models.raft import (
    BasicEncoder,
    convex_upsample,
    corr_lookup,
    corr_pyramid,
)

__all__ = [
    "MemFlowSKConfig",
    "MemFlowNetSK",
    "InferenceCoreSK",
    "convert_memflow_params",
]


@dataclasses.dataclass(frozen=True)
class MemFlowSKConfig:
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    feat_dim: int = 256
    decoder_depth: int = 15          # things val_decoder_depth
    train_avg_length: float = (400 * 720 // 64) * 3 / 2
    max_mid_term_frames: int = 2
    min_mid_term_frames: int = 1
    dtype: Any = jnp.float32

    @property
    def cor_planes(self) -> int:
        return (2 * self.corr_radius + 1) ** 2 * self.corr_levels


def _gelu(x):
    return nn.gelu(x, approximate=False)


def _conv(ch, k, name, use_bias=True, groups=1, dtype=jnp.float32):
    pad = k // 2
    return nn.Conv(ch, (k, k), padding=((pad, pad), (pad, pad)),
                   feature_group_count=groups, use_bias=use_bias,
                   dtype=dtype, name=name)


class PCBlock(nn.Module):
    """PCBlock4_Deep_nopool_res (sk2.py:6-30): pointwise FFN + depthwise
    large-kernel convs, all with GELU residues."""

    c_out: int
    k_conv: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = _conv(int(1.5 * c_in), 1, "ffn1_0", dtype=self.dtype)(x)
        h = _conv(c_in, 1, "ffn1_2", dtype=self.dtype)(_gelu(h))
        x = _gelu(x + h)
        for i, k in enumerate(self.k_conv):
            x = _gelu(x + _conv(c_in, k, f"conv_{i}", groups=c_in,
                                dtype=self.dtype)(x))
        x = _gelu(x + _conv(c_in, 1, "pw", dtype=self.dtype)(x))
        h = _conv(int(1.5 * c_in), 1, "ffn2_0", dtype=self.dtype)(x)
        return _conv(self.c_out, 1, "ffn2_2", dtype=self.dtype)(_gelu(h))


class SKMotionEncoder(nn.Module):
    """SKMotionEncoder6_Deep_nopool_res_Mem_skflow (sk2.py:87-111)."""

    cfg: MemFlowSKConfig

    @nn.compact
    def __call__(self, flow, corr):
        k = (1, 15)
        dt = self.cfg.dtype
        cor = _gelu(PCBlock(256, k, dt, name="convc1")(corr))
        cor = PCBlock(192, k, dt, name="convc2")(cor)
        flo = _conv(128, 1, "convf1", dtype=dt)(flow)
        flo = PCBlock(64, k, dt, name="convf2")(flo)
        out = PCBlock(126, k, dt, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)
        )
        return jnp.concatenate([out, flow], axis=-1)


class SKUpdateBlock(nn.Module):
    """SKUpdateBlock6_Deep_nopoolres_AllDecoder2_Mem_skflow
    (sk2.py:185-215)."""

    cfg: MemFlowSKConfig

    def setup(self):
        dt = self.cfg.dtype
        self.encoder = SKMotionEncoder(self.cfg, name="encoder")
        self.gru = PCBlock(128, (1, 7), dt, name="gru")
        self.flow_head = PCBlock(2, (1, 15), dt, name="flow_head")
        self.mask_0 = _conv(256, 3, "mask_0", dtype=dt)
        self.mask_2 = _conv(64 * 9, 1, "mask_2", dtype=dt)
        self.to_v = _conv(128, 1, "to_v", use_bias=False, dtype=dt)

    def get_motion_and_value(self, flow, corr, gamma):
        motion = self.encoder(flow, corr)
        return motion, self.to_v(motion)

    def __call__(self, net, inp, motion, motion_global):
        x = jnp.concatenate([net, inp, motion, motion_global], axis=-1)
        net = self.gru(x)
        delta = self.flow_head(net)
        mask = 0.25 * self.mask_2(nn.relu(self.mask_0(net)))
        return net, mask, delta


class MemoryState(NamedTuple):
    """Static-capacity working memory: (B, cap*HW, C) keys/values + the
    number of valid (oldest-first) entries."""

    keys: jnp.ndarray
    values: jnp.ndarray
    count: jnp.ndarray  # scalar int32


class MemFlowNetSK(nn.Module):
    cfg: MemFlowSKConfig = MemFlowSKConfig()

    def setup(self):
        cfg = self.cfg
        self.fnet = BasicEncoder(cfg.feat_dim, dtype=cfg.dtype,
                                 norm="instance", name="fnet")
        self.cnet = BasicEncoder(cfg.hidden_dim + cfg.context_dim,
                                 dtype=cfg.dtype, norm="batch", name="cnet")
        self.to_qk = _conv(2 * cfg.context_dim, 1, "to_qk", use_bias=False,
                           dtype=cfg.dtype)
        self.update = SKUpdateBlock(cfg, name="update")
        self.gamma = self.param("gamma", nn.initializers.zeros, (1,))

    def encode_context(self, frame):
        """frame (B, H, W, 3) in [-1, 1] -> (query, key, net, inp) at 1/8
        (MemFlow.py encode_context :95-127)."""
        cnet = self.cnet(frame)
        net, inp = jnp.split(cnet, 2, axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)
        qk = self.to_qk(inp)
        q, k = jnp.split(qk, 2, axis=-1)
        return q, k, net, inp

    def encode_features(self, frame):
        return self.fnet(frame)

    def decode(self, fmap1, fmap2, query, key, net, inp, mem: MemoryState,
               flow_init=None, iters: int | None = None):
        """The decoder loop (InferenceCore.step :34-46): `iters`
        refinement steps with memory attention; returns (flow_low (B,h,w,2),
        flow_up (B,H,W,2), current_value)."""
        cfg = self.cfg
        iters = iters or cfg.decoder_depth
        b, h, w, _ = fmap1.shape
        hw = h * w
        pyramid = corr_pyramid(fmap1.astype(jnp.float32),
                               fmap2.astype(jnp.float32), cfg.corr_levels)

        coords1 = jnp.zeros((b, h, w, 2), jnp.float32)
        if flow_init is not None:
            coords1 = coords1 + flow_init
        grid = _pixel_grid(h, w)

        q = query.reshape(b, hw, -1)
        mem_k = mem.keys
        keys = jnp.concatenate([mem_k, key.reshape(b, hw, -1)], axis=1)
        key_valid = jnp.concatenate([
            jnp.arange(mem_k.shape[1])[None] < mem.count,
            jnp.ones((1, hw), bool),
        ], axis=1)  # (1, M+hw)
        l_true = (mem.count + hw).astype(jnp.float32)
        scale = (q.shape[-1] ** -0.5) * (
            jnp.log(jnp.maximum(l_true, 2.0))
            / np.log(cfg.train_avg_length)
        )
        logits_qk = jnp.einsum("blc,bmc->blm", q.astype(jnp.float32),
                               keys.astype(jnp.float32))
        logits_qk = jnp.where(key_valid[:, None, :], logits_qk, -jnp.inf)

        attn = jax.nn.softmax(logits_qk * scale, axis=-1)

        def body(carry, _):
            net, coords1, _, _ = carry
            corr = corr_lookup(pyramid, grid[None] + coords1, cfg.corr_radius)
            flow = coords1
            motion, value = self.update.get_motion_and_value(
                flow.astype(cfg.dtype), corr.astype(cfg.dtype), self.gamma
            )
            vals = jnp.concatenate(
                [mem.values, value.reshape(b, hw, -1)], axis=1
            )
            readout = jnp.einsum(
                "blm,bmc->blc", attn, vals.astype(jnp.float32)
            ).reshape(b, h, w, -1)
            motion_global = motion + self.gamma * readout.astype(cfg.dtype)
            net, up_mask, delta = self.update(net, inp, motion, motion_global)
            coords1 = coords1 + delta.astype(jnp.float32)
            return (net, coords1, up_mask, value), None

        up0 = jnp.zeros((b, h, w, 64 * 9), cfg.dtype)
        v0 = jnp.zeros((b, h, w, cfg.context_dim), cfg.dtype)
        (net, coords1, up_mask, value), _ = jax.lax.scan(
            body, (net, coords1, up0, v0), None, length=iters
        )
        flow_low = coords1
        flow_up = convex_upsample(flow_low, up_mask)
        return flow_low, flow_up, value.reshape(b, hw, -1)

    def __call__(self, frame1, frame2, mem: MemoryState | None = None,
                 flow_init=None, iters: int | None = None):
        """One frame pair, frames (B, H, W, 3) in [-1, 1]. Returns
        (flow_low, flow_up, new_key, last_value)."""
        cfg = self.cfg
        b, H, W, _ = frame1.shape
        h, w = H // 8, W // 8
        if mem is None:
            cap = (cfg.max_mid_term_frames - 1) * h * w
            mem = MemoryState(
                jnp.zeros((b, cap, cfg.context_dim), cfg.dtype),
                jnp.zeros((b, cap, cfg.context_dim), cfg.dtype),
                jnp.int32(0),
            )
        query, key, net, inp = self.encode_context(frame1)
        f = self.fnet(jnp.concatenate([frame1, frame2], axis=0))
        fmap1, fmap2 = f[:b], f[b:]
        flow_low, flow_up, last_value = self.decode(
            fmap1, fmap2, query, key, net, inp, mem, flow_init, iters
        )
        return flow_low, flow_up, key.reshape(b, h * w, -1), last_value


def _pixel_grid(h, w):
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.stack([xs, ys], axis=-1)


def forward_interpolate_np(flow_low: np.ndarray) -> np.ndarray:
    """Forward-splat the low-res flow to warm-start the next pair
    (core/utils/utils.py forward_interpolate, scipy griddata semantics
    approximated by nearest-splat + hole fill)."""
    h, w = flow_low.shape[:2]
    fx, fy = flow_low[..., 0], flow_low[..., 1]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x1 = np.round(xs + fx).astype(np.int64)
    y1 = np.round(ys + fy).astype(np.int64)
    valid = (x1 >= 0) & (x1 < w) & (y1 >= 0) & (y1 < h)
    out = np.zeros_like(flow_low)
    cnt = np.zeros((h, w, 1), np.float32)
    np.add.at(out, (y1[valid], x1[valid]), flow_low[valid])
    np.add.at(cnt, (y1[valid], x1[valid]), 1.0)
    filled = cnt[..., 0] > 0
    out[filled] /= cnt[filled]
    return out


class InferenceCoreSK:
    """Streaming per-pair driver (inference_core_skflow.py:6-54): jitted
    step + host-side working-memory roll (mem_every=1 semantics: memory
    holds the most recent `min_mid_term_frames` frames' keys/values)."""

    def __init__(self, model: MemFlowNetSK, params, warm_start: bool = True):
        self.model = model
        self.params = params
        self.warm_start = warm_start
        self._step = jax.jit(
            lambda p, f1, f2, mem, fi: model.apply(
                p, f1, f2, mem, fi, method=MemFlowNetSK.__call__
            )
        )
        self.reset()

    def reset(self):
        self.mem: MemoryState | None = None
        self.flow_prev = None

    def step(self, frame1: np.ndarray, frame2: np.ndarray) -> np.ndarray:
        """frames (H, W, 3) in [0, 1] -> flow (H, W, 2) full resolution."""
        cfg = self.model.cfg
        f1 = jnp.asarray(frame1[None] * 2.0 - 1.0, cfg.dtype)
        f2 = jnp.asarray(frame2[None] * 2.0 - 1.0, cfg.dtype)
        h, w = frame1.shape[0] // 8, frame1.shape[1] // 8
        if self.mem is None:
            cap = max(cfg.max_mid_term_frames - 1, 1) * h * w
            self.mem = MemoryState(
                jnp.zeros((1, cap, cfg.context_dim), cfg.dtype),
                jnp.zeros((1, cap, cfg.context_dim), cfg.dtype),
                jnp.int32(0),
            )
        fi = (jnp.asarray(self.flow_prev[None]) if
              (self.warm_start and self.flow_prev is not None) else None)
        flow_low, flow_up, key, value = self._step(
            self.params, f1, f2, self.mem, fi
        )
        # memory roll: add this frame's (key, value); with the things
        # config the sieve keeps only the most recent frame
        cap = self.mem.keys.shape[1]
        hw = h * w
        if hw >= cap:
            new_k = key[:, -cap:]
            new_v = value[:, -cap:]
            count = jnp.int32(cap)
        else:
            new_k = jnp.concatenate(
                [self.mem.keys[:, hw:], key], axis=1)[:, -cap:]
            new_v = jnp.concatenate(
                [self.mem.values[:, hw:], value], axis=1)[:, -cap:]
            count = jnp.minimum(self.mem.count + hw, cap)
        self.mem = MemoryState(new_k, new_v, count)
        if self.warm_start:
            self.flow_prev = forward_interpolate_np(np.asarray(flow_low[0]))
        return np.asarray(flow_up[0])


# ------------------------------------------------------------- conversion


def _t_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _t_dwconv(w):
    # torch depthwise (C, 1, k, k) -> flax HWIO with feature_group_count=C
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _convert_pcblock(sd, prefix):
    out = {}
    for i in range(8):  # conv_list indices actually 0..len(k_conv)-1
        key = f"{prefix}.conv_list.{i}.weight"
        if key not in sd:
            break
        out[f"conv_{i}"] = {
            "kernel": _t_dwconv(sd[key]),
            "bias": np.asarray(sd[f"{prefix}.conv_list.{i}.bias"]),
        }
    for ours, theirs in (("ffn1_0", "ffn1.0"), ("ffn1_2", "ffn1.2"),
                         ("pw", "pw"), ("ffn2_0", "ffn2.0"),
                         ("ffn2_2", "ffn2.2")):
        out[ours] = {
            "kernel": _t_conv(sd[f"{prefix}.{theirs}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.{theirs}.bias"]),
        }
    return out


def _convert_encoder(sd, prefix, norm):
    """BasicEncoder keys (cnn.py) -> models/raft.BasicEncoder tree."""
    out: dict = {}
    eps = 1e-5

    def conv_leaf(tk, name):
        out[name] = {"kernel": _t_conv(sd[f"{prefix}.{tk}.weight"]),
                     "bias": np.asarray(sd[f"{prefix}.{tk}.bias"])}

    def bn_leaf(tk, name):
        if norm != "batch":
            return
        wk = f"{prefix}.{tk}.weight"
        if wk not in sd:
            return
        scale = np.asarray(sd[wk]) / np.sqrt(
            np.asarray(sd[f"{prefix}.{tk}.running_var"]) + eps)
        bias = np.asarray(sd[f"{prefix}.{tk}.bias"]) - np.asarray(
            sd[f"{prefix}.{tk}.running_mean"]) * scale
        out[name] = {"scale": scale.astype(np.float32),
                     "bias": bias.astype(np.float32)}

    conv_leaf("conv1", "conv1")
    bn_leaf("norm1", "norm1")
    conv_leaf("conv2", "conv2")
    for lvl in (1, 2, 3):
        for blk in (0, 1):
            node: dict = {}
            for sub in ("conv1", "conv2"):
                node[sub] = {
                    "kernel": _t_conv(sd[f"{prefix}.layer{lvl}.{blk}.{sub}.weight"]),
                    "bias": np.asarray(sd[f"{prefix}.layer{lvl}.{blk}.{sub}.bias"]),
                }
            ds = f"{prefix}.layer{lvl}.{blk}.downsample.0.weight"
            if ds in sd:
                node["downsample_0"] = {
                    "kernel": _t_conv(sd[ds]),
                    "bias": np.asarray(
                        sd[f"{prefix}.layer{lvl}.{blk}.downsample.0.bias"]),
                }
            out[f"layer{lvl}_{blk}"] = node
            if norm == "batch":
                tmp = dict(out)
                for sub, ours in (("norm1", "norm1"), ("norm2", "norm2")):
                    wk = f"{prefix}.layer{lvl}.{blk}.{sub}.weight"
                    if wk in sd:
                        scale = np.asarray(sd[wk]) / np.sqrt(np.asarray(
                            sd[f"{prefix}.layer{lvl}.{blk}.{sub}.running_var"]) + eps)
                        bias = np.asarray(
                            sd[f"{prefix}.layer{lvl}.{blk}.{sub}.bias"]
                        ) - np.asarray(
                            sd[f"{prefix}.layer{lvl}.{blk}.{sub}.running_mean"]
                        ) * scale
                        node[ours] = {"scale": scale.astype(np.float32),
                                      "bias": bias.astype(np.float32)}
                dsn = f"{prefix}.layer{lvl}.{blk}.downsample.1.weight"
                if dsn in sd:
                    scale = np.asarray(sd[dsn]) / np.sqrt(np.asarray(
                        sd[f"{prefix}.layer{lvl}.{blk}.downsample.1.running_var"]) + eps)
                    bias = np.asarray(
                        sd[f"{prefix}.layer{lvl}.{blk}.downsample.1.bias"]
                    ) - np.asarray(
                        sd[f"{prefix}.layer{lvl}.{blk}.downsample.1.running_mean"]
                    ) * scale
                    node["downsample_norm"] = {
                        "scale": scale.astype(np.float32),
                        "bias": bias.astype(np.float32),
                    }
    return out


def convert_memflow_params(sd: dict, cfg: MemFlowSKConfig | None = None) -> dict:
    """MemFlowNet_things.pth state dict -> MemFlowNetSK params. Strips the
    'module.' DDP prefix; att.pos_emb (unused at inference) is ignored."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
    out = {
        "fnet": _convert_encoder(sd, "fnet", "instance"),
        "cnet": _convert_encoder(sd, "cnet", "batch"),
        "to_qk": {"kernel": _t_conv(sd["att.to_qk.weight"])},
        "gamma": np.asarray(sd["update_block.aggregator.gamma"]),
        "update": {
            "encoder": {
                "convc1": _convert_pcblock(sd, "update_block.encoder.convc1"),
                "convc2": _convert_pcblock(sd, "update_block.encoder.convc2"),
                "convf1": {
                    "kernel": _t_conv(sd["update_block.encoder.convf1.weight"]),
                    "bias": np.asarray(sd["update_block.encoder.convf1.bias"]),
                },
                "convf2": _convert_pcblock(sd, "update_block.encoder.convf2"),
                "conv": _convert_pcblock(sd, "update_block.encoder.conv"),
            },
            "gru": _convert_pcblock(sd, "update_block.gru"),
            "flow_head": _convert_pcblock(sd, "update_block.flow_head"),
            "mask_0": {
                "kernel": _t_conv(sd["update_block.mask.0.weight"]),
                "bias": np.asarray(sd["update_block.mask.0.bias"]),
            },
            "mask_2": {
                "kernel": _t_conv(sd["update_block.mask.2.weight"]),
                "bias": np.asarray(sd["update_block.mask.2.bias"]),
            },
            "to_v": {
                "kernel": _t_conv(sd["update_block.aggregator.to_v.weight"])
            },
        },
    }
    return {"params": out}
