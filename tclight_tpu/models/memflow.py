"""MemFlow-style streaming optical flow: RAFT backbone + bounded KV motion
memory across frames.

Rebuild of the reference's MemFlow stack (utils/evaluation/memflow/:
`MemFlowNet` MemFlow.py, GMA attention gma.py, the `InferenceCore.step`
streaming API inference_core_skflow.py:6-54, and the bounded
`MemoryManager`/`kv_memory_store`). The design is kept TPU-native:

- the per-frame update is one jitted function with static shapes;
- the long-term memory is a fixed-capacity ring buffer of (key, value)
  feature tokens (the reference grows memory then prunes; a ring with
  static capacity jits cleanly and bounds HBM identically);
- motion features are aggregated with cross-attention from the current
  frame's context queries into the memory bank (GMA-style aggregation),
  added to the RAFT motion encoder output before the GRU.

`forward_interpolate` warm-starts each frame pair from the previous flow
(video_dataparser.py calc_flow :141-156).

Note: this module is architecture-equivalent, not yet checkpoint-compatible
with MemFlowNet_things.pth (the converter lands with the weight-porting
pass; RAFT is the default flow model as in the reference).
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
    BasicUpdateBlock,
    RAFTConfig,
    convex_upsample,
    corr_lookup,
    corr_pyramid,
)

__all__ = ["MemFlowConfig", "MemFlowNet", "MemoryState", "InferenceCore",
           "forward_interpolate"]


@dataclasses.dataclass(frozen=True)
class MemFlowConfig:
    raft: RAFTConfig = RAFTConfig()
    mem_capacity: int = 16      # memory tokens per spatial position group
    mem_dim: int = 128
    n_heads: int = 1

    @staticmethod
    def tiny() -> "MemFlowConfig":
        return MemFlowConfig(raft=RAFTConfig.tiny(), mem_capacity=4,
                             mem_dim=32)


class MemoryState(NamedTuple):
    """Fixed-capacity ring buffer of motion memory tokens.

    keys/values: (B, capacity, H8*W8, D); count: scalar int32."""

    keys: jnp.ndarray
    values: jnp.ndarray
    count: jnp.ndarray


def init_memory(cfg: MemFlowConfig, batch: int, h8: int, w8: int) -> MemoryState:
    shape = (batch, cfg.mem_capacity, h8 * w8, cfg.mem_dim)
    return MemoryState(
        keys=jnp.zeros(shape, jnp.float32),
        values=jnp.zeros(shape, jnp.float32),
        count=jnp.asarray(0, jnp.int32),
    )


class MemoryAggregator(nn.Module):
    """Cross-attend current-frame queries into the memory bank and project
    an additive motion-feature residual (GMA/SKII aggregation role)."""

    cfg: MemFlowConfig
    out_dim: int

    def setup(self):
        d = self.cfg.mem_dim
        self.to_q = nn.Dense(d)
        self.proj = nn.Dense(self.out_dim)
        self.mem_k = nn.Dense(d)
        self.mem_v = nn.Dense(d)

    def __call__(self, context, motion, memory: MemoryState):
        cfg = self.cfg
        b, h, w, _ = motion.shape
        d = cfg.mem_dim
        q = self.to_q(context).reshape(b, h * w, d)
        mem_k = memory.keys.reshape(b, -1, d)      # (B, cap*HW, D)
        mem_v = memory.values.reshape(b, -1, d)
        # mask out unwritten slots
        slot = jnp.arange(cfg.mem_capacity)
        valid = (slot < memory.count)[None, :, None]
        valid = jnp.broadcast_to(valid, memory.keys.shape[:3]).reshape(b, -1)

        logits = jnp.einsum("bqd,bkd->bqk", q, mem_k) / np.sqrt(d)
        logits = jnp.where(valid[:, None, :], logits, -1e30)
        # when memory is empty all logits are -1e30; softmax yields uniform
        # -> gate by count to produce a zero residual
        probs = jax.nn.softmax(logits, axis=-1)
        agg = jnp.einsum("bqk,bkd->bqd", probs, mem_v)
        agg = jnp.where(memory.count > 0, agg, 0.0)
        res = self.proj(agg.reshape(b, h, w, d))
        return motion + res

    def write(self, context, motion, memory: MemoryState) -> MemoryState:
        """Append this frame's (key, value) tokens at the ring position."""
        cfg = self.cfg
        b, h, w, _ = motion.shape
        k = self.mem_k(context).reshape(b, 1, h * w, cfg.mem_dim)
        v = self.mem_v(motion).reshape(b, 1, h * w, cfg.mem_dim)
        slot = memory.count % cfg.mem_capacity
        keys = jax.lax.dynamic_update_slice(memory.keys, k, (0, slot, 0, 0))
        values = jax.lax.dynamic_update_slice(memory.values, v, (0, slot, 0, 0))
        return MemoryState(keys, values, memory.count + 1)


class MemFlowNet(nn.Module):
    """Streaming flow: step(frame_t, frame_t+1, memory) -> (flow, memory)."""

    cfg: MemFlowConfig = MemFlowConfig()

    def setup(self):
        r = self.cfg.raft
        self.fnet = BasicEncoder(r.fnet_dim, base=r.fnet_dim // 4, name="fnet")
        self.cnet = BasicEncoder(r.hidden_dim + r.context_dim,
                                 base=r.fnet_dim // 4, name="cnet")
        corr_planes = r.corr_levels * (2 * r.corr_radius + 1) ** 2
        self.update = BasicUpdateBlock(corr_planes, r.hidden_dim,
                                       name="update_block")
        self.aggregator = MemoryAggregator(self.cfg, out_dim=r.context_dim,
                                           name="memory")

    def __call__(self, image1, image2, memory: MemoryState | None = None,
                 init_flow=None, iters: int | None = None):
        r = self.cfg.raft
        iters = iters or r.iters
        f1 = self.fnet(2 * image1 - 1)
        f2 = self.fnet(2 * image2 - 1)
        ctx = self.cnet(2 * image1 - 1)
        net = jnp.tanh(ctx[..., : r.hidden_dim])
        inp = nn.relu(ctx[..., r.hidden_dim :])
        b, h8, w8, _ = f1.shape
        if memory is None:
            memory = init_memory(self.cfg, b, h8, w8)

        pyramid = corr_pyramid(f1, f2, r.corr_levels)
        ys, xs = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                              jnp.arange(w8, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.broadcast_to(jnp.stack([xs, ys], -1), (b, h8, w8, 2))
        coords1 = coords0 if init_flow is None else coords0 + init_flow

        # memory aggregation enriches the context features once per frame
        # (the reference aggregates motion features from memory before the
        # GRU iterations; InferenceCore writes memory after each frame)
        inp = self.aggregator(inp, inp, memory)

        mask = None
        for _ in range(iters):
            corr = corr_lookup(pyramid, coords1, r.corr_radius)
            flow = coords1 - coords0
            net, mask, delta = self.update(net, inp, corr, flow)
            coords1 = coords1 + delta
        flow8 = coords1 - coords0
        new_memory = self.aggregator.write(inp, net, memory)
        flow_up = convex_upsample(flow8, mask)
        return flow_up, flow8, new_memory


def forward_interpolate(flow8: np.ndarray) -> np.ndarray:
    """Forward-splat the previous coarse flow as the next pair's init
    (RAFT utils.forward_interpolate; video_dataparser.py:141-156). Host-side
    numpy: scatter each pixel's flow to its target, fill holes with 0."""
    h, w, _ = flow8.shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    tx = np.round(xs + flow8[..., 0]).astype(np.int64)
    ty = np.round(ys + flow8[..., 1]).astype(np.int64)
    ok = (tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
    out = np.zeros_like(flow8)
    cnt = np.zeros((h, w, 1), np.float32)
    np.add.at(out, (ty[ok], tx[ok]), flow8[ok])
    np.add.at(cnt, (ty[ok], tx[ok], np.zeros_like(ty[ok])), 1.0)
    nz = cnt[..., 0] > 0
    out[nz] /= cnt[nz]
    return out


class InferenceCore:
    """Streaming API over frame pairs with persistent memory
    (inference_core_skflow.py:6-54)."""

    def __init__(self, model: MemFlowNet, params, warm_start: bool = True):
        self.model = model
        self.params = params
        self.warm_start = warm_start
        self.memory: MemoryState | None = None
        self._prev_flow8: np.ndarray | None = None
        self._fn = jax.jit(
            lambda p, a, b, mem, init: self.model.apply(p, a, b, mem, init)
        )

    def reset(self):
        self.memory = None
        self._prev_flow8 = None

    def step(self, frame_a: np.ndarray, frame_b: np.ndarray) -> np.ndarray:
        a = jnp.asarray(frame_a[None])
        b = jnp.asarray(frame_b[None])
        h8 = frame_a.shape[0] // 8
        w8 = frame_a.shape[1] // 8
        if self.memory is None:
            self.memory = init_memory(self.model.cfg, 1, h8, w8)
        init = None
        if self.warm_start and self._prev_flow8 is not None:
            init = jnp.asarray(forward_interpolate(self._prev_flow8)[None])
        flow_up, flow8, self.memory = self._fn(self.params, a, b, self.memory, init)
        self._prev_flow8 = np.asarray(flow8[0])
        return np.asarray(flow_up[0])
