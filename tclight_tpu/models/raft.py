"""RAFT optical flow in Flax (NHWC, TPU-first).

Rebuild of the reference's vendored RAFT stack (utils/evaluation/core/:
`RAFT` raft.py:11-131, `BasicEncoder` extractor.py, `CorrBlock`/
`AlternateCorrBlock` corr.py:12-91, GRU update blocks update.py, and the
native `alt_cuda_corr` extension, SURVEY §2.5).

Correlation on TPU: the reference's two paths are (a) a dense all-pairs
(HW)^2 volume + grid_sample lookup, and (b) the alt_cuda_corr CUDA kernel
computing <f1[x], f2[x+flow+d]> on the fly to save memory. Here:
- `corr_pyramid` builds the dense pyramid with one MXU einsum per level
  (XLA-friendly; default, like the reference's default CorrBlock);
- `corr_lookup` samples the (2r+1)^2 neighborhood with a vectorized
  bilinear gather;
- `corr_lookup_chunked` is the memory-efficient equivalent of
  alt_cuda_corr: it never materializes the (HW)^2 volume — queries are
  processed in chunks, each chunk's correlation row-block computed by an
  MXU matmul and immediately reduced by the windowed gather. On TPU this
  is bound by the same matmul the CUDA kernel does in registers, so a
  hand-scheduled kernel buys nothing XLA doesn't already fuse.

Weight conversion from the official `raft-things.pth` via
`convert_raft_params` (module-prefix stripping as in eval_utils.py:186-196).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 20
    fnet_dim: int = 256
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "RAFTConfig":
        return RAFTConfig(hidden_dim=32, context_dim=32, corr_levels=2,
                          corr_radius=2, iters=4, fnet_dim=64)


def _conv(ch, k, s=1, name=None, dtype=jnp.float32):
    pad = k // 2
    return nn.Conv(ch, (k, k), strides=(s, s), padding=((pad, pad), (pad, pad)),
                   dtype=dtype, name=name)


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=False): per-(sample, channel) spatial
    normalization, no learned params."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class FrozenAffine(nn.Module):
    """torch BatchNorm2d in eval mode: a per-channel affine with the
    running statistics folded in by the converter (scale, bias)."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x * scale + bias


def _norm(kind: str, name: str):
    return FrozenAffine(name=name) if kind == "batch" else InstanceNorm(name=name)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    norm: str = "instance"   # 'instance' or 'batch' (eval-mode affine)

    @nn.compact
    def __call__(self, x):
        y = _conv(self.planes, 3, self.stride, "conv1", self.dtype)(x)
        y = _norm(self.norm, "norm1")(y)
        y = nn.relu(y)
        y = _conv(self.planes, 3, 1, "conv2", self.dtype)(y)
        y = _norm(self.norm, "norm2")(y)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = _conv(self.planes, 1, self.stride, "downsample_0", self.dtype)(x)
            x = _norm(self.norm, "downsample_norm")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT feature/context encoder: 1/8 resolution, `output_dim` channels."""

    output_dim: int = 256
    base: int = 64
    dtype: Dtype = jnp.float32
    norm: str = "instance"   # reference: fnet 'instance', cnet 'batch'

    @nn.compact
    def __call__(self, x):
        b = self.base
        x = _conv(b, 7, 2, "conv1", self.dtype)(x)
        x = _norm(self.norm, "norm1")(x)
        x = nn.relu(x)
        x = ResidualBlock(b, 1, self.dtype, self.norm, name="layer1_0")(x)
        x = ResidualBlock(b, 1, self.dtype, self.norm, name="layer1_1")(x)
        x = ResidualBlock(b * 3 // 2, 2, self.dtype, self.norm, name="layer2_0")(x)
        x = ResidualBlock(b * 3 // 2, 1, self.dtype, self.norm, name="layer2_1")(x)
        x = ResidualBlock(b * 2, 2, self.dtype, self.norm, name="layer3_0")(x)
        x = ResidualBlock(b * 2, 1, self.dtype, self.norm, name="layer3_1")(x)
        return _conv(self.output_dim, 1, 1, "conv2", self.dtype)(x)


# ------------------------------------------------------------- correlation


def corr_pyramid(f1: jnp.ndarray, f2: jnp.ndarray, levels: int) -> list:
    """All-pairs correlation pyramid. f1/f2: (B, H, W, C) ->
    [(B, H*W, H_l, W_l)] per level (corr.py CorrBlock.__init__)."""
    b, h, w, c = f1.shape
    corr = jnp.einsum("bxc,byc->bxy", f1.reshape(b, h * w, c),
                      f2.reshape(b, h * w, c),
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(b, h * w, h, w)
    pyramid = [corr]
    for _ in range(levels - 1):
        corr = jax.lax.reduce_window(
            corr, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) / 4.0
        pyramid.append(corr)
    return pyramid


def _bilinear_gather(plane: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """plane (Q, H, W); x/y (Q, K) sample coords (zero padding) ->
    (Q, K)."""
    qn, h, w = plane.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(iy, ix):
        valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        flat = plane.reshape(qn, h * w)
        vals = jnp.take_along_axis(flat, iyc * w + ixc, axis=1)
        return jnp.where(valid, vals, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def corr_lookup(pyramid: list, coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sample the (2r+1)^2 window at each pyramid level around `coords`
    (B, H, W, 2) -> (B, H, W, levels*(2r+1)^2). (corr.py CorrBlock.__call__)"""
    b, h, w, _ = coords.shape
    r = radius
    # torch quirk (corr.py:99-105): delta = stack(meshgrid(dy, dx)) is added
    # onto (x, y) coords, so the flattened window order is X-MAJOR —
    # checkpoint conv weights depend on this exact channel order
    dx, dy = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        indexing="ij",
    )
    offs_x = dx.reshape(-1)
    offs_y = dy.reshape(-1)
    outs = []
    for lvl, corr in enumerate(pyramid):
        scale = 2.0**lvl
        cx = coords[..., 0].reshape(b * h * w, 1) / scale + offs_x[None]
        cy = coords[..., 1].reshape(b * h * w, 1) / scale + offs_y[None]
        plane = corr.reshape(b * h * w, corr.shape[2], corr.shape[3])
        vals = _bilinear_gather(plane, cx, cy)
        outs.append(vals.reshape(b, h, w, -1))
    return jnp.concatenate(outs, axis=-1)


def corr_lookup_chunked(
    f1: jnp.ndarray, f2: jnp.ndarray, coords: jnp.ndarray,
    levels: int, radius: int, chunk: int = 1024,
) -> jnp.ndarray:
    """Memory-efficient on-the-fly correlation (alt_cuda_corr equivalent,
    correlation_kernel.cu:19-323): no (HW)^2 volume; per query chunk one
    MXU matmul + windowed gather."""
    b, h, w, c = f1.shape
    # pyramid of f2 feature maps (avg-pooled), correlation computed per level
    f2_levels = [f2]
    for _ in range(levels - 1):
        f2_levels.append(
            jax.lax.reduce_window(
                f2_levels[-1], 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
        )
    # NOTE: pooling features != pooling correlations (reference pools the
    # correlation volume). For exact parity use corr_pyramid; this path is
    # the bounded-memory approximation used only when the dense volume
    # cannot fit (long 1280x720 videos on small HBM).
    q = h * w
    f1_flat = f1.reshape(b, q, c)
    outs = []
    r = radius
    # torch quirk (corr.py:99-105): delta = stack(meshgrid(dy, dx)) is added
    # onto (x, y) coords, so the flattened window order is X-MAJOR —
    # checkpoint conv weights depend on this exact channel order
    dx, dy = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        indexing="ij",
    )
    for lvl, f2l in enumerate(f2_levels):
        hl, wl = f2l.shape[1], f2l.shape[2]
        f2_flat = f2l.reshape(b, hl * wl, c)
        scale = 2.0**lvl

        def level_lookup(f1b, f2b, coordsb):
            def do_chunk(i):
                sl = jax.lax.dynamic_slice_in_dim(f1b, i * chunk, chunk, 0)
                cxy = jax.lax.dynamic_slice_in_dim(
                    coordsb.reshape(q, 2), i * chunk, chunk, 0
                )
                scores = (sl @ f2b.T) / jnp.sqrt(jnp.float32(c))  # (chunk, HW_l)
                plane = scores.reshape(chunk, hl, wl)
                cx = cxy[:, :1] / scale + dx.reshape(1, -1)
                cy = cxy[:, 1:] / scale + dy.reshape(1, -1)
                return _bilinear_gather(plane, cx, cy)

            n_chunks = -(-q // chunk)
            pad_q = n_chunks * chunk
            f1b = jnp.pad(f1b, ((0, pad_q - q), (0, 0)))
            coordsb = jnp.pad(coordsb.reshape(q, 2), ((0, pad_q - q), (0, 0)))
            vals = jax.lax.map(do_chunk, jnp.arange(n_chunks))
            return vals.reshape(pad_q, -1)[:q]

        vals = jax.vmap(level_lookup)(f1_flat, f2_flat, coords.reshape(b, q, 2))
        outs.append(vals.reshape(b, h, w, -1))
    return jnp.concatenate(outs, axis=-1)


# ------------------------------------------------------------- update block


class BasicMotionEncoder(nn.Module):
    corr_planes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(_conv(256, 1, 1, "convc1", self.dtype)(corr))
        c = nn.relu(_conv(192, 3, 1, "convc2", self.dtype)(c))
        f = nn.relu(_conv(128, 7, 1, "convf1", self.dtype)(flow))
        f = nn.relu(_conv(64, 3, 1, "convf2", self.dtype)(f))
        out = nn.relu(_conv(126, 3, 1, "conv", self.dtype)(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128 channels


class SepConvGRU(nn.Module):
    hidden: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        def gru_pass(h, x, kh, kw, suffix):
            pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
            conv = lambda name: nn.Conv(self.hidden, (kh, kw), padding=pad,
                                        dtype=self.dtype, name=name)
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(conv(f"convz{suffix}")(hx))
            r = nn.sigmoid(conv(f"convr{suffix}")(hx))
            q = nn.tanh(conv(f"convq{suffix}")(
                jnp.concatenate([r * h, x], axis=-1)))
            return (1 - z) * h + z * q

        h = gru_pass(h, x, 1, 5, "1")
        h = gru_pass(h, x, 5, 1, "2")
        return h


class FlowHead(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_conv(256, 3, 1, "conv1", self.dtype)(x))
        return _conv(2, 3, 1, "conv2", self.dtype)(x)


class BasicUpdateBlock(nn.Module):
    corr_planes: int
    hidden: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.corr_planes, self.dtype,
                                    name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden, self.dtype, name="gru")(net, x)
        delta = FlowHead(self.dtype, name="flow_head")(net)
        mask = nn.relu(_conv(256, 3, 1, "mask_0", self.dtype)(net))
        mask = _conv(64 * 9, 1, 1, "mask_2", self.dtype)(mask)
        return net, 0.25 * mask, delta


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """8x convex upsampling (raft.py upsample_flow). flow (B,H,W,2),
    mask (B,H,W,576) -> (B,8H,8W,2)."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 neighborhoods of (8 * flow)
    fpad = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neighbors = jnp.stack(
        [fpad[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, neighbors)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)
    return up


class RAFT(nn.Module):
    """RAFT forward: (image1, image2) in [0, 1] -> flow at full resolution.

    Iterative refinement as one `lax.scan` over `iters` (static), dense
    correlation pyramid by default."""

    config: RAFTConfig = RAFTConfig()

    @nn.compact
    def __call__(self, image1, image2, iters: int | None = None,
                 init_flow: jnp.ndarray | None = None):
        cfg = self.config
        iters = iters or cfg.iters
        x1 = 2.0 * image1 - 1.0
        x2 = 2.0 * image2 - 1.0

        fnet = BasicEncoder(cfg.fnet_dim, base=cfg.fnet_dim // 4,
                            dtype=cfg.dtype, norm="instance", name="fnet")
        cnet = BasicEncoder(cfg.hidden_dim + cfg.context_dim,
                            base=cfg.fnet_dim // 4, dtype=cfg.dtype,
                            norm="batch", name="cnet")
        f1 = fnet(x1)
        f2 = fnet(x2)
        ctx = cnet(x1)
        net = jnp.tanh(ctx[..., : cfg.hidden_dim])
        inp = nn.relu(ctx[..., cfg.hidden_dim :])

        b, h8, w8, _ = f1.shape
        pyramid = corr_pyramid(f1, f2, cfg.corr_levels)
        corr_planes = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
        update = BasicUpdateBlock(corr_planes, cfg.hidden_dim, cfg.dtype,
                                  name="update_block")

        ys, xs = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                              jnp.arange(w8, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.broadcast_to(jnp.stack([xs, ys], -1), (b, h8, w8, 2))
        coords1 = coords0 if init_flow is None else coords0 + init_flow

        flow_up = None
        for _ in range(iters):  # unrolled; shapes static, XLA CSEs the body
            corr = corr_lookup(pyramid, coords1, cfg.corr_radius)
            flow = coords1 - coords0
            net, mask, delta = update(net, inp, corr, flow)
            coords1 = coords1 + delta
        flow = coords1 - coords0
        flow_up = convex_upsample(flow, mask)
        return flow_up, flow


# --------------------------------------------------------------- conversion


def convert_raft_params(sd: dict, config: RAFTConfig = RAFTConfig()) -> dict:
    """Official raft-things.pth -> our params. Strips the 'module.' DDP
    prefix (eval_utils.py:186-196) and maps torch names."""
    import re

    from tclight_tpu.models.convert import _conv as conv_t, _lin  # noqa: F401

    def convw(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    out: dict = {}

    def put(path, val):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    # collect batch-norm pieces (cnet uses BatchNorm2d; eval-mode running
    # stats fold into a per-channel affine — see FrozenAffine)
    bn_raw: dict = {}

    def put_bn(path, leaf, val):
        bn_raw.setdefault(path, {})[leaf] = val

    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        v = np.asarray(v)
        parts = k.split(".")
        top = parts[0]  # fnet/cnet/update_block
        rest = parts[1:]
        if top in ("fnet", "cnet"):
            name = rest[0]
            if name.startswith("layer"):
                lvl = name[-1]
                blk = rest[1]
                sub = rest[2]
                leaf = rest[3]
                if sub == "downsample":
                    # torch: downsample.0 (conv) / downsample.1 (norm)
                    leaf = rest[4]
                    if rest[3] == "0":
                        put(f"{top}/layer{lvl}_{blk}/downsample_0/"
                            f"{'kernel' if leaf == 'weight' else 'bias'}",
                            convw(v) if leaf == "weight" else v)
                    else:  # norm3 inside the Sequential (batch only)
                        put_bn(f"{top}/layer{lvl}_{blk}/downsample_norm",
                               leaf, v)
                    continue
                if sub.startswith("norm"):
                    # instance norm: no params; batch norm: collect
                    put_bn(f"{top}/layer{lvl}_{blk}/{sub}", leaf, v)
                    continue
                put(f"{top}/layer{lvl}_{blk}/{sub}/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}",
                    convw(v) if leaf == "weight" else v)
            elif name.startswith("norm"):
                put_bn(f"{top}/{name}", rest[1], v)
            else:  # conv1 / conv2
                leaf = rest[1]
                put(f"{top}/{name}/{'kernel' if leaf == 'weight' else 'bias'}",
                    convw(v) if leaf == "weight" else v)
        elif top == "update_block":
            sub = rest[0]
            if sub == "encoder":
                put(f"update_block/encoder/{rest[1]}/"
                    f"{'kernel' if rest[2] == 'weight' else 'bias'}",
                    convw(v) if rest[2] == "weight" else v)
            elif sub == "gru":
                put(f"update_block/gru/{rest[1]}/"
                    f"{'kernel' if rest[2] == 'weight' else 'bias'}",
                    convw(v) if rest[2] == "weight" else v)
            elif sub == "flow_head":
                put(f"update_block/flow_head/{rest[1]}/"
                    f"{'kernel' if rest[2] == 'weight' else 'bias'}",
                    convw(v) if rest[2] == "weight" else v)
            elif sub == "mask":
                idx = rest[1]  # 0 or 2 (1 is ReLU)
                put(f"update_block/mask_{idx}/"
                    f"{'kernel' if rest[2] == 'weight' else 'bias'}",
                    convw(v) if rest[2] == "weight" else v)
    # fold eval-mode BatchNorm running stats into FrozenAffine params.
    # Norms with only running buffers and no weight (InstanceNorm with
    # track_running_stats, unusual) are skipped like parameterless norms.
    eps = 1e-5
    for path, pieces in bn_raw.items():
        if "weight" not in pieces:
            continue
        scale = pieces["weight"] / np.sqrt(pieces["running_var"] + eps)
        bias = pieces["bias"] - pieces["running_mean"] * scale
        put(f"{path}/scale", scale.astype(np.float32))
        put(f"{path}/bias", bias.astype(np.float32))
    return {"params": out}


class RAFTFlowModel:
    """Convenience wrapper used by the data layer's 'raft' backend."""

    def __init__(self, params, config: RAFTConfig = RAFTConfig()):
        self.model = RAFT(config)
        self.params = params
        self._fn = jax.jit(
            lambda p, a, b: self.model.apply(p, a, b)[0]
        )

    def batched_flow(self, frames_a: np.ndarray, frames_b: np.ndarray,
                     batch: int = 4) -> np.ndarray:
        outs = []
        for i in range(0, len(frames_a), batch):
            fa = jnp.asarray(frames_a[i : i + batch])
            fb = jnp.asarray(frames_b[i : i + batch])
            outs.append(np.asarray(self._fn(self.params, fa, fb)))
        return np.concatenate(outs)
