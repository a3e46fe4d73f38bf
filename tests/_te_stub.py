"""Behavioral stubs for the reference tree's heavy/unavailable deps so the
torch GeneralDIT can run as a CPU parity oracle.

The reference DiT (cosmos1/models/diffusion/networks/general_dit.py) backs
its attention on TransformerEngine, which is CUDA-only and not installed.
These stubs implement the SAME math in plain torch:

- ``te.pytorch.RMSNorm(dim, eps)``: y = x / sqrt(mean(x^2) + eps) * weight
- ``DotProductAttention``: softmax(QK^T/sqrt(d))V honoring qkv_format
  ("sbhd"/"bshd"), returning heads merged like TE does
- ``apply_rotary_pos_emb(t, freqs, ...)``: non-interleaved rotate-half
  RoPE, freqs (S, 1, 1, D) holding the angle per channel

plus tiny import stubs for loguru-backed cosmos1.utils.log, the
omegaconf-backed cosmos1.utils.lazy_config, and torchvision.transforms
(only `functional.resize` + `InterpolationMode.NEAREST` are touched by
GeneralDIT's padding-mask path).
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

import torch
import torch.nn.functional as F


class _TERMSNorm(torch.nn.Module):
    def __init__(self, dim, eps=1e-6, **kwargs):
        super().__init__()
        self.eps = eps
        self.weight = torch.nn.Parameter(torch.ones(dim))

    def forward(self, x):
        var = x.float().pow(2).mean(dim=-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps) * self.weight.float()
                ).to(x.dtype)


class _DotProductAttention(torch.nn.Module):
    def __init__(self, heads, head_dim, num_gqa_groups=None,
                 attention_dropout=0.0, qkv_format="bshd",
                 attn_mask_type="no_mask", tp_size=1, tp_group=None,
                 sequence_parallel=False, **kwargs):
        super().__init__()
        self.qkv_format = qkv_format

    def forward(self, q, k, v, core_attention_bias_type=None,
                core_attention_bias=None, mask=None):
        if self.qkv_format == "sbhd":
            # (S, B, H, D) -> (B, H, S, D)
            qt, kt, vt = (t.permute(1, 2, 0, 3) for t in (q, k, v))
        else:  # bshd
            qt, kt, vt = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        out = F.scaled_dot_product_attention(qt, kt, vt)
        if self.qkv_format == "sbhd":
            out = out.permute(2, 0, 1, 3)          # (S, B, H, D)
            return out.reshape(out.shape[0], out.shape[1], -1)
        out = out.permute(0, 2, 1, 3)
        return out.reshape(out.shape[0], out.shape[1], -1)


def _rotate_half(x):
    d = x.shape[-1] // 2
    return torch.cat([-x[..., d:], x[..., :d]], dim=-1)


def _apply_rotary_pos_emb(t, freqs, tensor_format="sbhd", fused=True,
                          **kwargs):
    # freqs: (S, 1, 1, D) angles; t: (S, B, H, D) for sbhd
    ang = freqs.float()
    cos, sin = ang.cos(), ang.sin()
    if tensor_format == "bshd":
        cos, sin = cos.permute(1, 0, 2, 3), sin.permute(1, 0, 2, 3)
    return (t.float() * cos + _rotate_half(t.float()) * sin).to(t.dtype)


def _mk_module(name: str, attrs: dict) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_te_stub() -> None:
    """Install transformer_engine/log/lazy_config/torchvision stubs needed
    to import reference diffusion modules on CPU. Idempotent."""
    if "transformer_engine" in sys.modules:
        return
    # position_embedding.py:68 hardcodes `.cuda()` when building its RoPE
    # range buffers; keep them on CPU for the oracle run
    torch.Tensor.cuda = lambda self, *a, **k: self
    te = _mk_module("transformer_engine", {})
    te_pt = _mk_module("transformer_engine.pytorch",
                       {"RMSNorm": _TERMSNorm})
    te.pytorch = te_pt
    te_attn = _mk_module(
        "transformer_engine.pytorch.attention",
        {"DotProductAttention": _DotProductAttention,
         "apply_rotary_pos_emb": _apply_rotary_pos_emb})
    te_pt.attention = te_attn

    def _noop(*a, **k):
        return None

    if "cosmos1.utils.log" not in sys.modules:
        _mk_module("cosmos1.utils.log",
                   {"debug": _noop, "info": _noop, "warning": _noop,
                    "error": _noop, "critical": _noop})
    if "cosmos1.utils.lazy_config" not in sys.modules:
        _mk_module("cosmos1.utils.lazy_config",
                   {"instantiate": lambda cfg, *a, **k: cfg,
                    "LazyCall": lambda f: f, "LazyDict": dict})

    if "torchvision" not in sys.modules:
        tv = _mk_module("torchvision", {})

        class _Interp:
            NEAREST = "nearest"
            BILINEAR = "bilinear"

        def _resize(img, size, interpolation=None, **kwargs):
            if list(img.shape[-2:]) == list(size):
                return img
            need_sq = img.dim() == 3
            x = img[None] if need_sq else img
            mode = "bilinear" if interpolation == "bilinear" else "nearest"
            out = F.interpolate(
                x.float(), size=tuple(size), mode=mode,
                **({"align_corners": False} if mode == "bilinear" else {}))
            return out[0] if need_sq else out

        func = _mk_module("torchvision.transforms.functional",
                          {"resize": _resize})
        transforms = _mk_module(
            "torchvision.transforms",
            {"functional": func, "InterpolationMode": _Interp})
        tv.transforms = transforms
