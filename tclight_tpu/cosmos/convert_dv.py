"""Torch -> Flax converter for Cosmos discrete video tokenizer weights.

Maps `CausalDiscreteVideoTokenizer` state dicts (the layout inside the
reference's encoder/decoder JIT checkpoints after
tokenizer/discrete_video.py:305-349 strips the captured buffers) onto
`tclight_tpu.cosmos.dv_tokenizer.CausalDiscreteVideoTokenizer`.

Conv3d weights transpose (O, I, kT, kH, kW) -> (kT, kH, kW, I, O);
GroupNorm weight/bias -> scale/bias. Non-persistent buffers
(patcher wavelets, FSQ levels/basis/codebook) are recomputed from the
config and skipped.

Torch name -> Flax path (dots become module-name underscores where the
reference uses nn.ModuleList/Sequential indices):
  encoder.conv_in.0.conv3d.*          -> encoder/conv_in_0/conv/*
  encoder.down.1.block.0.conv1.0.conv3d.*
      -> encoder/down_1_block_0/conv1_0/conv/*
  encoder.down.0.attn.0.1.q.conv3d.*  -> encoder/down_0_attn_0_1/q/conv/*
  encoder.down.0.downsample.conv2.conv3d.*
      -> encoder/down_0_downsample/conv2/conv/*
  encoder.mid.attn_1.0.norm.norm.*    -> encoder/mid_attn_1_0/norm/norm/*
  decoder.up.2.upsample.conv3.conv3d.* -> decoder/up_2_upsample/conv3/conv/*
  quant_conv.conv3d.*                 -> quant_conv/conv/*
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

__all__ = ["convert_dv_tokenizer"]

_SKIP = re.compile(
    r"(^|\.)(patcher3d|unpatcher3d)\.|^quantizer\.|"
    r"\.(wavelets|_arange|patch_size_buffer)$")

# torch module-path fragments that join into one flax module name
_JOIN = [
    (re.compile(r"^(encoder|decoder)\.conv_(in|out)\.([01])\."),
     r"\1/conv_\2_\3/"),
    (re.compile(r"^(encoder)\.down\.(\d+)\.block\.(\d+)\."),
     r"\1/down_\2_block_\3/"),
    (re.compile(r"^(encoder)\.down\.(\d+)\.attn\.(\d+)\.([01])\."),
     r"\1/down_\2_attn_\3_\4/"),
    (re.compile(r"^(encoder)\.down\.(\d+)\.downsample\."),
     r"\1/down_\2_downsample/"),
    (re.compile(r"^(decoder)\.up\.(\d+)\.block\.(\d+)\."),
     r"\1/up_\2_block_\3/"),
    (re.compile(r"^(decoder)\.up\.(\d+)\.attn\.(\d+)\.([01])\."),
     r"\1/up_\2_attn_\3_\4/"),
    (re.compile(r"^(decoder)\.up\.(\d+)\.upsample\."), r"\1/up_\2_upsample/"),
    (re.compile(r"^(encoder|decoder)\.mid\.(block_[12]|attn_1\.([01]))\."),
     lambda m: f"{m.group(1)}/mid_{m.group(2).replace('.', '_')}/"),
    (re.compile(r"^(encoder|decoder)\.norm_out\."), r"\1/norm_out/"),
    (re.compile(r"^(quant_conv|post_quant_conv)\."), r"\1/"),
]

# leaf renames inside a block: (pattern, flax path template); conv
# weights become kernel, norm weights become scale
_LEAF = [
    (re.compile(r"^conv([12])\.([01])\.conv3d\.(weight|bias)$"),
     r"conv\1_\2/conv/\3"),                      # factorized resnet convs
    (re.compile(r"^(nin_shortcut|q|k|v|proj_out|conv[123])\.conv3d"
                r"\.(weight|bias)$"), r"\1/conv/\2"),
    (re.compile(r"^(norm[12]|norm)\.norm\.(weight|bias)$"),
     r"\1/norm/\2"),                             # resnet/attn norms
    (re.compile(r"^norm\.(weight|bias)$"), r"norm/\1"),   # norm_out
    (re.compile(r"^conv3d\.(weight|bias)$"), r"conv/\1"),  # quant convs
]


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def convert_dv_tokenizer(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference CausalDiscreteVideoTokenizer state dict -> {'params':...}
    for the Flax module (channel-last kernels)."""
    params: dict = {}
    unused: list[str] = []
    for key, val in sd.items():
        if _SKIP.search(key):
            continue
        v = np.asarray(val)
        rest = key
        prefix = ""
        for pat, rep in _JOIN:
            m = pat.match(rest)
            if m:
                prefix = m.expand(rep) if isinstance(rep, str) else rep(m)
                rest = rest[m.end():]
                break
        leaf = None
        for pat, rep in _LEAF:
            m = pat.match(rest)
            if m:
                leaf = m.expand(rep)
                break
        if not prefix or leaf is None:
            unused.append(key)
            continue
        if leaf.endswith("conv/weight"):
            leaf = leaf[:-6] + "kernel"
            v = v.transpose(2, 3, 4, 1, 0)     # (O,I,kT,kH,kW) -> flax
        elif leaf.endswith("norm/weight"):
            leaf = leaf[:-6] + "scale"
        _set(params, prefix + leaf, v)
    if unused:
        raise ValueError(f"unconverted DV tokenizer keys: {unused[:8]}"
                         f"{'...' if len(unused) > 8 else ''}")
    return {"params": params}
