"""Torch -> Flax converter for Cosmos GeneralDIT state dicts.

Maps the reference parameterization (cosmos1/models/diffusion/networks/
general_dit.py + module/blocks.py + module/attention.py) onto the Flax
GeneralDIT in `tclight_tpu/cosmos/dit.py`. Linear weights transpose
(out, in) -> (in, out); RMSNorm weights and the learnable per-axis
positional embeddings copy through; non-persistent RoPE buffers
(`pos_embedder.*`) are recomputed from the config and skipped here.

Torch name -> Flax path:
  x_embedder.proj.1.weight           -> x_embedder/kernel (T)
  t_embedder.1.linear_{1,2}.*        -> t_embedder/linear_{1,2}/*
  affline_norm.weight                -> affline_norm/weight
  extra_pos_embedder.pos_emb_{t,h,w} -> extra_pos_embedder/pos_emb_{t,h,w}
  blocks.block{i}.blocks.{j}.adaLN_modulation.{1,2}.weight
      -> block{i}/blocks_{j}/adaLN_modulation/adaLN_modulation_{1,2}/kernel
  blocks.block{i}.blocks.{j}.block.attn.to_{q,k,v}.0.weight
      -> block{i}/blocks_{j}/attn/to_{q,k,v}_0/kernel
  blocks.block{i}.blocks.{j}.block.attn.to_{q,k}.1.weight
      -> block{i}/blocks_{j}/attn/to_{q,k}_1/weight
  blocks.block{i}.blocks.{j}.block.attn.to_out.0.weight
      -> block{i}/blocks_{j}/attn/to_out_0/kernel
  blocks.block{i}.blocks.{j}.block.layer{1,2}.weight
      -> block{i}/blocks_{j}/layer{1,2}/kernel
  final_layer.linear.weight          -> final_layer/linear/kernel
  final_layer.adaLN_modulation.{1,2}.weight
      -> final_layer/adaLN_modulation/adaLN_modulation_{1,2}/kernel
  augment_sigma_embedder.1.linear_{1,2}.*  (VideoExtendGeneralDIT)
      -> augment_sigma_embedder/linear_{1,2}/*
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

__all__ = ["convert_general_dit", "convert_diffusion_decoder_dit"]

_SKIP = re.compile(
    r"^(pos_embedder\.|accum_|.*\.seq$|.*dim_spatial_range$|"
    r".*dim_temporal_range$)")


def _lin(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def convert_general_dit(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference GeneralDIT / VideoExtendGeneralDIT state dict ->
    {'params': ...} for `tclight_tpu.cosmos.dit.GeneralDIT`."""
    params: dict = {}
    unused: list[str] = []
    for key, val in sd.items():
        v = np.asarray(val)
        if _SKIP.match(key):
            continue
        if key == "x_embedder.proj.1.weight":
            _set(params, "x_embedder/kernel", _lin(v))
        elif m := re.match(r"^(t_embedder\.1|augment_sigma_embedder\.1)"
                           r"\.linear_([12])\.(weight|bias)$", key):
            mod = m.group(1).split(".")[0]
            name = "kernel" if m.group(3) == "weight" else "bias"
            w = _lin(v) if m.group(3) == "weight" else v
            _set(params, f"{mod}/linear_{m.group(2)}/{name}", w)
        elif key == "affline_norm.weight":
            _set(params, "affline_norm/weight", v)
        elif m := re.match(r"^extra_pos_embedder\.(pos_emb_[thw])$", key):
            _set(params, f"extra_pos_embedder/{m.group(1)}", v)
        elif m := re.match(
                r"^blocks\.block(\d+)\.blocks\.(\d+)\.(.+)$", key):
            base = f"block{m.group(1)}/blocks_{m.group(2)}"
            rest = m.group(3)
            if mm := re.match(r"^adaLN_modulation\.([12])\.weight$", rest):
                _set(params,
                     f"{base}/adaLN_modulation/"
                     f"adaLN_modulation_{mm.group(1)}/kernel", _lin(v))
            elif mm := re.match(r"^block\.attn\.to_(q|k|v)\.0\.weight$",
                                rest):
                _set(params, f"{base}/attn/to_{mm.group(1)}_0/kernel",
                     _lin(v))
            elif mm := re.match(r"^block\.attn\.to_(q|k)\.1\.weight$", rest):
                _set(params, f"{base}/attn/to_{mm.group(1)}_1/weight", v)
            elif rest == "block.attn.to_out.0.weight":
                _set(params, f"{base}/attn/to_out_0/kernel", _lin(v))
            elif mm := re.match(r"^block\.layer([12])\.weight$", rest):
                _set(params, f"{base}/layer{mm.group(1)}/kernel", _lin(v))
            else:
                unused.append(key)
        elif m := re.match(r"^final_layer\.adaLN_modulation\.([12])"
                           r"\.weight$", key):
            _set(params,
                 f"final_layer/adaLN_modulation/"
                 f"adaLN_modulation_{m.group(1)}/kernel", _lin(v))
        elif key == "final_layer.linear.weight":
            _set(params, "final_layer/linear/kernel", _lin(v))
        else:
            unused.append(key)
    if unused:
        raise ValueError(f"unconverted GeneralDIT keys: {unused[:8]}"
                         f"{'...' if len(unused) > 8 else ''}")
    return {"params": params}


def convert_diffusion_decoder_dit(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference DiffusionDecoderGeneralDIT state dict
    (cosmos1/models/autoregressive/diffusion_decoder/network.py:27) ->
    {'params': ...} for `diffusion_decoder.DiffusionDecoderGeneralDIT`:
    `token_embedder.weight` copies through; every other key is a plain
    GeneralDIT key nested under the wrapper's `dit` scope."""
    inner = {k: v for k, v in sd.items() if not k.startswith("token_embedder.")}
    params = {"dit": convert_general_dit(inner)["params"]}
    if "token_embedder.weight" in sd:
        params["token_embedder"] = {
            "embedding": np.asarray(sd["token_embedder.weight"])}
    return {"params": params}
