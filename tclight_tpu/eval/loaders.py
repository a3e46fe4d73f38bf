"""Checkpoint-gated metric-model loaders for the evaluate CLI.

Stands in for the reference's model setup block (evaluate.py:119-122 +
eval_utils.py prepare_raft_model:178, prepare_memflow_model:197): CLIP
ViT-B/32 for clip-frame/clip-text, PickScore (CLIP-H) for pick-score,
RAFT/MemFlow for warp-error flows, lpips 'vgg' for FrameLPIPS. Zero-egress
build: every loader takes a local checkpoint path and raises clearly when
it is missing or malformed.

Expected checkpoint directory layouts (safetensors or torch .pt/.pth state
dicts, transformers key names):

  clip_dir/   vision.safetensors  (CLIPVisionModelWithProjection sd)
              text.safetensors    (CLIPTextModelWithProjection sd, optional)
              tokenizer/          (HF tokenizer files, optional)
  pick_dir/   same layout with CLIP-H shapes (PickScore_v1)
  lpips_dir/  vgg16.safetensors   (torchvision VGG16 .features sd)
              lpips_vgg.safetensors (lpips 'vgg' lin heads)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tclight_tpu.utils.logging import get_logger

log = get_logger()


def _load_sd(path: Path) -> dict:
    from tclight_tpu.models.convert import load_torch_state_dict

    return load_torch_state_dict(path)


def _find(dirpath: Path, names: list[str]) -> Path | None:
    for n in names:
        p = dirpath / n
        if p.exists():
            return p
    return None


def load_clip_embed(clip_dir: str | Path, variant: str = "b32"):
    """Build the (frames, prompt) -> (image_embs, text_emb) callable from
    local CLIP checkpoints. variant: 'b32' (openai ViT-B/32) or 'h14'."""
    from tclight_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from tclight_tpu.models.clip_vision import (
        CLIPVisionConfig, CLIPVisionModel, convert_clip_vision,
        make_clip_embed_fn)
    from tclight_tpu.models.convert import convert_clip_text
    from tclight_tpu.pipeline.iclight import load_tokenizer

    clip_dir = Path(clip_dir)
    vis_path = _find(clip_dir, ["vision.safetensors", "clip_vision.safetensors",
                                "vision.pt", "vision.pth"])
    if vis_path is None:
        raise FileNotFoundError(f"no vision checkpoint under {clip_dir}")
    vcfg = (CLIPVisionConfig.vit_h14() if variant == "h14"
            else CLIPVisionConfig.vit_b32())
    vision = CLIPVisionModel(vcfg)
    vparams = convert_clip_vision(_load_sd(vis_path))

    text = tparams = tproj = tokenizer = None
    txt_path = _find(clip_dir, ["text.safetensors", "clip_text.safetensors",
                                "text.pt", "text.pth"])
    if txt_path is not None:
        sd = _load_sd(txt_path)
        tcfg = (CLIPTextConfig.vit_h14() if variant == "h14"
                else CLIPTextConfig.vit_b32())
        text = CLIPTextModel(tcfg)
        tparams = convert_clip_text(sd)
        if "text_projection.weight" in sd:
            tproj = np.asarray(sd["text_projection.weight"]).T
        tok_dir = clip_dir / "tokenizer"
        tokenizer = load_tokenizer(tok_dir) if tok_dir.exists() else None
        if tokenizer is None:
            log.warning("no tokenizer under %s; text metrics disabled", clip_dir)
            text = None
    return make_clip_embed_fn(vision, vparams, text, tparams, tproj,
                              tokenizer, image_size=vcfg.image_size)


def load_lpips(lpips_dir: str | Path):
    """LPIPS('vgg') from local VGG16 + lin-head checkpoints."""
    from tclight_tpu.models.vgg_lpips import (
        LPIPS, convert_vgg16_features, load_lpips_lin_weights)

    lpips_dir = Path(lpips_dir)
    vgg_path = _find(lpips_dir, ["vgg16.safetensors", "vgg16.pt", "vgg16.pth"])
    lin_path = _find(lpips_dir, ["lpips_vgg.safetensors", "lpips_vgg.pt",
                                 "lpips_vgg.pth"])
    if vgg_path is None or lin_path is None:
        raise FileNotFoundError(
            f"need vgg16 + lpips_vgg checkpoints under {lpips_dir}")
    return LPIPS(convert_vgg16_features(_load_sd(vgg_path)),
                 load_lpips_lin_weights(_load_sd(lin_path)))


def load_flow_backend(name: str, ckpt: str | Path | None):
    """('farneback'|'raft'|'memflow', ckpt) -> (backend_name, model|None)
    for data.flow_backends.compute_flow_pairs."""
    if name == "farneback":
        return name, None
    if name not in ("raft", "memflow"):
        raise ValueError(f"unknown flow model {name}")
    if ckpt is None or not Path(str(ckpt)).exists():
        raise FileNotFoundError(
            f"--flow_model {name} needs --flow_ckpt pointing at a local "
            f"checkpoint (got {ckpt})")
    if name == "raft":
        from tclight_tpu.models.raft import RAFTFlowModel, convert_raft_params

        return name, RAFTFlowModel(convert_raft_params(_load_sd(Path(ckpt))))
    if name == "memflow":
        from tclight_tpu.data.flow_backends import load_memflow_core

        return name, load_memflow_core(str(ckpt))
    raise ValueError(f"unknown flow model {name}")
