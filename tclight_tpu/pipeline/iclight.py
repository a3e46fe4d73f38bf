"""IC-Light / SD model factory.

Rebuilds utils/model_utils.py `init_iclight` (:12-94) and `init_iclight_bg`
(:97-179): SD1.5 (realistic-vision-v51 weights) with an 8-channel (fc) or
12-channel (fbc) conv_in, IC-Light safetensors offsets *added* onto the base
weights, and a DPM-Solver++(SDE, Karras) scheduler. The forward hook that
concatenates `concat_conds` (:35-43) is an explicit channel concat in
`Generator.pred_noise`.

Checkpoint layout expected on disk (no network access; mirror the HF files
locally):
  <model_dir>/unet.safetensors          diffusers UNet state dict
  <model_dir>/vae.safetensors           diffusers VAE state dict
  <model_dir>/text_encoder.safetensors  CLIP text model state dict
  <model_dir>/tokenizer/                CLIP tokenizer files
  <model_dir>/iclight_sd15_fc.safetensors   (or _fbc) weight offsets
"""

from __future__ import annotations

import dataclasses
import hashlib
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.diffusion.schedulers import (
    DDIMStateScheduler, DPMSolverMultistepScheduler)
from tclight_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from tclight_tpu.models.convert import (
    convert_clip_text,
    convert_unet,
    convert_vae,
    expand_conv_in,
    load_torch_state_dict,
    merge_offsets,
)
from tclight_tpu.models.unet import ToMeSpec, UNet2DCondition, UNetConfig
from tclight_tpu.models.vae import AutoencoderKL, VAEConfig

__all__ = ["ICLightModels", "DummyTokenizer", "load_iclight", "build_tiny_iclight"]


class DummyTokenizer:
    """Deterministic hash tokenizer for tests / tokenizer-less environments.
    Implements the subset of the CLIPTokenizer interface the pipeline uses."""

    model_max_length = 77
    bos_token_id = 1
    eos_token_id = 2

    def __init__(self, vocab_size: int = 1000):
        self.vocab_size = vocab_size

    def __call__(self, text, truncation=False, add_special_tokens=False,
                 padding=None, max_length=None, return_tensors=None):
        ids = [
            3 + int(hashlib.md5(w.encode()).hexdigest(), 16) % (self.vocab_size - 3)
            for w in text.lower().split()
        ]
        if truncation and max_length:
            ids = ids[: max_length - 2]
        return {"input_ids": ids}


def load_tokenizer(tokenizer_dir: str | Path):
    from transformers import CLIPTokenizer

    return CLIPTokenizer.from_pretrained(str(tokenizer_dir))


@dataclasses.dataclass
class ICLightModels:
    unet: UNet2DCondition
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text_encoder: CLIPTextModel
    text_params: Any
    tokenizer: Any
    scheduler: DPMSolverMultistepScheduler
    model_key: str = "iclight"
    # optional zero-transfer re-creation of unet_params on device (e.g. a
    # jitted deterministic init): lets the post-opt offload DELETE device
    # params instead of fetching a 1.7 GB host mirror over the tunnel
    rebuild_params: Any = None
    # optional ControlNet branch (init_model with control, VidToMe
    # utils.py:49-55); residuals injected by UNet2DCondition
    controlnet: Any = None
    controlnet_params: Any = None

    @property
    def latent_scale(self) -> float:
        return self.vae.config.scaling_factor

    def with_tome(self, tome_spec: ToMeSpec | None, attn_backend=None) -> "ICLightModels":
        return dataclasses.replace(
            self,
            unet=UNet2DCondition(self.unet.config, tome_spec=tome_spec,
                                 attn_backend=attn_backend),
        )


def load_iclight(
    model_dir: str | Path,
    mode: str = "fc",                       # "fc" (8ch) or "fbc" (12ch)
    num_inference_steps: int = 25,
    dtype=jnp.bfloat16,
) -> ICLightModels:
    """Build IC-Light SD1.5 from local checkpoint files (init_iclight
    equivalent)."""
    model_dir = Path(model_dir)
    in_channels = {"fc": 8, "fbc": 12}[mode]

    sd_unet = load_torch_state_dict(model_dir / "unet.safetensors")
    sd_unet = expand_conv_in(sd_unet, in_channels)
    offset_file = model_dir / f"iclight_sd15_{mode}.safetensors"
    if offset_file.exists():
        sd_unet = merge_offsets(sd_unet, load_torch_state_dict(offset_file))
    unet_params = convert_unet(sd_unet)
    unet = UNet2DCondition(UNetConfig.sd15(in_channels=in_channels, dtype=dtype))

    vae_params = convert_vae(load_torch_state_dict(model_dir / "vae.safetensors"))
    vae = AutoencoderKL(VAEConfig.sd15(dtype=dtype))

    text_params = convert_clip_text(
        load_torch_state_dict(model_dir / "text_encoder.safetensors")
    )
    text_encoder = CLIPTextModel(CLIPTextConfig.sd15())

    tok_dir = model_dir / "tokenizer"
    tokenizer = load_tokenizer(tok_dir) if tok_dir.exists() else DummyTokenizer()

    cast = lambda p: jax.tree.map(
        lambda a: jnp.asarray(a, dtype) if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a),
        p,
    )
    return ICLightModels(
        unet=unet, unet_params=cast(unet_params),
        vae=vae, vae_params=cast(vae_params),
        text_encoder=text_encoder, text_params=text_params,
        tokenizer=tokenizer,
        scheduler=DPMSolverMultistepScheduler(num_inference_steps=num_inference_steps),
    )


def build_tiny_iclight(
    seed: int = 0, num_inference_steps: int = 4, in_channels: int = 8,
    latent_base: int = 16,
) -> ICLightModels:
    """Random-weight tiny IC-Light stack for tests and smoke runs
    (SURVEY §4: tiny deterministic UNet/VAE with fixed seeds)."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)

    ucfg = UNetConfig.tiny(in_channels=in_channels)
    unet = UNet2DCondition(ucfg)
    unet_params = jax.jit(unet.init)(
        k1, jnp.zeros((2, latent_base, latent_base, in_channels)),
        jnp.asarray(1.0), jnp.zeros((2, 77, ucfg.context_dim)),
    )

    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg)
    vae_params = jax.jit(vae.init)(k2, jnp.zeros((1, 8 * latent_base, 8 * latent_base, 3)))

    tcfg = CLIPTextConfig.tiny()
    # context_dim of the tiny UNet must match the text model hidden size
    assert tcfg.hidden_size == ucfg.context_dim
    text_encoder = CLIPTextModel(tcfg)
    text_params = jax.jit(text_encoder.init)(k3, jnp.zeros((1, 77), jnp.int32))

    return ICLightModels(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        text_encoder=text_encoder, text_params=text_params,
        tokenizer=DummyTokenizer(vocab_size=tcfg.vocab_size),
        scheduler=DPMSolverMultistepScheduler(num_inference_steps=num_inference_steps),
    )


def build_tiny_sd(
    seed: int = 0, num_inference_steps: int = 4, latent_base: int = 16,
) -> ICLightModels:
    """Random-weight tiny generic-SD stack (4-channel UNet, DDIM updates)
    for exercising the inversion/PnP editing path in tests."""
    models = build_tiny_iclight(
        seed=seed, num_inference_steps=num_inference_steps, in_channels=4,
        latent_base=latent_base,
    )
    return dataclasses.replace(
        models,
        scheduler=DDIMStateScheduler(num_inference_steps=num_inference_steps),
        model_key="1.5",
    )


def load_sd(
    model_dir: str | Path,
    sd_version: str = "1.5",
    num_inference_steps: int = 50,
    dtype=jnp.bfloat16,
    control: str = "none",
) -> ICLightModels:
    """Generic SD pipeline factory for the non-IC-Light inversion/editing
    path (utils/VidToMe/utils.py init_model :19-67; SD 1.5/2.0/2.1; the
    'depth' variant additionally concatenates a depth channel prepared by
    data/controlnet_utils-style preprocessing)."""
    model_dir = Path(model_dir)
    in_channels = 5 if sd_version == "depth" else 4
    sd_unet = load_torch_state_dict(model_dir / "unet.safetensors")
    if sd_version == "depth":
        sd_unet = expand_conv_in(sd_unet, in_channels)
    unet_params = convert_unet(sd_unet)
    unet = UNet2DCondition(UNetConfig.sd15(in_channels=in_channels, dtype=dtype))
    vae_params = convert_vae(load_torch_state_dict(model_dir / "vae.safetensors"))
    vae = AutoencoderKL(VAEConfig.sd15(dtype=dtype))
    text_params = convert_clip_text(
        load_torch_state_dict(model_dir / "text_encoder.safetensors")
    )
    text_encoder = CLIPTextModel(CLIPTextConfig.sd15())
    tok_dir = model_dir / "tokenizer"
    tokenizer = load_tokenizer(tok_dir) if tok_dir.exists() else DummyTokenizer()
    cast = lambda p: jax.tree.map(
        lambda a: jnp.asarray(a, dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a),
        p,
    )
    controlnet = controlnet_params = None
    if control not in ("none", "pnp", None):
        from tclight_tpu.models.controlnet import load_controlnet

        ckpt = model_dir / f"controlnet_{control}.safetensors"
        if ckpt.exists():
            controlnet, controlnet_params = load_controlnet(
                ckpt, UNetConfig.sd15(in_channels=4, dtype=dtype))
            controlnet_params = cast(controlnet_params)
        else:
            raise FileNotFoundError(
                f"control={control} needs {ckpt} (a local control_v11* "
                f"checkpoint converted to safetensors)")
    return ICLightModels(
        unet=unet, unet_params=cast(unet_params),
        vae=vae, vae_params=cast(vae_params),
        controlnet=controlnet, controlnet_params=controlnet_params,
        text_encoder=text_encoder, text_params=text_params,
        tokenizer=tokenizer,
        # the editing path samples with plain DDIM updates
        # (generate_utils.py pred_next_x :283-313), not DPM-Solver
        scheduler=DDIMStateScheduler(num_inference_steps=num_inference_steps),
        model_key=sd_version,
    )
