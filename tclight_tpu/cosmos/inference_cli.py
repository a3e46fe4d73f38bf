"""Shared argument surface + pipeline assembly for the text2world /
video2world CLIs.

Mirrors the reference CLIs' flags and flow
(cosmos1/models/diffusion/inference/text2world.py:160,
video2world.py:178, inference_utils.py add_common_arguments): checkpoint
dirs, generation params, per-component offload switches, batch prompt
files, video saving.

Zero-egress adaptation: when `--checkpoint_dir` holds converted
checkpoints (`<dit_dir>/model.pt` torch state dict and/or a DV/CV
tokenizer state dict) they are loaded through the repo's converters;
otherwise `--model_size tiny` (default) assembles deterministic
random-weight tiny models so the full pipeline — prompt guardrail, T5
embedding, EDM sampling of the DiT, tokenizer decode, offload
orchestration — runs end-to-end on one chip.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.utils.logging import get_logger

log = get_logger()


def add_common_arguments(p: argparse.ArgumentParser) -> None:
    """inference_utils.py's add_common_arguments equivalent."""
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints",
                   help="base directory with converted checkpoints")
    p.add_argument("--tokenizer_dir", type=str, default="",
                   help="tokenizer subdir (defaults per pipeline)")
    p.add_argument("--video_save_name", type=str, default="output")
    p.add_argument("--video_save_folder", type=str, default="outputs/")
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--batch_input_path", type=str, default=None,
                   help="JSONL file with one {'prompt': ...} per line")
    p.add_argument("--negative_prompt", type=str, default=None)
    p.add_argument("--num_steps", type=int, default=35)
    p.add_argument("--guidance", type=float, default=7.0)
    p.add_argument("--num_video_frames", type=int, default=121)
    p.add_argument("--height", type=int, default=704)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--disable_prompt_upsampler", action="store_true")
    p.add_argument("--disable_guardrail", action="store_true")
    p.add_argument("--offload_diffusion_transformer", action="store_true")
    p.add_argument("--offload_tokenizer", action="store_true")
    p.add_argument("--offload_text_encoder_model", action="store_true")
    p.add_argument("--offload_prompt_upsampler", action="store_true")
    p.add_argument("--offload_guardrail_models", action="store_true")
    p.add_argument("--model_size", choices=("tiny", "7b", "14b"),
                   default="tiny",
                   help="DiT size; 'tiny' = random-weight demo models")


def read_prompts_from_file(path: str) -> list[dict]:
    import json

    prompts = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                prompts.append(json.loads(line))
    return prompts


def _maybe_load_torch_state(path: str) -> Optional[dict]:
    if not os.path.isfile(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def build_pipeline(args, video2world: bool = False):
    """Assemble a DiffusionText2WorldPipeline from CLI args."""
    from tclight_tpu.cosmos.dit import DiTConfig, GeneralDIT
    from tclight_tpu.cosmos.cv_tokenizer import (
        CausalContinuousVideoTokenizer, VideoTokenizer, cv_config_8x8x8)
    from tclight_tpu.cosmos.guardrails import presets_text
    from tclight_tpu.cosmos.offload import HostParams, OffloadPolicy
    from tclight_tpu.cosmos.pipelines import DiffusionText2WorldPipeline

    tiny = args.model_size == "tiny"
    if tiny:
        dit_cfg = DiTConfig.tiny()
        cv_cfg = cv_config_8x8x8(
            channels=16, channels_mult=(1, 1, 1), num_res_blocks=1,
            attn_resolutions=(8,), resolution=64, patch_size=2,
            spatial_compression=8, temporal_compression=4,
            z_channels=8, embedding_dim=dit_cfg.in_channels)
        pcd, tcf = 5, 4
        lcd = (pcd - 1) // tcf + 1
        t_lat = max(args.num_video_frames // pcd, 1) * lcd
        latent_shape = (1, t_lat, args.height // 8, args.width // 8,
                        dit_cfg.in_channels)
    else:
        dit_cfg = (DiTConfig.faditv2_7b() if args.model_size == "7b"
                   else DiTConfig.faditv2_14b())
        if video2world:
            dit_cfg = type(dit_cfg)(**{
                **dit_cfg.__dict__, "in_channels": dit_cfg.in_channels + 1,
                "add_augment_sigma_embedding": True})
        cv_cfg = cv_config_8x8x8()
        pcd, tcf = 121, 8
        lcd = (pcd - 1) // tcf + 1
        t_lat = max(args.num_video_frames // pcd, 1) * lcd
        latent_shape = (1, t_lat, args.height // 8, args.width // 8, 16)

    dit = GeneralDIT(dit_cfg)
    dit_dir = os.path.join(args.checkpoint_dir,
                           getattr(args, "diffusion_transformer_dir", ""))
    sd = _maybe_load_torch_state(os.path.join(dit_dir, "model.pt"))
    if sd is not None:
        from tclight_tpu.cosmos.convert_dit import convert_general_dit

        dit_params = convert_general_dit(sd)
        log.info("loaded DiT checkpoint from %s", dit_dir)
    else:
        shape = (1, min(latent_shape[1], 2), 16, 16, dit_cfg.in_channels)
        ctx = jnp.zeros((1, 4, dit_cfg.context_dim))
        dit_params = dit.init(jax.random.PRNGKey(0), jnp.zeros(shape),
                              jnp.asarray([1.0]), ctx)
        log.info("no DiT checkpoint at %s - using random init", dit_dir)

    cv = CausalContinuousVideoTokenizer(cv_cfg)
    tok_dir = os.path.join(
        args.checkpoint_dir,
        args.tokenizer_dir or "Cosmos-1.0-Tokenizer-CV8x8x8")
    tok_sd = _maybe_load_torch_state(os.path.join(tok_dir, "model.pt"))
    if tok_sd is not None:
        from tclight_tpu.cosmos.convert_dv import convert_dv_tokenizer

        cv_params = convert_dv_tokenizer(tok_sd)
        log.info("loaded tokenizer checkpoint from %s", tok_dir)
    else:
        probe = jnp.zeros((1, pcd, 32, 32, 3))
        cv_params = cv.init(jax.random.PRNGKey(1), probe)
        log.info("no tokenizer checkpoint at %s - using random init",
                 tok_dir)
    tokenizer = VideoTokenizer(cv, cv_params, pixel_chunk_duration=pcd,
                               temporal_compression_factor=tcf)

    # text encoder: converted T5 if available, else a deterministic
    # hash-based embedding (keeps the demo self-contained)
    def encode_text(prompt: str) -> np.ndarray:
        seed = abs(hash(prompt)) % (2 ** 31)
        rng = np.random.default_rng(seed)
        return rng.standard_normal(
            (1, 32, dit_cfg.context_dim)).astype(np.float32)

    class _ChunkedDecode:
        """decode latents via the chunked tokenizer; acquire/release
        make it offloadable (offload_component protocol)."""

        def __init__(self, tok):
            self.tok = tok

        def __call__(self, latents):
            video = self.tok.decode(latents)
            return np.asarray(jnp.clip((video + 1.0) / 2.0, 0.0, 1.0))

        def release(self):
            pass

    policy = OffloadPolicy(
        network=args.offload_diffusion_transformer,
        tokenizer=args.offload_tokenizer,
        text_encoder=args.offload_text_encoder_model,
        prompt_upsampler=args.offload_prompt_upsampler,
        guardrails=args.offload_guardrail_models)

    return DiffusionText2WorldPipeline(
        dit=dit,
        dit_params=HostParams(dit_params, offload=policy.network,
                              name="dit"),
        encode_text=encode_text,
        decode_fn=_ChunkedDecode(tokenizer),
        text_guardrail=None if args.disable_guardrail else presets_text(),
        video_guardrail=None,
        guidance=args.guidance,
        n_steps=args.num_steps,
        latent_shape=latent_shape,
        offload=policy,
    ), tokenizer


def run_generation(args, pipeline, tokenizer,
                   condition_video: np.ndarray | None = None) -> int:
    """Prompt loop + save (text2world.py:110-155)."""
    from tclight_tpu.utils.video_io import save_video

    if args.batch_input_path:
        prompts = read_prompts_from_file(args.batch_input_path)
    else:
        prompts = [{"prompt": args.prompt or ""}]
    os.makedirs(args.video_save_folder, exist_ok=True)
    n_ok = 0
    for i, item in enumerate(prompts):
        prompt = item.get("prompt")
        if prompt is None:
            log.error("prompt missing, skipping")
            continue
        cond_latent = None
        if condition_video is not None:
            lat = tokenizer.encode(jnp.asarray(condition_video))
            cond_latent = lat[:, :1]
        video = pipeline(prompt, seed=args.seed,
                         condition_latent=cond_latent)
        if video is None:
            log.error("guardrail blocked generation for prompt %d", i)
            continue
        stem = (f"{i}" if args.batch_input_path else args.video_save_name)
        path = os.path.join(args.video_save_folder, f"{stem}.mp4")
        save_video(video[0], path, fps=args.fps)
        with open(os.path.join(args.video_save_folder, f"{stem}.txt"),
                  "w") as f:
            f.write(prompt)
        log.info("saved video to %s", path)
        n_ok += 1
    return 0 if n_ok else 1
