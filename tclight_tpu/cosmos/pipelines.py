"""World-generation pipelines: text2world / video2world orchestration.

Rebuild of cosmos1's inference pipeline layer
(models/diffusion/inference/world_generation_pipeline.py:56-645 and
models/autoregressive/inference/world_generation_pipeline.py:143-661, plus
common/base_world_generation_pipeline.py:28): guardrail-wrapped prompt
handling, conditioner assembly, EDM sampling of the video DiT, tokenizer
decode, and the AR prefill->decode->detokenize path with optional diffusion-
decoder cleanup.

All model components are injected (built from local checkpoints or random
weights); this layer owns orchestration, not weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.cosmos.conditioner import GeneralConditioner
from tclight_tpu.cosmos.dit import GeneralDIT, make_edm_denoiser
from tclight_tpu.cosmos.edm import rho_timesteps, sample_edm
from tclight_tpu.cosmos.guardrails import GuardrailRunner, SafetyResult
from tclight_tpu.cosmos.offload import (
    HostParams,
    OffloadPolicy,
    offload_component,
)
from tclight_tpu.utils.logging import get_logger

log = get_logger()


@dataclasses.dataclass
class DiffusionText2WorldPipeline:
    """Text -> video latents -> frames (DiffusionText2WorldGenerationPipeline
    equivalent). `decode_fn` maps latents to frames (VAE/tokenizer decode);
    `encode_text` maps a prompt to cross-attention features (T5)."""

    dit: GeneralDIT
    dit_params: Any
    encode_text: Callable[[str], np.ndarray]
    decode_fn: Callable[[jnp.ndarray], np.ndarray]
    conditioner: Optional[GeneralConditioner] = None
    text_guardrail: Optional[GuardrailRunner] = None
    video_guardrail: Optional[GuardrailRunner] = None
    guidance: float = 7.0
    n_steps: int = 35
    latent_shape: tuple = (1, 8, 16, 16, 16)   # (B, T, H, W, C)
    # offloading strategy (world_generation_pipeline.py:56-123 offload_*
    # flags): offloaded components hold HBM only while their stage runs
    offload: OffloadPolicy = dataclasses.field(default_factory=OffloadPolicy)

    def __post_init__(self):
        if not isinstance(self.dit_params, HostParams):
            self.dit_params = HostParams(self.dit_params,
                                         offload=self.offload.network,
                                         name="dit")

    def _cfg_x0_fn(self, params, context, null_context):
        cond_fn = make_edm_denoiser(self.dit, params, context)
        uncond_fn = make_edm_denoiser(self.dit, params, null_context)

        def x0_fn(x, sigma):
            c = cond_fn(x, sigma)
            u = uncond_fn(x, sigma)
            return u + self.guidance * (c - u)

        return x0_fn

    def _sample(self, context, seed: int,
                condition_latent: jnp.ndarray | None) -> jnp.ndarray:
        """The network stage (reference _run_model_with_offload,
        world_generation_pipeline.py:253-286): DiT weights are device-
        resident only inside this scope when offload.network is set."""
        null_context = jnp.zeros_like(context)
        with self.dit_params.on_device() as params:
            x0_fn = self._cfg_x0_fn(params, context, null_context)
            if condition_latent is not None:
                # video2world: clamp conditioning frames at every solver
                # step (model_v2w.py condition-latent extension)
                n_cond = condition_latent.shape[1]
                base_fn = x0_fn

                def x0_fn(x, sigma):  # noqa: F811
                    out = base_fn(x, sigma)
                    return out.at[:, :n_cond].set(condition_latent)

            noise = jax.random.normal(jax.random.PRNGKey(seed),
                                      self.latent_shape)
            latents = sample_edm(x0_fn, noise,
                                 rho_timesteps(n=self.n_steps),
                                 solver="heun")
            jax.block_until_ready(latents)
        return latents

    def __call__(self, prompt: str, seed: int = 0,
                 condition_latent: jnp.ndarray | None = None) -> np.ndarray | None:
        if self.text_guardrail is not None:
            with offload_component(self.text_guardrail,
                                   self.offload.guardrails) as gr:
                res = gr.is_safe(prompt)
            if not res.is_safe:
                log.warning("prompt rejected by guardrail: %s", res.message)
                return None
        with offload_component(self.encode_text,
                               self.offload.text_encoder) as enc:
            context = jnp.asarray(enc(prompt))
        latents = self._sample(context, seed, condition_latent)
        with offload_component(self.decode_fn, self.offload.tokenizer) as dec:
            frames = dec(latents)
        if self.video_guardrail is not None:
            with offload_component(self.video_guardrail,
                                   self.offload.guardrails) as gr:
                res = gr.is_safe(frames)
                if not res.is_safe:
                    log.warning("video rejected by guardrail: %s",
                                res.message)
                    return None
                frames = gr.postprocess(frames)
        return frames


@dataclasses.dataclass
class ARVideo2WorldPipeline:
    """AR world model: video tokens -> prefill -> decode -> detokenize
    (ARBaseGenerationPipeline / ARVideo2WorldGenerationPipeline equivalent).
    `generator` is an ARGenerator over the AR transformer; `tokenizer` is
    the discrete video tokenizer (cosmos/fsq.py)."""

    generator: Any                 # models.ar_transformer.ARGenerator
    video_tokenizer: Any           # CausalDiscreteVideoTokenizer (bound)
    tokenizer_params: Any
    text_guardrail: Optional[GuardrailRunner] = None
    diffusion_decoder: Optional[Callable] = None  # latent cleanup pass
    max_gen_tokens: int = 256

    def encode_video(self, video: np.ndarray):
        idx, _ = self.video_tokenizer.apply(
            self.tokenizer_params, jnp.asarray(video),
            method=type(self.video_tokenizer).encode,
        )
        return np.asarray(idx)

    def __call__(self, context_video: np.ndarray, prompt: str = "",
                 seed: int = 0) -> np.ndarray | None:
        if prompt and self.text_guardrail is not None:
            res = self.text_guardrail.is_safe(prompt)
            if not res.is_safe:
                log.warning("prompt rejected: %s", res.message)
                return None
        idx = self.encode_video(context_video)
        b = idx.shape[0]
        flat = idx.reshape(b, -1)
        gen_tokens = self.generator.generate(
            prompt_tokens=flat, max_gen_len=self.max_gen_tokens,
            temperature=1.0, top_p=0.9,
            key=jax.random.PRNGKey(seed),
        )
        # reshape generated tokens into latent-grid frames and detokenize
        t, h, w = idx.shape[1:]
        tokens_per_frame = h * w
        n_new = gen_tokens.shape[1] // tokens_per_frame
        if n_new == 0:
            log.warning("generated fewer tokens than one latent frame")
            return None
        new_idx = gen_tokens[:, : n_new * tokens_per_frame].reshape(b, n_new, h, w)
        full_idx = np.concatenate([idx, new_idx], axis=1)
        video = self.video_tokenizer.apply(
            self.tokenizer_params, jnp.asarray(full_idx),
            method=type(self.video_tokenizer).decode_indices,
        )
        if self.diffusion_decoder is not None:
            video = self.diffusion_decoder(video)
        return np.asarray(video)
