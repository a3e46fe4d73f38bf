"""Latent diffusion decoder: de-artifacting AR-generated video.

Rebuild of cosmos1/models/autoregressive/diffusion_decoder/
(model.py `LatentDiffusionDecoderModel`:37-231 + network.py
`DiffusionDecoderGeneralDIT`): a video DiT conditioned on the AR token
stream by CHANNEL CONCATENATION — the discrete tokens are embedded with a
zero-initialized embedding, bilinearly resized to the latent grid, and
concatenated onto the noisy latent input (network.py build_patch_embed /
prepare_embedded_sequence:98-163), optionally alongside a c_noise(sigma)
channel. Sampling is a full conditional EDM generation with CFG over the
token conditioning (model.py get_x0_fn_from_batch:93-163), with optional
noise augmentation of the condition (diffusion_decoder_corrupt_prob).

Plugs into `ARVideo2WorldPipeline.diffusion_decoder`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.cosmos.dit import DiTConfig, GeneralDIT
from tclight_tpu.cosmos.edm import (
    EDMScaling, SolverConfig, rho_timesteps, sample_res)


def _resize_hw_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(…, H0, W0, C) -> (…, h, w, C), torch-interpolate semantics."""
    from tclight_tpu.models.dpt import _resize_bilinear

    lead = x.shape[:-3]
    flat = x.reshape((-1,) + x.shape[-3:])
    out = _resize_bilinear(flat, h, w, align_corners=False)
    return out.reshape(lead + out.shape[1:])


class DiffusionDecoderDIT(nn.Module):
    """GeneralDIT with decoder conditioning channels.

    __call__(x (B,T,H,W,C), c_noise (B,), context (B,S,ctx),
             tokens (B,T,Ht,Wt) int32 | latent_cond (B,T,H,W,C),
             cond_sigma (B,) optional) -> eps-space prediction (B,T,H,W,C).
    """

    cfg: DiTConfig
    token_vocab: int = 64000
    token_dim: int = 32
    condition_on_token: bool = True
    condition_on_sigma: bool = False

    @nn.compact
    def __call__(self, x, c_noise, context, tokens=None, latent_cond=None,
                 cond_sigma=None):
        b, t, h, w, c = x.shape
        if self.condition_on_token:
            emb = nn.Embed(self.token_vocab, self.token_dim,
                           embedding_init=nn.initializers.zeros,
                           name="token_embedder")(tokens)   # (B,T,Ht,Wt,D)
            emb = _resize_hw_bilinear(emb, h, w)
            cond = emb
        else:
            cond = latent_cond  # continuous corrupted-latent conditioning
        x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
        if self.condition_on_sigma:
            sig = jnp.broadcast_to(
                cond_sigma[:, None, None, None, None], (b, t, h, w, 1))
            x = jnp.concatenate([x, sig.astype(x.dtype)], axis=-1)
        inner_cfg = dataclasses.replace(
            self.cfg,
            in_channels=x.shape[-1], out_channels=self.cfg.out_channels)
        return GeneralDIT(inner_cfg, name="dit")(x, c_noise, context)


@dataclasses.dataclass
class LatentDiffusionDecoder:
    """Conditional EDM generation over the AR token stream.

    model.py semantics: condition corruption (noise augmentation at
    `corrupt_sigma` with prob corrupt_prob), CFG via zeroed conditioning,
    full sampling from noise with the RES sampler."""

    network: DiffusionDecoderDIT
    params: Any
    sigma_data: float = 0.5
    guidance: float = 1.5
    n_steps: int = 15
    sigma_max: float = 80.0
    cond_sigma_low: float = 0.0
    corrupt_prob: float = 0.0

    def _x0_fn(self, context, tokens, uncond_context):
        scaling = EDMScaling(self.sigma_data)

        def denoise(x, sigma, ctx):
            c_skip, c_out, c_in, c_noise = scaling(sigma)
            b = x.shape[0]
            pred = self.network.apply(
                self.params, (c_in * x).astype(jnp.float32),
                jnp.broadcast_to(c_noise, (b,)), ctx, tokens=tokens)
            return c_skip * x + c_out * pred

        def x0_fn(x, sigma):
            cond = denoise(x, sigma, context)
            uncond = denoise(x, sigma, uncond_context)
            # NB reference CFG form: cond + g*(cond - uncond)
            # (model.py:157-162)
            return cond + self.guidance * (cond - uncond)

        return x0_fn

    def __call__(self, tokens: jnp.ndarray, context: jnp.ndarray,
                 latent_shape: tuple, seed: int = 0) -> jnp.ndarray:
        """tokens (B, T, Ht, Wt) int32; context (B, S, ctx);
        latent_shape (T, H, W, C) -> generated clean latents."""
        key = jax.random.PRNGKey(seed)
        b = tokens.shape[0]
        noise = jax.random.normal(key, (b,) + tuple(latent_shape))
        sigmas = rho_timesteps(sigma_max=self.sigma_max, n=self.n_steps)[:-1]
        x0_fn = self._x0_fn(context, tokens, jnp.zeros_like(context))
        return sample_res(x0_fn, noise * sigmas[0], sigmas,
                          SolverConfig(is_multi=True), key=key)


def build_tiny_decoder(seed: int = 0, latent_channels: int = 4,
                       context_dim: int = 32,
                       token_vocab: int = 64) -> LatentDiffusionDecoder:
    cfg = dataclasses.replace(DiTConfig.tiny(), in_channels=latent_channels,
                              out_channels=latent_channels,
                              context_dim=context_dim)
    net = DiffusionDecoderDIT(cfg, token_vocab=token_vocab, token_dim=8)
    params = net.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 4, 8, 8, latent_channels)),
        jnp.asarray([0.1]), jnp.zeros((1, 8, context_dim)),
        tokens=jnp.zeros((1, 4, 4, 4), jnp.int32),
    )
    return LatentDiffusionDecoder(net, params, n_steps=4)
