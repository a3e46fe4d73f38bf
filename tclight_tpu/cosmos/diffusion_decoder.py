"""Latent diffusion decoder: de-artifacting AR-generated video.

Rebuild of cosmos1/models/autoregressive/diffusion_decoder/
(`LatentDiffusionDecoderModel` model.py:37): a small video DiT conditioned
on the AR token stream that re-samples the decoded latents for a few EDM
steps, removing the blockiness of discrete-token decoding. Plugs into
`ARVideo2WorldPipeline.diffusion_decoder`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.cosmos.dit import DiTConfig, GeneralDIT, make_edm_denoiser
from tclight_tpu.cosmos.edm import rho_timesteps, sample_edm


@dataclasses.dataclass
class LatentDiffusionDecoder:
    """decode-cleanup(video_latents, token_embeddings) -> latents.

    The AR tokens (embedded) condition the DiT via cross-attention; the
    noisy input is the AR-decoded latent at an intermediate sigma
    (partial re-noising, like SDEdit), so structure is kept while artifacts
    are resampled away."""

    dit: GeneralDIT
    dit_params: Any
    sigma_start: float = 1.2       # re-noise strength
    n_steps: int = 15

    def __call__(self, latents: jnp.ndarray, token_context: jnp.ndarray,
                 seed: int = 0) -> jnp.ndarray:
        x0_fn = make_edm_denoiser(self.dit, self.dit_params, token_context)
        sigmas = rho_timesteps(sigma_max=self.sigma_start, sigma_min=0.002,
                               n=self.n_steps)
        noise = jax.random.normal(jax.random.PRNGKey(seed), latents.shape)
        x = latents + noise * self.sigma_start

        def shifted_x0(x, sigma):
            return x0_fn(x, sigma)

        # reuse the EDM sampler but start from the partially-noised input:
        # sample_edm scales `noise` by sigmas[0], so feed x/sigmas[0]
        return sample_edm(shifted_x0, x / sigmas[0], sigmas, solver="euler")


def build_tiny_decoder(seed: int = 0, latent_channels: int = 4,
                       context_dim: int = 32) -> LatentDiffusionDecoder:
    cfg = dataclasses.replace(DiTConfig.tiny(), in_channels=latent_channels,
                              out_channels=latent_channels,
                              context_dim=context_dim)
    dit = GeneralDIT(cfg)
    params = dit.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 4, 8, 8, latent_channels)),
        jnp.asarray([0.1]), jnp.zeros((1, 8, context_dim)),
    )
    return LatentDiffusionDecoder(dit, params)
