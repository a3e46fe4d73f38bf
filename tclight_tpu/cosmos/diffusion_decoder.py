"""Latent diffusion decoder: de-artifacting AR-generated video.

Checkpoint-faithful rebuild of cosmos1/models/autoregressive/diffusion_decoder/:

- `DiffusionDecoderGeneralDIT` (network.py:27-163): a GeneralDIT whose patch
  embedding consumes [latents | token-embedding | (c_noise(sigma) channel) |
  padding-mask]. The discrete AR tokens are embedded with a zero-initialized
  embedding table, bilinearly resized to the latent grid, and channel-
  concatenated onto the noisy input (prepare_embedded_sequence:98-163;
  build_patch_embed:52-96 widens x_embedder's input channels).
- `LatentDiffusionDecoderModel` (model.py:37-231): conditional EDM generation
  with CFG in x0 space (`cond + g*(cond - uncond)`, :157-162), condition
  corruption knobs (cond_sigma_low/high, corrupt_prob :74-76), the
  latent_condition_sigma c_noise channel (:143-151), and RES "2ab" sampling
  from `sigma_max * randn` (:213-226).
- `split_with_overlap` / `linear_blend_video_list` (utils.py:20-119):
  reflect-padded temporal chunking and linear cross-fade re-assembly.
- `diffusion_decoder_process_tokens` (inference.py:28-120): chunk the AR
  token stream with overlap, run one conditional generation per chunk,
  decode with the continuous video tokenizer, linearly blend the chunks.
- `DiffusionDecoderSamplingConfig`
  (configs/inference/inference_config.py:38-62): the shipped sampling
  defaults (guidance 1.8, 15 steps, sigma_min 0.02, overlap 2, 57-frame
  training window).

CFG follows the decoder conditioner registry
(diffusion_decoder/config/base/conditioner.py + the 7B inference override):
text AND latent_condition both carry dropout 0.2, so the uncondition pass
zeroes the T5 context and the token stream together.

Plugs into `ARVideo2WorldPipeline.diffusion_decoder`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.cosmos.dit import DiTConfig, GeneralDIT
from tclight_tpu.cosmos.edm import (
    EDMScaling, SolverConfig, rho_timesteps, sample_res)

__all__ = [
    "DiffusionDecoderSamplingConfig", "DiffusionDecoderGeneralDIT",
    "LatentDiffusionDecoder", "split_with_overlap",
    "linear_blend_video_list", "diffusion_decoder_process_tokens",
    "build_tiny_decoder",
]


@dataclasses.dataclass(frozen=True)
class DiffusionDecoderSamplingConfig:
    """configs/inference/inference_config.py:38-62 (shipped defaults)."""

    guidance: float = 1.8
    sigma_min: float = 0.02
    sigma: float = 8.0
    num_steps: int = 15
    overlap: int = 2
    continuous_tokenizer_channel: int = 16
    continuous_tokenizer_spatial_compression_ratio: int = 8
    dd_train_num_video_frames: int = 57
    max_iter: int = 99
    fps: int = 24


def split_with_overlap(video_bcthw: np.ndarray, num_video_frames: int,
                       overlap: int = 2) -> List[np.ndarray]:
    """utils.py:20-59: sliding window over T with `overlap` shared frames;
    the last chunk reflect-pads past the end. video (B, C, T, H, W)."""
    assert overlap < num_video_frames, "Overlap should be < num_video_frames"
    v = np.asarray(video_bcthw)
    t = v.shape[2]
    step = num_video_frames - overlap
    chunks = []
    for start in range(0, t - overlap, step):
        end = start + num_video_frames
        if end > t:
            pad = end - t
            chunk = np.concatenate(
                [v[:, :, start:t], v[:, :, t - 2: t - 2 - pad: -1]], axis=2)
        else:
            chunk = v[:, :, start:end]
        chunks.append(chunk)
    return chunks


def linear_blend_video_list(videos: Sequence[np.ndarray], d: int
                            ) -> np.ndarray:
    """utils.py:63-119: cross-fade consecutive chunks over their d-frame
    overlap. videos: list of (B, C, T, H, W) with identical shapes."""
    assert len(videos) >= 2, "At least two videos are required."
    b, c, t, h, w = videos[0].shape
    n = len(videos)
    length = n * t - d * (n - 1)
    out = np.zeros((b, c, length, h, w), np.float32)
    pos = 0
    for i in range(n):
        if i == 0:
            out[:, :, : t - d] = videos[0][:, :, : t - d]
            pos = t - d
            continue
        wts = np.linspace(0.0, 1.0, d, dtype=np.float32)
        for j in range(d):
            out[:, :, pos] = ((1 - wts[j]) * videos[i - 1][:, :, t - d + j]
                              + wts[j] * videos[i][:, :, j])
            pos += 1
        if i < n - 1:
            k = t - 2 * d
            if k > 0:
                out[:, :, pos: pos + k] = videos[i][:, :, d: t - d]
                pos += k
        else:
            out[:, :, pos: pos + t - d] = videos[i][:, :, d:]
            pos += t - d
    return out


def _resize_hw_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(…, H0, W0, C) -> (…, h, w, C), torch-interpolate semantics
    (network.py:135 resizes the token embedding UP to the latent grid, so
    antialias never engages)."""
    from tclight_tpu.models.dpt import _resize_bilinear

    lead = x.shape[:-3]
    flat = x.reshape((-1,) + x.shape[-3:])
    out = _resize_bilinear(flat, h, w, align_corners=False)
    return out.reshape(lead + out.shape[1:])


class DiffusionDecoderGeneralDIT(nn.Module):
    """network.py:27-163 in channels-last layout.

    __call__(x (B,T,H,W,C), timesteps (B,), context (B,S,ctx),
             latent_condition: int tokens (B,T,Ht,Wt) when
             `condition_on_token`, else continuous latents (B,T,H,W,C);
             latent_condition_sigma (B,) c_noise values for the optional
             sigma channel; padding_mask/fps as GeneralDIT).

    Param layout: `token_embedder` (zero-init, network.py:46-50) beside the
    inner GeneralDIT under `dit` — `convert_diffusion_decoder_dit` maps the
    reference checkpoints onto this tree.
    """

    cfg: DiTConfig
    token_vocab: int = 64000
    token_dim: int = 32
    condition_on_token: bool = True
    condition_on_sigma: bool = False
    attn_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, timesteps, context, latent_condition=None,
                 latent_condition_sigma=None, crossattn_mask=None,
                 fps=None, padding_mask=None):
        b, t, h, w, c = x.shape
        if self.condition_on_token:
            emb = nn.Embed(self.token_vocab, self.token_dim,
                           embedding_init=nn.initializers.zeros,
                           name="token_embedder")(latent_condition)
            cond = _resize_hw_bilinear(emb, h, w)     # (B,T,H,W,D)
        else:
            # continuous path (model.py docstring "8x8x8" pipeline): the
            # corrupted latents concat at native resolution
            cond = latent_condition
        x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
        if self.condition_on_sigma:
            sig = jnp.broadcast_to(
                jnp.reshape(latent_condition_sigma, (b, 1, 1, 1, 1)),
                (b, t, h, w, 1))
            x = jnp.concatenate([x, sig.astype(x.dtype)], axis=-1)
        inner = dataclasses.replace(self.cfg, in_channels=x.shape[-1])
        return GeneralDIT(inner, self.attn_backend, name="dit")(
            x, timesteps, context, crossattn_mask=crossattn_mask, fps=fps,
            padding_mask=padding_mask)


@dataclasses.dataclass
class LatentDiffusionDecoder:
    """model.py:37-231 at inference: conditional EDM generation over the
    AR token stream with CFG over (text, latent_condition)."""

    network: DiffusionDecoderGeneralDIT
    params: Any
    sigma_data: float = 0.5
    guidance: float = 1.8
    n_steps: int = 15
    sigma_max: float = 80.0
    sigma_min: float = 0.02
    solver_option: str = "2ab"
    # condition corruption (model.py:74-76; all zero in the shipped
    # inference config cosmos_diffusiondecoder_7b.py:25-27)
    cond_sigma_low: float = 0.0
    cond_sigma_high: float = 0.0
    corrupt_prob: float = 0.0

    def _x0_fn(self, context, tokens, corrupt_sigma: float = 0.01,
               key=None):
        """model.py get_x0_fn_from_batch(:93-162), preencode_condition
        path: the condition sigma is drawn U[0, corrupt_sigma) and its
        c_noise fills latent_condition_sigma; noise is only added when
        corrupt_prob > 0 and corrupt_sigma != cond_sigma_low."""
        scaling = EDMScaling(self.sigma_data)
        b = tokens.shape[0]
        key = jax.random.PRNGKey(0) if key is None else key
        sig_key, _ = jax.random.split(key)
        sigma_cond = jax.random.uniform(sig_key, (b,)) * corrupt_sigma
        _, _, _, c_noise_cond = scaling(sigma_cond)

        def denoise(x, sigma, ctx, toks):
            c_skip, c_out, c_in, c_noise = scaling(sigma)
            pred = self.network.apply(
                self.params, (c_in * x).astype(jnp.float32),
                jnp.broadcast_to(c_noise, (b,)), ctx,
                latent_condition=toks, latent_condition_sigma=c_noise_cond)
            return c_skip * x + c_out * pred

        # CFG pair per the decoder conditioner (latent_condition dropout
        # 0.2, cosmos_diffusiondecoder_7b.py:56-59): uncondition zeroes
        # BOTH the text context and the token stream
        uncond_ctx = jnp.zeros_like(context)
        uncond_tokens = jnp.zeros_like(tokens)

        def x0_fn(x, sigma):
            cond = denoise(x, sigma, context, tokens)
            uncond = denoise(x, sigma, uncond_ctx, uncond_tokens)
            return cond + self.guidance * (cond - uncond)

        return x0_fn

    def __call__(self, tokens: jnp.ndarray, context: jnp.ndarray,
                 latent_shape: tuple, seed: int = 1) -> jnp.ndarray:
        """tokens (B, T, Ht, Wt) int32; context (B, S, ctx);
        latent_shape (T, H, W, C) -> generated clean latents
        (generate_samples_from_batch, model.py:164-231)."""
        key = jax.random.PRNGKey(seed)
        noise_key, cond_key = jax.random.split(key)
        b = tokens.shape[0]
        noise = jax.random.normal(noise_key, (b,) + tuple(latent_shape))
        sigmas = rho_timesteps(sigma_max=self.sigma_max,
                               sigma_min=self.sigma_min,
                               n=self.n_steps)[:-1]
        x0_fn = self._x0_fn(context, tokens, key=cond_key)
        return sample_res(x0_fn, noise * self.sigma_max, sigmas,
                          SolverConfig(is_multi=self.solver_option == "2ab"),
                          key=key)


def diffusion_decoder_process_tokens(
    decoder: LatentDiffusionDecoder,
    indices_tensor: Sequence[np.ndarray],
    decode_fn: Callable[[jnp.ndarray], np.ndarray],
    video_height: int,
    video_width: int,
    dd_sampling_config: DiffusionDecoderSamplingConfig | None = None,
    t5_emb_batch: Optional[Sequence[np.ndarray]] = None,
    context_dim: int = 1024,
    seed: int = 1,
) -> List[np.ndarray]:
    """inference.py:28-120: per video, split the AR token stream
    (T', Ht, Wt) into overlapping latent chunks, run one conditional
    generation per chunk, decode each with the continuous tokenizer
    (`decode_fn`: latents (B,T,H,W,C) -> pixels (B,C,Tp,Hp,Wp) in [-1,1]),
    and linear-blend the chunk videos. Returns [0,1] pixel videos
    (C, Tp, Hp, Wp), one per input."""
    cfg = dd_sampling_config or DiffusionDecoderSamplingConfig()
    latent_t = (cfg.dd_train_num_video_frames - 1) // 8 + 1
    out_videos: List[np.ndarray] = []
    for i, tok_thw in enumerate(indices_tensor):
        tok = np.asarray(tok_thw)
        chunks = split_with_overlap(tok[None, None].astype(np.int32),
                                    latent_t, overlap=cfg.overlap)
        if t5_emb_batch is not None and t5_emb_batch[i] is not None:
            ctx = jnp.asarray(t5_emb_batch[i], jnp.float32)[None]
        else:
            ctx = jnp.zeros((1, 512, context_dim), jnp.float32)
        lat_h = video_height // cfg.continuous_tokenizer_spatial_compression_ratio
        lat_w = video_width // cfg.continuous_tokenizer_spatial_compression_ratio
        pix_chunks = []
        for it, chunk in enumerate(chunks[: cfg.max_iter]):
            toks = jnp.asarray(chunk[:, 0], jnp.int32)  # (1, T', Ht, Wt)
            latents = decoder(
                toks, ctx,
                latent_shape=(latent_t, lat_h, lat_w,
                              cfg.continuous_tokenizer_channel),
                seed=seed + it)
            pix = np.clip(np.asarray(decode_fn(latents)), -1.0, 1.0)
            pix_chunks.append(pix)
        if len(pix_chunks) > 1:
            # pixel-space overlap = latent overlap through the tokenizer's
            # 8x temporal compression window
            blended = linear_blend_video_list(pix_chunks, cfg.overlap * 8)
        else:
            blended = pix_chunks[0]
        out_videos.append((1.0 + blended[0]) / 2.0)
    return out_videos


def build_tiny_decoder(seed: int = 0, latent_channels: int = 4,
                       context_dim: int = 32,
                       token_vocab: int = 64) -> LatentDiffusionDecoder:
    cfg = dataclasses.replace(DiTConfig.tiny(), in_channels=latent_channels,
                              out_channels=latent_channels,
                              context_dim=context_dim)
    net = DiffusionDecoderGeneralDIT(cfg, token_vocab=token_vocab,
                                     token_dim=8)
    params = net.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 4, 8, 8, latent_channels)),
        jnp.asarray([0.1]), jnp.zeros((1, 8, context_dim)),
        latent_condition=jnp.zeros((1, 4, 4, 4), jnp.int32),
        latent_condition_sigma=jnp.zeros((1,)),
    )
    return LatentDiffusionDecoder(net, params, n_steps=4)
