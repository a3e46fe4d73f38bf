"""DDIM inversion (the non-IC-Light SD editing path).

Rebuilds invert.py (:22-332): encode video frames to latents, run
reversed-timestep DDIM (no CFG, batched over frames) to noise them, save
`noisy_latents_{t}` checkpoints at `save_steps`, optionally reconstruct to
verify. The saved latents are the resume boundary consumed by generation
(generate.py:192-194, check_latent_exists at generate_utils.py:323-334) —
we keep the same on-disk contract with .npy instead of .pt.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.diffusion.schedulers import DDIMScheduler
from tclight_tpu.utils.logging import get_logger

log = get_logger()


def latent_filename(save_path: str | Path, t: float | int) -> Path:
    return Path(save_path) / f"noisy_latents_{int(round(float(t)))}.npy"


def check_latent_exists(save_path, t, frame_ids: Sequence[int] | None = None) -> bool:
    f = latent_filename(save_path, t)
    if not f.exists():
        return False
    if frame_ids is not None:
        arr = np.load(f, mmap_mode="r")
        return arr.shape[0] >= len(frame_ids)
    return True


def load_latent(save_path, t, frame_ids: Sequence[int] | None = None) -> np.ndarray:
    arr = np.load(latent_filename(save_path, t))
    if frame_ids is not None:
        arr = arr[list(frame_ids)]
    return arr


class Inverter:
    """DDIM inversion driver (invert.py:22)."""

    def __init__(self, models, config, data_parser=None):
        self.models = models
        self.config = config
        inv = config.get("inversion", {})
        self.steps = int(inv.get("steps", 50) or 50)
        self.batch_size = int(inv.get("batch_size", 8) or 8)
        self.save_steps = int(inv.get("save_steps", 50) or 50)
        self.save_intermediate = bool(inv.get("save_intermediate", False))
        self.recon = bool(inv.get("recon", False))
        self.force = bool(inv.get("force", False))
        self.prompt = inv.get("prompt", "") or ""
        self.data_parser = data_parser
        self.scheduler = DDIMScheduler(num_inference_steps=self.steps)
        # save set = the timesteps of a `save_steps`-step schedule
        # (invert.py:58-59) — with leading spacing and save_steps | steps
        # these are a subset of the inversion timesteps, and generation at
        # n_timesteps == save_steps finds every latent PnP needs
        self.timesteps_to_save = set(
            int(t) for t in
            DDIMScheduler(num_inference_steps=self.save_steps).timesteps()
        )

    def _encode_text(self, prompt: str) -> jnp.ndarray:
        tok = self.models.tokenizer
        ids = tok(prompt, truncation=True, add_special_tokens=False,
                  max_length=tok.model_max_length)["input_ids"]
        ids = [tok.bos_token_id] + ids[: tok.model_max_length - 2] + [tok.eos_token_id]
        ids = ids + [tok.eos_token_id] * (tok.model_max_length - len(ids))
        ids = jnp.asarray(np.asarray([ids], np.int32))
        return self.models.text_encoder.apply(self.models.text_params, ids)

    def _prepare_depth(self, frames, latent_hw):
        """Depth channel for the sd-depth variant (invert.py:293 path);
        tests may inject `self.depth_fn`."""
        if getattr(self, "depth_fn", None) is not None:
            return self.depth_fn(frames, latent_hw)
        from tclight_tpu.models.convert import load_torch_state_dict
        from tclight_tpu.models.dpt import (
            DPTForDepthEstimation, convert_dpt, dpt_config_for_state_dict,
            prepare_depth_maps)

        gen = self.config.get("generation", {}) or {}
        ckpt = gen.get("depth_ckpt")
        if not ckpt or not Path(str(ckpt)).exists():
            raise FileNotFoundError(
                "sd-depth inversion needs generation.depth_ckpt")
        sd = load_torch_state_dict(ckpt)
        cfg = dpt_config_for_state_dict(sd)
        model = DPTForDepthEstimation(cfg)
        params = convert_dpt(sd, cfg)
        return prepare_depth_maps(model, params, frames, latent_hw)

    def _unet_eps(self, params, x, t, cond, depth=None):
        unet = self.models.unet
        if depth is not None:
            x = jnp.concatenate([x, depth.astype(x.dtype)], axis=-1)
        ctx = jnp.repeat(cond, x.shape[0], axis=0).astype(unet.config.dtype)
        eps, _ = unet.apply(params, x.astype(unet.config.dtype), t, ctx)
        return eps

    def ddim_inversion(self, latents: jnp.ndarray, cond: jnp.ndarray,
                       save_path: str | Path,
                       depth: jnp.ndarray | None = None) -> jnp.ndarray:
        """x0 latents -> noise via reversed DDIM (invert.py:151-174)."""
        sched = self.scheduler
        ts = sched.timesteps()
        save_path = Path(save_path)
        save_path.mkdir(parents=True, exist_ok=True)

        @jax.jit
        def invert_step(params, cond, x, idx, depth_b):
            t = jnp.asarray(ts)[idx].astype(jnp.float32)
            eps = self._unet_eps(params, x, t, cond, depth_b)
            return sched.step(eps, idx, x, inversion=True)

        x = latents
        n = x.shape[0]
        for i in reversed(range(len(ts))):  # low t -> high t
            outs = []
            for j in range(0, n, self.batch_size):
                d_b = None if depth is None else depth[j : j + self.batch_size]
                outs.append(invert_step(self.models.unet_params, cond,
                                        x[j : j + self.batch_size], i, d_b))
            x = jnp.concatenate(outs, axis=0)
            t_now = float(ts[i])
            if self.save_intermediate and int(t_now) in self.timesteps_to_save:
                np.save(latent_filename(save_path, t_now), np.asarray(x))
        np.save(latent_filename(save_path, float(ts[0])), np.asarray(x))
        return x

    def ddim_sample(self, x: jnp.ndarray, cond: jnp.ndarray,
                    depth: jnp.ndarray | None = None) -> jnp.ndarray:
        """Plain DDIM reconstruction (invert.py:176-213)."""
        sched = self.scheduler
        ts = sched.timesteps()

        @jax.jit
        def sample_step(params, cond, x, idx, depth_b):
            t = jnp.asarray(ts)[idx].astype(jnp.float32)
            eps = self._unet_eps(params, x, t, cond, depth_b)
            return sched.step(eps, idx, x)

        n = x.shape[0]
        for i in range(len(ts)):
            outs = []
            for j in range(0, n, self.batch_size):
                d_b = None if depth is None else depth[j : j + self.batch_size]
                outs.append(sample_step(self.models.unet_params, cond,
                                        x[j : j + self.batch_size], i, d_b))
            x = jnp.concatenate(outs, axis=0)
        return x

    def encode_imgs_batch(self, frames: np.ndarray) -> jnp.ndarray:
        vae, params = self.models.vae, self.models.vae_params
        scale = self.models.latent_scale

        @jax.jit
        def enc(params, img):
            mean, _ = vae.apply(params, 2.0 * img - 1.0, method=vae.encode)
            return mean * scale

        return jnp.concatenate([
            enc(params, jnp.asarray(frames[i : i + self.batch_size]))
            for i in range(0, len(frames), self.batch_size)
        ])

    def __call__(self, save_path: str | Path, frame_ids: Sequence[int]) -> None:
        t0 = float(self.scheduler.timesteps()[0])
        if not self.force and check_latent_exists(save_path, t0, frame_ids):
            log.info("inverted latents found at %s; skipping", save_path)
            return
        frames = self.data_parser.load_video(frame_ids=frame_ids)
        cond = self._encode_text(self.prompt)
        latents = self.encode_imgs_batch(frames)
        depth = None
        if self.models.unet.config.in_channels == 5:
            depth = self._prepare_depth(
                frames, (latents.shape[1], latents.shape[2]))
        noisy = self.ddim_inversion(latents, cond, save_path, depth)
        if self.recon:
            recon = self.ddim_sample(noisy, cond, depth)
            vae, params = self.models.vae, self.models.vae_params
            imgs = vae.apply(params, recon / self.models.latent_scale,
                             method=vae.decode)
            imgs = np.asarray(jnp.clip(imgs / 2 + 0.5, 0, 1))
            from tclight_tpu.utils.video_io import save_frames

            save_frames(imgs, Path(save_path) / "recon")
