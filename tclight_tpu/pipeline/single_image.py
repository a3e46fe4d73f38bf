"""Single-image IC-Light relighting (the gradio demo pipelines).

Rebuild of gradio_demo_iclight.py (fc: text/direction-conditioned, 8-ch
conv_in, t2i + i2i highres two-pass, BGSource gradient illumination) and
gradio_demo_bg_iclight.py (fbc: 12-ch conv_in, explicit background image
condition). The UI wrapper lives in the repo-root demo scripts; this module
is the compute path and also works headless.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.pipeline.iclight import ICLightModels
from tclight_tpu.utils.logging import get_logger

log = get_logger()


class BGSource(enum.Enum):
    NONE = "None"
    LEFT = "Left Light"
    RIGHT = "Right Light"
    TOP = "Top Light"
    BOTTOM = "Bottom Light"
    GREY = "Ambient"


def gradient_background(h: int, w: int, source: BGSource) -> np.ndarray:
    """Illumination-direction gradient image in [0,1]
    (gradio_demo_iclight.py BGSource handling)."""
    if source == BGSource.LEFT:
        g = np.linspace(1.0, 0.2, w)[None, :, None]
    elif source == BGSource.RIGHT:
        g = np.linspace(0.2, 1.0, w)[None, :, None]
    elif source == BGSource.TOP:
        g = np.linspace(1.0, 0.2, h)[:, None, None]
    elif source == BGSource.BOTTOM:
        g = np.linspace(0.2, 1.0, h)[:, None, None]
    elif source == BGSource.GREY:
        g = np.full((h, w, 1), 0.5)
    else:
        g = np.full((h, w, 1), 0.0)
    return np.broadcast_to(g, (h, w, 3)).astype(np.float32)


@dataclasses.dataclass
class SingleImageRelighter:
    """process(): fc-mode single-image relight with optional highres pass.
    process_bg(): fbc-mode with explicit background conditioning."""

    models: ICLightModels
    steps: int = 25
    guidance_scale: float = 2.0
    negative_prompt: str = (
        "lowres, bad anatomy, bad hands, cropped, worst quality"
    )
    added_prompt: str = "best quality"

    # -- shared pieces -----------------------------------------------------

    def _encode_text_pair(self, prompt: str):
        from tclight_tpu.pipeline.generator import Generator

        gen = Generator.__new__(Generator)
        gen.models = self.models
        cond = gen.encode_prompt_inner(f"{prompt}, {self.added_prompt}")
        uncond = gen.encode_prompt_inner(self.negative_prompt)
        lc, lu = cond.shape[1] // 77, uncond.shape[1] // 77
        mx = max(lc, lu)
        if lc < mx:
            cond = jnp.concatenate([cond] * math.ceil(mx / lc), 1)[:, : mx * 77]
        if lu < mx:
            uncond = jnp.concatenate([uncond] * math.ceil(mx / lu), 1)[:, : mx * 77]
        return cond, uncond

    def _vae_encode(self, img: np.ndarray) -> jnp.ndarray:
        vae, params = self.models.vae, self.models.vae_params
        mean, _ = vae.apply(params, 2.0 * jnp.asarray(img[None]) - 1.0,
                            method=vae.encode)
        return mean * self.models.latent_scale

    def _vae_decode(self, z: jnp.ndarray) -> np.ndarray:
        vae, params = self.models.vae, self.models.vae_params
        img = vae.apply(params, z / self.models.latent_scale, method=vae.decode)
        return np.asarray(jnp.clip(img / 2 + 0.5, 0, 1))[0]

    def _sample(self, init_latent, concat_latent, cond, uncond, seed,
                start_step: int = 0):
        import dataclasses as dc

        sched = dc.replace(self.models.scheduler,
                           num_inference_steps=self.steps)
        ts = sched.timesteps()
        unet = self.models.unet
        g = self.guidance_scale

        @jax.jit
        def step_eps(params, concat_latent, cond, uncond, x, t):
            latent = jnp.concatenate([x, x], axis=0)
            cc = jnp.concatenate([concat_latent, concat_latent], axis=0)
            inp = jnp.concatenate([latent, cc], axis=-1).astype(unet.config.dtype)
            ctx = jnp.concatenate([uncond, cond], axis=0).astype(unet.config.dtype)
            eps, _ = unet.apply(params, inp, t, ctx)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            return eps_u + g * (eps_c - eps_u)

        sched_step = jax.jit(sched.step)
        x = init_latent
        state = sched.init_state(x)
        state = state._replace(step_index=jnp.asarray(start_step, jnp.int32))
        key = jax.random.PRNGKey(seed)
        for i in range(start_step, len(ts)):
            key, sub = jax.random.split(key)
            eps = step_eps(self.models.unet_params, concat_latent, cond,
                           uncond, x, jnp.asarray(ts[i], jnp.float32))
            state, x = sched_step(state, eps, x, sub)
        return x

    # -- fc: foreground-conditioned (8ch) ----------------------------------

    def process(
        self,
        input_fg: np.ndarray,             # (H, W, 3) [0,1], fg on grey
        prompt: str,
        bg_source: BGSource = BGSource.NONE,
        seed: int = 12345,
        highres_scale: float = 1.5,
        highres_denoise: float = 0.5,
        lowres_size: int = 512,
    ) -> np.ndarray:
        assert self.models.unet.config.in_channels == 8, "fc mode needs 8ch UNet"
        import cv2

        h0, w0 = input_fg.shape[:2]
        scale = lowres_size / max(h0, w0)
        h = int(round(h0 * scale / 64)) * 64
        w = int(round(w0 * scale / 64)) * 64
        fg = cv2.resize(input_fg, (w, h))
        if bg_source != BGSource.NONE:
            # gradient initial latents steer the light direction
            bg = gradient_background(h, w, bg_source)
            init_img = 0.5 * fg + 0.5 * bg
        else:
            init_img = fg

        cond, uncond = self._encode_text_pair(prompt)
        concat = self._vae_encode(fg)
        factor = 2 ** (len(self.models.vae.config.block_out_channels) - 1)
        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(key, (1, h // factor, w // factor,
                                        self.models.vae.config.latent_channels))
        x = self._sample(noise, concat, cond, uncond, seed)
        img = self._vae_decode(x)

        if highres_scale and highres_scale > 1.0:
            hh = int(round(h * highres_scale / 64)) * 64
            ww = int(round(w * highres_scale / 64)) * 64
            img_up = cv2.resize(img, (ww, hh))
            fg_up = cv2.resize(fg, (ww, hh))
            concat_hi = self._vae_encode(fg_up)
            latent_hi = self._vae_encode(img_up) / self.models.latent_scale
            latent_hi = latent_hi * self.models.latent_scale  # keep scaled
            start = int(self.steps * (1.0 - highres_denoise))
            import dataclasses as dc

            sched = dc.replace(self.models.scheduler,
                               num_inference_steps=self.steps)
            key2 = jax.random.PRNGKey(seed + 1)
            noise_hi = jax.random.normal(key2, latent_hi.shape)
            x_hi = sched.add_noise(latent_hi, noise_hi, start)
            x = self._sample(x_hi, concat_hi, cond, uncond, seed + 1,
                             start_step=start)
            img = self._vae_decode(x)
        return img

    # -- fbc: foreground+background conditioned (12ch) ---------------------

    def process_bg(
        self,
        input_fg: np.ndarray,
        input_bg: np.ndarray,
        prompt: str,
        seed: int = 12345,
        lowres_size: int = 512,
    ) -> np.ndarray:
        assert self.models.unet.config.in_channels == 12, "fbc mode needs 12ch UNet"
        import cv2

        h0, w0 = input_fg.shape[:2]
        scale = lowres_size / max(h0, w0)
        h = int(round(h0 * scale / 64)) * 64
        w = int(round(w0 * scale / 64)) * 64
        fg = cv2.resize(input_fg, (w, h))
        bg = cv2.resize(input_bg, (w, h))
        cond, uncond = self._encode_text_pair(prompt)
        concat = jnp.concatenate(
            [self._vae_encode(fg), self._vae_encode(bg)], axis=-1
        )
        factor = 2 ** (len(self.models.vae.config.block_out_channels) - 1)
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, h // factor, w // factor, self.models.vae.config.latent_channels),
        )
        x = self._sample(noise, concat, cond, uncond, seed)
        return self._vae_decode(x)
