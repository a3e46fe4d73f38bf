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
    """fc-demo initial-latent sources (gradio_demo_iclight.py:196-203)."""

    NONE = "None"
    LEFT = "Left Light"
    RIGHT = "Right Light"
    TOP = "Top Light"
    BOTTOM = "Bottom Light"


class BGSourceFBC(enum.Enum):
    """fbc-demo background sources (gradio_demo_bg_iclight.py:396-404)."""

    UPLOAD = "Use Background Image"
    UPLOAD_FLIP = "Use Flipped Background Image"
    LEFT = "Left Light"
    RIGHT = "Right Light"
    TOP = "Top Light"
    BOTTOM = "Bottom Light"
    GREY = "Ambient"


def gradient_background(h: int, w: int, source: BGSource) -> np.ndarray:
    """fc illumination-gradient image in [0,1]; the reference builds these
    as uint8 linspace(255, 0) ramps (gradio_demo_iclight.py:239-257)."""
    if source == BGSource.LEFT:
        g = np.linspace(1.0, 0.0, w)[None, :, None]
    elif source == BGSource.RIGHT:
        g = np.linspace(0.0, 1.0, w)[None, :, None]
    elif source == BGSource.TOP:
        g = np.linspace(1.0, 0.0, h)[:, None, None]
    elif source == BGSource.BOTTOM:
        g = np.linspace(0.0, 1.0, h)[:, None, None]
    else:
        g = np.full((h, w, 1), 0.0)
    return np.broadcast_to(g, (h, w, 3)).astype(np.float32)


def fbc_background(
    h: int, w: int, source: BGSourceFBC,
    input_bg: Optional[np.ndarray] = None,
) -> np.ndarray:
    """fbc background-condition image in [0,1]; gradients span 224..32
    and GREY is flat 64 in the reference's uint8 space
    (gradio_demo_bg_iclight.py:238-261)."""
    hi, lo = 224.0 / 255.0, 32.0 / 255.0
    if source == BGSourceFBC.UPLOAD:
        assert input_bg is not None, "UPLOAD needs an explicit background"
        return input_bg
    if source == BGSourceFBC.UPLOAD_FLIP:
        assert input_bg is not None, "UPLOAD_FLIP needs an explicit background"
        return np.fliplr(input_bg)
    if source == BGSourceFBC.GREY:
        return np.full((h, w, 3), 64.0 / 255.0, np.float32)
    if source == BGSourceFBC.LEFT:
        g = np.linspace(hi, lo, w)[None, :, None]
    elif source == BGSourceFBC.RIGHT:
        g = np.linspace(lo, hi, w)[None, :, None]
    elif source == BGSourceFBC.TOP:
        g = np.linspace(hi, lo, h)[:, None, None]
    elif source == BGSourceFBC.BOTTOM:
        g = np.linspace(lo, hi, h)[:, None, None]
    else:
        raise ValueError(f"unknown fbc background source {source}")
    return np.broadcast_to(g, (h, w, 3)).astype(np.float32)


def resize_and_center_crop(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Aspect-preserving resize then center crop to (th, tw)
    (gradio_demo_iclight.py:196-210)."""
    import cv2

    h, w = img.shape[:2]
    k = max(tw / w, th / h)
    rw, rh = int(round(w * k)), int(round(h * k))
    r = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LANCZOS4)
    top, left = (rh - th) // 2, (rw - tw) // 2
    return r[top : top + th, left : left + tw]


def run_rmbg_composite(rmbg_model, rmbg_params, img: np.ndarray,
                       sigma: float = 0.0):
    """Grey-composite foreground extraction on a [0,1] float image:
    `127 + (img - 127 + sigma) * alpha` in the reference's uint8 space
    (gradio_demo_iclight.py:220-232). Returns (composite, alpha)."""
    from tclight_tpu.models.briarmbg import compute_alpha_mattes

    alpha = compute_alpha_mattes(rmbg_model, rmbg_params, img[None])[0]
    alpha = alpha[..., None]
    grey = 127.0 / 255.0
    out = grey + (img - grey + sigma / 255.0) * alpha
    return np.clip(out, 0.0, 1.0).astype(np.float32), alpha


def normals_from_relights(left: np.ndarray, right: np.ndarray,
                          bottom: np.ndarray, top: np.ndarray,
                          matting: np.ndarray, sigma: float = 10.0):
    """Photometric-stereo normal estimate from four directional relights
    (gradio_demo_bg_iclight.py:335-381): each [0,1] image is divided by the
    four-light ambient, the horizontal/vertical ratios become the normal's
    u/v components, and the z term sharpens with `sigma`. Returns
    (normal in [-1,1], per-direction ratio images)."""

    ambient = (left + right + bottom + top) / 4.0

    def safa_divide(a, b):
        e = 1e-5
        return ((a + e) / (b + e)) - 1.0

    l, r = safa_divide(left, ambient), safa_divide(right, ambient)
    b, t = safa_divide(bottom, ambient), safa_divide(top, ambient)

    u = np.mean((r - l) * 0.5, axis=2)
    v = np.mean((t - b) * 0.5, axis=2)
    h = (1.0 - u ** 2.0 - v ** 2.0).clip(0, 1e5) ** (0.5 * sigma)
    z = np.zeros_like(h)

    normal = np.stack([u, v, h], axis=2)
    normal /= np.sum(normal ** 2.0, axis=2, keepdims=True) ** 0.5
    normal = normal * matting + np.stack([z, z, 1 - z], axis=2) * (1 - matting)
    return normal, [l, r, b, t]


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
                start_step: int = 0, total_steps: Optional[int] = None):
        import dataclasses as dc

        sched = dc.replace(self.models.scheduler,
                           num_inference_steps=total_steps or self.steps)
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

    def _img2img(self, image_latent, concat_latent, cond, uncond, seed,
                 denoise: float):
        """img2img with the reference's step accounting: the demos call the
        diffusers i2i pipeline with `strength=denoise` and
        `num_inference_steps=round(steps / denoise)`
        (gradio_demo_iclight.py:286-293,319-326), which noises the init
        latent to the (1 - denoise) point of a STRETCHED schedule and then
        runs ~`steps` actual denoise steps over it."""
        import dataclasses as dc

        n = int(round(self.steps / denoise))
        init_t = min(int(n * denoise), n)
        start = max(n - init_t, 0)
        sched = dc.replace(self.models.scheduler, num_inference_steps=n)
        noise = jax.random.normal(jax.random.PRNGKey(seed),
                                  image_latent.shape, image_latent.dtype)
        x0 = sched.add_noise(image_latent, noise, start)
        return self._sample(x0, concat_latent, cond, uncond, seed,
                            start_step=start, total_steps=n)

    # -- fc: foreground-conditioned (8ch) ----------------------------------

    def process(
        self,
        input_fg: np.ndarray,             # (H, W, 3) [0,1], fg on grey
        prompt: str,
        bg_source: BGSource = BGSource.NONE,
        seed: int = 12345,
        highres_scale: float = 1.5,
        highres_denoise: float = 0.5,
        lowres_denoise: float = 0.9,
        lowres_size: int = 512,
        image_width: Optional[int] = None,
        image_height: Optional[int] = None,
    ) -> np.ndarray:
        assert self.models.unet.config.in_channels == 8, "fc mode needs 8ch UNet"
        import cv2

        if image_width and image_height:
            # explicit reference-demo sizing (width/height sliders)
            w = int(round(image_width / 64)) * 64
            h = int(round(image_height / 64)) * 64
            fg = resize_and_center_crop(input_fg, w, h)
        else:
            h0, w0 = input_fg.shape[:2]
            scale = lowres_size / max(h0, w0)
            h = int(round(h0 * scale / 64)) * 64
            w = int(round(w0 * scale / 64)) * 64
            fg = cv2.resize(input_fg, (w, h))

        cond, uncond = self._encode_text_pair(prompt)
        concat = self._vae_encode(fg)
        if bg_source == BGSource.NONE:
            # t2i lowres pass from pure noise (gradio_demo_iclight.py:270-281)
            factor = 2 ** (len(self.models.vae.config.block_out_channels) - 1)
            noise = jax.random.normal(
                jax.random.PRNGKey(seed),
                (1, h // factor, w // factor,
                 self.models.vae.config.latent_channels))
            x = self._sample(noise, concat, cond, uncond, seed)
        else:
            # the lowres pass starts FROM the gradient background latent via
            # img2img at lowres_denoise strength — the initial latent is what
            # steers the light direction (gradio_demo_iclight.py:283-299)
            bg = gradient_background(h, w, bg_source)
            bg_latent = self._vae_encode(bg)
            x = self._img2img(bg_latent, concat, cond, uncond, seed,
                              lowres_denoise)
        img = self._vae_decode(x)

        if highres_scale and highres_scale > 1.0:
            hh = int(round(h * highres_scale / 64)) * 64
            ww = int(round(w * highres_scale / 64)) * 64
            img_up = cv2.resize(img, (ww, hh))
            fg_up = cv2.resize(fg, (ww, hh))
            concat_hi = self._vae_encode(fg_up)
            latent_hi = self._vae_encode(img_up)
            x = self._img2img(latent_hi, concat_hi, cond, uncond, seed + 1,
                              highres_denoise)
            img = self._vae_decode(x)
        return img

    # -- fbc: foreground+background conditioned (12ch) ---------------------

    def process_bg(
        self,
        input_fg: np.ndarray,
        input_bg: Optional[np.ndarray],
        prompt: str,
        bg_source: BGSourceFBC = BGSourceFBC.UPLOAD,
        seed: int = 12345,
        highres_scale: float = 1.5,
        highres_denoise: float = 0.5,
        lowres_size: int = 512,
        image_width: Optional[int] = None,
        image_height: Optional[int] = None,
    ) -> np.ndarray:
        assert self.models.unet.config.in_channels == 12, "fbc mode needs 12ch UNet"
        import cv2

        if image_width and image_height:
            w = int(round(image_width / 64)) * 64
            h = int(round(image_height / 64)) * 64
            fg = resize_and_center_crop(input_fg, w, h)
        else:
            h0, w0 = input_fg.shape[:2]
            scale = lowres_size / max(h0, w0)
            h = int(round(h0 * scale / 64)) * 64
            w = int(round(w0 * scale / 64)) * 64
            fg = cv2.resize(input_fg, (w, h))
        input_bg = fbc_background(h, w, bg_source, input_bg)
        bg = resize_and_center_crop(input_bg, w, h)
        cond, uncond = self._encode_text_pair(prompt)

        def enc_pair(f, b):
            return jnp.concatenate(
                [self._vae_encode(f), self._vae_encode(b)], axis=-1)

        concat = enc_pair(fg, bg)
        factor = 2 ** (len(self.models.vae.config.block_out_channels) - 1)
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, h // factor, w // factor, self.models.vae.config.latent_channels),
        )
        x = self._sample(noise, concat, cond, uncond, seed)
        img = self._vae_decode(x)

        # fbc highres i2i pass with fg+bg re-encoded at the upscaled size
        # (gradio_demo_bg_iclight.py:286-322)
        if highres_scale and highres_scale > 1.0:
            hh = int(round(h * highres_scale / 64)) * 64
            ww = int(round(w * highres_scale / 64)) * 64
            img_up = cv2.resize(img, (ww, hh))
            concat_hi = enc_pair(cv2.resize(fg, (ww, hh)),
                                 cv2.resize(bg, (ww, hh)))
            latent_hi = self._vae_encode(img_up)
            x = self._img2img(latent_hi, concat_hi, cond, uncond, seed + 1,
                              highres_denoise)
            img = self._vae_decode(x)
        return img
