"""The TC-Light relighting pipeline (Generator).

Rebuilds generate.py's `Generator` (:41-630) TPU-first:
- chunked-CLIP prompt encoding for >77-token prompts (generate.py:97-135);
- 'same'/'vanilla' initial noise (:183-197);
- the xy-plane denoising loop over random chunk plans with VidToMe token
  merging (:207-239) — here ONE jitted step function consuming precomputed
  static-shape chunk plans, global token banks threaded as pytrees;
- decayed multi-axis yt-plane denoising over overlapping temporal windows
  with sqrt(0.5) overlap scaling and AdaIN noise renormalization (:241-285);
- DPM-Solver++(SDE) updates with per-step PRNG keys;
- batched VAE encode/decode (generate_utils.py:140-172);
- the two-stage post-optimization (pipeline/postopt.py) against flow data
  from the data parser;
- cost accounting recorded into the config (:577-611, with the intended
  `datetime.now()` behavior — SURVEY §5.1 notes the reference's bug).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.models.unet import ToMeSpec
from tclight_tpu.ops.color import adaptive_instance_normalization
from tclight_tpu.pipeline import chunks as chunklib
from tclight_tpu.pipeline.iclight import ICLightModels
from tclight_tpu.utils.device import compute_platform
from tclight_tpu.pipeline.postopt import (
    PostOptConfig, flow_radius, run_exposure_align, run_uvt)
from tclight_tpu.utils.logging import CostTracker, get_logger
from tclight_tpu.utils.video_io import (
    save_frames, save_video, save_video_stream)

log = get_logger()


def _resize_like(x: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear resize (N, h0, w0, C) -> (N, h, w, C) on host."""
    import cv2

    out = np.stack([cv2.resize(f, (w, h)) for f in np.asarray(x)])
    return out[..., None] if out.ndim == 3 else out


def _cfg_get(cfg, key, default=None):
    if cfg is None:
        return default
    v = cfg.get(key, default)
    return default if v is None else v


class Generator:
    def __init__(self, models: ICLightModels, config, data_parser=None):
        self.config = config
        gen = config.get("generation", {})
        self.guidance_scale = _cfg_get(gen, "guidance_scale", 2.0)
        self.n_timesteps = _cfg_get(gen, "n_timesteps", 25)
        self.chunk_size = _cfg_get(gen, "chunk_size", 4)
        self.chunk_ord = _cfg_get(gen, "chunk_ord", "mix-4")
        self.negative_prompt = _cfg_get(gen, "negative_prompt", "")
        self.noise_mode = _cfg_get(gen, "noise_mode", "same")
        self.alpha_t = _cfg_get(gen, "alpha_t", 0.0)
        self.final_factor_t = _cfg_get(gen, "final_factor_t", 0.01)
        self.win_size_t = _cfg_get(gen, "win_size_t", 64)
        # yt-pass chunk size (0 = auto, see _yt_chunk_size)
        self.chunk_size_t = int(_cfg_get(gen, "chunk_size_t", 0))
        self.prompt_t = _cfg_get(gen, "prompt_t", "best quality")
        self.negative_prompt_t = _cfg_get(gen, "negative_prompt_t", "jittery")
        self.save_frame = _cfg_get(gen, "save_frame", True)
        # Fused 25-step scan still crashes the axon TPU worker at SD1.5
        # scale (retested 2026-08-20: sampling completed but the worker
        # died async, surfacing UNAVAILABLE at the output fetch; wall was
        # ~5.6 s/step — no win over per-step either). Per-step is reliable.
        self.fuse_loop = _cfg_get(gen, "fuse_loop", False)
        self.prompts = dict(_cfg_get(gen, "prompt", {"default": None}))
        self.seed = int(config.get("seed", 12345))

        # PnP editing mode (generate_utils.py:59-68): drives the UNet's
        # first-class pnp_attn/pnp_conv injection from per-step schedules
        self.control = str(_cfg_get(gen, "control", "none") or "none")
        self.use_pnp = self.control == "pnp"
        self.pnp_attn_t = float(_cfg_get(gen, "pnp_attn_t", 0.5))
        self.pnp_f_t = float(_cfg_get(gen, "pnp_f_t", 0.8))
        # ControlNet mode (generate_utils.py:59-63 + :267-272)
        from tclight_tpu.data.controlnet_utils import CONTROLNET_DICT

        self.use_controlnet = (
            self.control in CONTROLNET_DICT and models.controlnet is not None)
        self.control_scale = float(_cfg_get(gen, "control_scale", 1.0))
        if self.control in CONTROLNET_DICT and models.controlnet is None:
            raise ValueError(
                f"control={self.control} requires a ControlNet model "
                f"(load_sd(..., control={self.control!r}))")

        self.tome_spec = ToMeSpec(
            n_frames=self.chunk_size,
            local_ratio=_cfg_get(gen, "local_merge_ratio", 0.6),
            merge_global=_cfg_get(gen, "merge_global", True),
            global_ratio=_cfg_get(gen, "global_merge_ratio", 0.5),
            # reference forces batch-aligned merging under PnP so the
            # [src|uncond|cond] batch merges identically (generate_utils.py:100)
            align_batch=bool(_cfg_get(gen, "align_batch", True)) or self.use_pnp,
            max_downsample=_cfg_get(gen, "max_downsample", 2),
        )
        self.global_rand = _cfg_get(gen, "global_rand", 0.5)
        # exact CFG-prefix dedup (see _pred_chunk); PnP/ControlNet paths
        # have their own batch layouts and keep the plain forward
        self.cfg_dedup = bool(_cfg_get(gen, "cfg_dedup", True))

        # int8 QK / QK+PV attention (ops/attention.py 'pallas_int8[pv]').
        # QUALITY is settled — the 2026-08-20 e2e eval
        # (tools/eval_qk_int8.py) measured SSIM 0.9995 / ~52 dB PSNR /
        # warp-L1 delta 0.09%, metric-neutral — but the SPEED is
        # toolchain-dependent: round-4 measured the int8 QK kernel at
        # 1.35x, the 2026-08-20 toolchain runs it at 0.94x isolated and
        # ±1% in-pipeline (PERF_NOTES round 5). Both stay eval-gated
        # (default OFF) until a toolchain delivers the int8 MXU rate.
        qk_int8 = bool(_cfg_get(gen, "attn_qk_int8", False))
        pv_int8 = bool(_cfg_get(gen, "attn_pv_int8", False)) and qk_int8
        self.attn_backend = (
            "pallas_int8pv" if pv_int8
            else "pallas_int8" if qk_int8 else None)
        self.models = models.with_tome(
            self.tome_spec, attn_backend=self.attn_backend)
        self.scheduler = dataclasses.replace(
            models.scheduler, num_inference_steps=self.n_timesteps
        )
        self.data_parser = data_parser

        post = config.get("post_opt", {})
        self.apply_opt = _cfg_get(post, "apply_opt", True)
        self.post_cfg = PostOptConfig(
            epochs_exposure=_cfg_get(post, "epochs_exposure", 35),
            epochs=_cfg_get(post, "epochs", 70),
            batch_size=_cfg_get(post, "batch_size", 16),
            lambda_dssim=_cfg_get(post, "lambda_dssim", 0.2),
            lambda_flow=_cfg_get(post, "lambda_flow", 0.8),
            lambda_tv=_cfg_get(post, "lambda_tv", 0.05),
            feature_lr=_cfg_get(post, "feature_lr", 0.05),
            exposure_lr_init=_cfg_get(post, "exposure_lr_init", 0.01),
            exposure_lr_final=_cfg_get(post, "exposure_lr_final", 0.001),
            exposure_lr_delay_steps=_cfg_get(post, "exposure_lr_delay_steps", 0),
            exposure_lr_delay_mult=_cfg_get(post, "exposure_lr_delay_mult", 0.0),
            ms_ssim_levels=_cfg_get(post, "ms_ssim_levels", 5),
        )

        # multi-chip mesh (config `parallel: {n_devices, model_parallel}`):
        # the SAME step graphs compile SPMD over the mesh — frames/batch
        # axes sharded over 'data', TP params over 'model', XLA inserts the
        # ICI collectives (stands in for cosmos1/utils/distributed.py:34-223)
        par = config.get("parallel", {}) or {}
        n_dev = int(_cfg_get(par, "n_devices", 0) or 0)
        self.mesh = None
        if n_dev > 1:
            from tclight_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(
                n_dev, model_parallel=int(_cfg_get(par, "model_parallel", 1)))

        self._vae_batch = 8
        # host mirror of the (frozen) UNet params: offloading before
        # post-opt then becomes a device-buffer delete instead of a 1.7 GB
        # device->host fetch over the tunnel (~4 min measured round 1)
        leaves = jax.tree.leaves(models.unet_params)
        self._host_unet_params = (
            models.unet_params
            if leaves and isinstance(leaves[0], np.ndarray) else None
        )
        self._step_fn = None
        self._pnp_step_fns = {}
        self._pnp_latents_dir = None
        self._frame_ids = None
        self._step_sched_fn = None
        self._fuse_step_fn = None
        self._loop_fn = None
        self._slot0_fn = None
        self._group_fn = None
        self._sched_only_fn = None
        # yt-pass variants bound to the chunk_size_t ToMeSpec (_yt_bind)
        self._yt_unet = None
        self._yt_cs = None
        self._step_fn_t = None
        self._slot0_fn_t = None
        self._group_fn_t = None
        # single programs running >~1-2 min kernel-fault the axon worker
        # (watchdog); plans with more slots than this split into bounded
        # per-dispatch groups (see _run_slots_split)
        self.max_fused_slots = _cfg_get(gen, "max_fused_slots", 32)

    # ------------------------------------------------------------ prompts

    def encode_prompt_inner(self, txt: str) -> jnp.ndarray:
        """Chunked >77-token CLIP encoding (generate.py:97-115).
        Returns (1, k*77, hidden)."""
        tok = self.models.tokenizer
        max_length = tok.model_max_length
        chunk_length = max_length - 2
        ids = tok(txt, truncation=False, add_special_tokens=False)["input_ids"]
        if len(ids) == 0:
            ids = []
        chunks_ = [
            [tok.bos_token_id] + ids[i : i + chunk_length] + [tok.eos_token_id]
            for i in range(0, max(len(ids), 1), chunk_length)
        ]
        pad_id = tok.eos_token_id
        chunks_ = [c + [pad_id] * (max_length - len(c)) for c in chunks_]
        token_ids = jnp.asarray(np.array(chunks_, np.int32))
        if not hasattr(self, "_text_fn"):
            # params passed as an ARGUMENT: closed-over arrays would be
            # embedded as HLO constants (huge compile uploads on axon)
            self._text_fn = jax.jit(self.models.text_encoder.apply)
        conds = self._text_fn(self.models.text_params, token_ids)
        return conds.reshape(1, -1, conds.shape[-1])

    def encode_prompt_pair(self, positive: str, negative: str):
        """(cond, uncond), both (1, S, hidden), repeated to equal chunk
        counts (generate.py:117-135)."""
        c = self.encode_prompt_inner(positive)
        uc = self.encode_prompt_inner(negative)
        lc = c.shape[1] // 77
        luc = uc.shape[1] // 77
        max_chunk = max(lc, luc)
        if lc < max_chunk:
            c = jnp.concatenate([c] * math.ceil(max_chunk / lc), axis=1)[:, : max_chunk * 77]
        if luc < max_chunk:
            uc = jnp.concatenate([uc] * math.ceil(max_chunk / luc), axis=1)[:, : max_chunk * 77]
        return c, uc

    # ---------------------------------------------------------------- VAE

    def _vae_fns(self):
        if not hasattr(self, "_enc_fn"):
            vae = self.models.vae
            scale = self.models.latent_scale

            @jax.jit
            def enc(params, x):
                mean, _ = vae.apply(params, 2.0 * x - 1.0, method=vae.encode)
                return mean * scale

            @jax.jit
            def dec(params, z):
                img = vae.apply(params, z / scale, method=vae.decode)
                return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

            self._enc_fn, self._dec_fn = enc, dec
        return self._enc_fn, self._dec_fn

    def _vae_batch_for(self, h: int, w: int) -> int:
        """Resolution-scaled VAE batch: full-res conv activations are
        ~(B,H,W,128)x2B; batch 8 at 960x720 is ~1.7 GB per tensor and OOMs
        a 16G chip alongside the UNet."""
        return max(1, min(self._vae_batch, int(self._vae_batch * (512 * 512) / max(h * w, 1))))

    def encode_imgs_batch(self, frames: np.ndarray) -> jnp.ndarray:
        """[0,1] frames -> scaled latents (posterior mean * 0.18215).

        On TPU the video uploads ONCE as uint8 (exact for uint8-sourced
        video; the tunnel charges 25-80 MB/s h2d) and batches are sliced
        and rescaled on device."""
        enc, _ = self._vae_fns()
        bs = self._vae_batch_for(frames.shape[1], frames.shape[2])
        n = len(frames)
        pad = (-n) % bs
        frames = np.concatenate([frames, frames[-1:].repeat(pad, 0)]) if pad else frames
        if compute_platform() == "tpu" and isinstance(frames, np.ndarray):
            frames_d = jnp.asarray(
                np.clip(np.rint(frames * 255.0), 0, 255).astype(np.uint8))
            batch = lambda i: frames_d[i : i + bs].astype(jnp.float32) / 255.0
        else:
            batch = lambda i: jnp.asarray(frames[i : i + bs])
        outs = [
            enc(self.models.vae_params, batch(i))
            for i in range(0, len(frames), bs)
        ]
        return jnp.concatenate(outs, axis=0)[:n]

    # decoded videos above this size stream through the host to bound HBM;
    # below it they stay device-resident (the tunnel charges ~11-25 MB/s
    # d2h + 25-80 MB/s h2d for a round trip). The higher limit applies
    # when the UNet params were offloaded before decode (post-opt path):
    # 300x1280x720 (3.3 GB f32) then fits device-side on 16 GB.
    _DECODE_HOST_BYTES = int(1.5e9)
    _DECODE_HOST_BYTES_OFFLOADED = int(4e9)

    def decode_latents_batch(
        self, latents: jnp.ndarray, params_offloaded: bool = False
    ):
        """Returns decoded frames: a device array when they fit in HBM,
        else a host np.ndarray (streamed out batch by batch)."""
        _, dec = self._vae_fns()
        factor = self.vae_factor
        bs = self._vae_batch_for(latents.shape[1] * factor, latents.shape[2] * factor)
        n = len(latents)
        out_bytes = n * latents.shape[1] * latents.shape[2] * factor * factor * 3 * 4
        limit = (self._DECODE_HOST_BYTES_OFFLOADED if params_offloaded
                 else self._DECODE_HOST_BYTES)
        to_host = out_bytes > limit
        pad = (-n) % bs
        if pad:
            latents = jnp.concatenate([latents, jnp.repeat(latents[-1:], pad, 0)])
        outs = []
        for i in range(0, len(latents), bs):
            out = dec(self.models.vae_params, latents[i : i + bs])
            outs.append(np.asarray(out) if to_host else out)
        if to_host:
            return np.concatenate(outs, axis=0)[:n]
        return jnp.concatenate(outs, axis=0)[:n]

    # ------------------------------------------------------------ denoise

    def _shard_batch(self, x):
        """Shard a UNet batch's leading axis over the mesh 'data' axis
        (no-op single-device). Placed on the chunk INPUT so the whole UNet
        forward partitions batch-parallel; XLA re-shards around the joined
        token-merge attention on its own."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(*(("data",) + (None,) * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def _pred_chunk(self, params, x_c, cc_c, embeds, t, randf, flip, banks,
                    use_global, unet=None):
        """CFG batch: [uncond frames | cond frames] (generate.py:296-301).

        With `cfg_dedup` (default), the UNet takes the SINGLE shared half:
        the pair is bit-identical until the first cross-attention, so
        conv_in + the first resnet + the first (merged) self-attention run
        once and the model duplicates tokens at the divergence point
        (models/unet.py cfg_dedup) — exact, ~0.4 s/step at 960x720.

        `unet` selects the module variant (the yt pass binds one with a
        chunk_size_t ToMeSpec); chunk size is read off the input shape."""
        unet = self.models.unet if unet is None else unet
        g = self.guidance_scale
        cs = x_c.shape[0]
        uncond, cond = embeds  # each (1, S, hidden)
        ctx = jnp.concatenate(
            [jnp.repeat(uncond, cs, axis=0), jnp.repeat(cond, cs, axis=0)], axis=0
        ).astype(unet.config.dtype)
        if self.cfg_dedup:
            inp = self._shard_batch(
                jnp.concatenate([x_c, cc_c], axis=-1).astype(unet.config.dtype))
            eps, banks = unet.apply(
                params, inp, t, ctx, randf=randf, flip=flip, banks=banks,
                use_global=use_global, cfg_dedup=True,
            )
        else:
            latent = jnp.concatenate([x_c, x_c], axis=0)
            cc = jnp.concatenate([cc_c, cc_c], axis=0)
            inp = self._shard_batch(
                jnp.concatenate([latent, cc], axis=-1).astype(unet.config.dtype))
            eps, banks = unet.apply(
                params, inp, t, ctx, randf=randf, flip=flip, banks=banks,
                use_global=use_global,
            )
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + g * (eps_c - eps_u), banks

    def _pred_chunk_pnp(self, params, x_c, src_c, cc_c, embeds3, t, randf,
                        flip, banks, use_global, pnp_attn, pnp_conv):
        """PnP batch: [source | uncond | cond] (generate_utils.py:249-257)
        with Q/K + conv-feature injection inside the UNet when the
        per-step schedule is active."""
        unet = self.models.unet
        g = self.guidance_scale
        cs = self.chunk_size
        latent = jnp.concatenate([src_c, x_c, x_c], axis=0)
        cc = jnp.concatenate([cc_c, cc_c, cc_c], axis=0)
        inp = jnp.concatenate([latent, cc], axis=-1).astype(unet.config.dtype)
        src_e, uncond, cond = embeds3  # each (1, S, hidden)
        ctx = jnp.concatenate(
            [jnp.repeat(src_e, cs, axis=0), jnp.repeat(uncond, cs, axis=0),
             jnp.repeat(cond, cs, axis=0)], axis=0
        ).astype(unet.config.dtype)
        eps, banks = unet.apply(
            params, inp, t, ctx, randf=randf, flip=flip, banks=banks,
            use_global=use_global, pnp_attn=pnp_attn, pnp_conv=pnp_conv,
        )
        _, eps_u, eps_c = jnp.split(eps, 3, axis=0)
        return eps_u + g * (eps_c - eps_u), banks

    def _step_core_pnp(self, params, x, src, concat_conds, embeds3, t,
                       plan_idx, plan_valid, randfs, flips, pnp_attn,
                       pnp_conv):
        """xy denoise step with per-chunk source latents threaded through
        the same chunk plan as the edited latents."""
        def run(noises, banks, use_global, idx, valid, randf, flip):
            e, banks = self._pred_chunk_pnp(
                params, x[idx], src[idx], concat_conds[idx], embeds3, t,
                randf, flip, banks, use_global, pnp_attn, pnp_conv,
            )
            return self._scatter_noise(noises, e, idx, valid), banks

        noises, banks = run(jnp.zeros_like(x), None, False, plan_idx[0],
                            plan_valid[0], randfs[0], flips[0])
        if plan_idx.shape[0] > 1:
            def body(carry, inp):
                noises, banks = carry
                idx, valid, randf, flip = inp
                noises, banks = run(noises, banks, True, idx, valid, randf, flip)
                return (noises, banks), None

            (noises, banks), _ = jax.lax.scan(
                body, (noises, banks),
                (plan_idx[1:], plan_valid[1:], randfs[1:], flips[1:]),
            )
        return noises

    def _pred_chunk_ctrl(self, params, ctrl_params, x_c, cc_c, ctrl_c,
                         embeds, t, randf, flip, banks, use_global):
        """CFG chunk forward with ControlNet residual injection
        (generate_utils.py pred_noise :267-272)."""
        unet = self.models.unet
        cnet = self.models.controlnet
        g = self.guidance_scale
        cs = self.chunk_size
        latent = jnp.concatenate([x_c, x_c], axis=0)
        cc = jnp.concatenate([cc_c, cc_c], axis=0)
        inp = self._shard_batch(
            jnp.concatenate([latent, cc], axis=-1).astype(unet.config.dtype))
        uncond, cond = embeds
        ctx = jnp.concatenate(
            [jnp.repeat(uncond, cs, axis=0), jnp.repeat(cond, cs, axis=0)],
            axis=0).astype(unet.config.dtype)
        cond_img = jnp.concatenate([ctrl_c, ctrl_c], axis=0)
        down_res, mid_res = cnet.apply(ctrl_params, inp, t, ctx, cond_img)
        s = self.control_scale
        down_res = [r * s for r in down_res]
        mid_res = mid_res * s
        eps, banks = unet.apply(
            params, inp, t, ctx, randf=randf, flip=flip, banks=banks,
            use_global=use_global, down_residuals=down_res,
            mid_residual=mid_res,
        )
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + g * (eps_c - eps_u), banks

    def _step_core_ctrl(self, params, ctrl_params, x, ctrl, concat_conds,
                        embeds, t, plan_idx, plan_valid, randfs, flips):
        """xy denoise step with the control images threaded through the
        same chunk plan."""
        def run(noises, banks, use_global, idx, valid, randf, flip):
            e, banks = self._pred_chunk_ctrl(
                params, ctrl_params, x[idx], concat_conds[idx], ctrl[idx],
                embeds, t, randf, flip, banks, use_global,
            )
            return self._scatter_noise(noises, e, idx, valid), banks

        noises, banks = run(jnp.zeros_like(x), None, False, plan_idx[0],
                            plan_valid[0], randfs[0], flips[0])
        if plan_idx.shape[0] > 1:
            def body(carry, inp):
                noises, banks = carry
                idx, valid, randf, flip = inp
                noises, banks = run(noises, banks, True, idx, valid, randf,
                                    flip)
                return (noises, banks), None

            (noises, banks), _ = jax.lax.scan(
                body, (noises, banks),
                (plan_idx[1:], plan_valid[1:], randfs[1:], flips[1:]),
            )
        return noises

    def _ctrl_step_fn(self):
        if getattr(self, "_ctrl_step_jit", None) is None:
            sched = self.scheduler

            def fn(params, ctrl_params, x, ctrl, state, concat_conds,
                   embeds, t, plan_idx, plan_valid, randfs, flips, rkey):
                noises = self._step_core_ctrl(
                    params, ctrl_params, x, ctrl, concat_conds, embeds, t,
                    plan_idx, plan_valid, randfs, flips,
                )
                state, x = sched.step(state, noises, x, rkey)
                return x, state, jnp.max(jnp.abs(x[0, 0]))

            self._ctrl_step_jit = jax.jit(fn)
        return self._ctrl_step_jit

    def _ddim_sample_ctrl(self, x, embeds, concat_conds, plan_rng, key):
        """Sampling loop with ControlNet conditioning."""
        n = x.shape[0]
        sched = self.scheduler
        timesteps = sched.timesteps()
        state = sched.init_state(x)
        ctrl = self._control_images
        fn = self._ctrl_step_fn()
        self._last_step_times = []
        for i, t in enumerate(timesteps):
            t_step0 = time.perf_counter()
            plan = chunklib.make_chunk_plan(
                n, self.chunk_size, plan_rng, self.chunk_ord,
                self.tome_spec.merge_global,
            )
            slots = plan.indices.shape[0]
            randfs_np = plan_rng.integers(0, 4, size=slots)
            flips_np = plan_rng.random(slots) <= self.global_rand
            key, sub = jax.random.split(key)
            x, state, sync = fn(
                self.models.unet_params, self.models.controlnet_params,
                x, ctrl, state, concat_conds, embeds,
                jnp.asarray(t, jnp.float32),
                jnp.asarray(plan.indices), jnp.asarray(plan.valid),
                jnp.asarray(randfs_np, jnp.int32), jnp.asarray(flips_np),
                sub,
            )
            _ = float(sync)
            self._last_step_times.append(time.perf_counter() - t_step0)
            log.info("step %d/%d t=%.1f [%s]", i + 1, len(timesteps),
                     float(t), self.control)
        return x

    def _pnp_step_fn(self, pnp_attn: bool, pnp_conv: bool):
        """Fused denoise+scheduler step, one compiled graph per injection
        combo (at most 3 along the nested schedules)."""
        key = (bool(pnp_attn), bool(pnp_conv))
        if key not in self._pnp_step_fns:
            sched = self.scheduler

            def fn(params, x, src, state, concat_conds, embeds3, t,
                   plan_idx, plan_valid, randfs, flips, rkey):
                noises = self._step_core_pnp(
                    params, x, src, concat_conds, embeds3, t, plan_idx,
                    plan_valid, randfs, flips, *key,
                )
                state, x = sched.step(state, noises, x, rkey)
                return x, state, jnp.max(jnp.abs(x[0, 0]))

            self._pnp_step_fns[key] = jax.jit(fn)
        return self._pnp_step_fns[key]

    def _ddim_sample_pnp(self, x, embeds3, concat_conds, plan_rng, key):
        """Sampling loop for PnP editing: per-timestep source latents are
        loaded from the inversion cache (pre_iter, generate_utils.py:228-233)
        and injected via the [src|uncond|cond] batch."""
        from tclight_tpu.pipeline.invert import load_latent

        n = x.shape[0]
        sched = self.scheduler
        timesteps = sched.timesteps()
        t_steps = len(timesteps)
        n_attn = int(t_steps * self.pnp_attn_t)
        n_conv = int(t_steps * self.pnp_f_t)
        state = sched.init_state(x)
        self._last_step_times = []
        for i, t in enumerate(timesteps):
            t_step0 = time.perf_counter()
            src = jnp.asarray(load_latent(
                self._pnp_latents_dir, float(t), self._frame_ids))
            plan = chunklib.make_chunk_plan(
                n, self.chunk_size, plan_rng, self.chunk_ord,
                self.tome_spec.merge_global,
            )
            slots = plan.indices.shape[0]
            randfs_np = plan_rng.integers(0, 4, size=slots)
            flips_np = plan_rng.random(slots) <= self.global_rand
            key, sub = jax.random.split(key)
            fn = self._pnp_step_fn(i < n_attn, i < n_conv)
            x, state, sync = fn(
                self.models.unet_params, x, src, state, concat_conds,
                embeds3, jnp.asarray(t, jnp.float32),
                jnp.asarray(plan.indices), jnp.asarray(plan.valid),
                jnp.asarray(randfs_np, jnp.int32), jnp.asarray(flips_np),
                sub,
            )
            _ = float(sync)
            self._last_step_times.append(time.perf_counter() - t_step0)
            log.info("step %d/%d t=%.1f [pnp]", i + 1, t_steps, float(t))
        return x

    @staticmethod
    def _scatter_noise(noises, e, idx, valid):
        n = noises.shape[0]
        tgt = jnp.where(valid, idx, n)
        return noises.at[tgt].set(e, mode="drop")

    def _slot0_core(self, params, x, concat_conds, embeds, t, idx0, val0,
                    randf0, flip0, unet=None):
        """Slot 0 initializes the global token banks."""
        e0, banks = self._pred_chunk(
            params, x[idx0], concat_conds[idx0], embeds, t, randf0, flip0,
            None, False, unet=unet,
        )
        return self._scatter_noise(jnp.zeros_like(x), e0, idx0, val0), banks

    def _group_core(self, params, x, noises, banks, concat_conds, embeds, t,
                    plan_idx, plan_valid, randfs, flips, unet=None):
        """Scan a group of bank-carrying chunk slots into the noise buffer."""
        def body(carry, inp):
            noises, banks = carry
            idx, valid, randf, flip = inp
            e, banks = self._pred_chunk(
                params, x[idx], concat_conds[idx], embeds, t, randf,
                flip, banks, True, unet=unet,
            )
            return (self._scatter_noise(noises, e, idx, valid), banks), None

        (noises, banks), _ = jax.lax.scan(
            body, (noises, banks), (plan_idx, plan_valid, randfs, flips)
        )
        return noises, banks

    def _step_core(self, params, x, concat_conds, embeds, t, plan_idx,
                   plan_valid, randfs, flips, unet=None):
        """One xy denoising step (pure function): scatter-gathered chunk
        UNet passes with token merging + CFG fused into the noise buffer.
        Params enter as an argument (axon: closed-over arrays become HLO
        constants and blow up the remote-compile upload)."""
        noises, banks = self._slot0_core(
            params, x, concat_conds, embeds, t, plan_idx[0], plan_valid[0],
            randfs[0], flips[0], unet=unet,
        )
        if plan_idx.shape[0] > 1:
            noises, banks = self._group_core(
                params, x, noises, banks, concat_conds, embeds, t,
                plan_idx[1:], plan_valid[1:], randfs[1:], flips[1:],
                unet=unet,
            )
        return noises

    def _build_step_fn(self, unet=None):
        jitted = jax.jit(functools.partial(self._step_core, unet=unet))
        return lambda *a: jitted(self.models.unet_params, *a)

    def _run_slots_split(self, x, concat_conds, embeds, t_arr, idx_np,
                         valid_np, randf_np, flip_np, yt=False):
        """Bounded-dispatch slot execution for many-slot plans (long
        videos / yt passes): the axon worker kernel-faults single
        programs that run for minutes, so slots are dispatched in groups
        of `max_fused_slots`, carrying the noise buffer and token banks
        on device between dispatches. The last group is padded with
        invalid slots so one compiled group graph covers every step."""
        gsz = self.max_fused_slots
        params = self.models.unet_params
        if yt and self._slot0_fn_t is None:
            unet_t = self._yt_unet
            self._slot0_fn_t = jax.jit(
                functools.partial(self._slot0_core, unet=unet_t))
            self._group_fn_t = jax.jit(
                functools.partial(self._group_core, unet=unet_t))
        if not yt and self._slot0_fn is None:
            self._slot0_fn = jax.jit(self._slot0_core)
            self._group_fn = jax.jit(self._group_core)
        slot0_fn = self._slot0_fn_t if yt else self._slot0_fn
        group_fn = self._group_fn_t if yt else self._group_fn
        noises, banks = slot0_fn(
            params, x, concat_conds, embeds, t_arr,
            jnp.asarray(idx_np[0]), jnp.asarray(valid_np[0]),
            jnp.asarray(int(randf_np[0]), jnp.int32),
            jnp.asarray(bool(flip_np[0])),
        )
        s = idx_np.shape[0]
        for g0 in range(1, s, gsz):
            g1 = min(g0 + gsz, s)
            pad = gsz - (g1 - g0)

            def pad_np(a, fill=0):
                sl = np.asarray(a[g0:g1])
                if pad:
                    sl = np.concatenate(
                        [sl, np.full((pad,) + sl.shape[1:], fill, sl.dtype)]
                    )
                return jnp.asarray(sl)

            noises, banks = group_fn(
                params, x, noises, banks, concat_conds, embeds, t_arr,
                pad_np(idx_np), pad_np(valid_np), pad_np(randf_np),
                pad_np(flip_np),
            )
        return noises

    def _run_slots(self, x, concat_conds, embeds, t_arr, plan, randf_np,
                   flip_np, yt=False):
        """Dispatch one denoise pass over a chunk plan: fully fused for
        normal slot counts, group-split above `max_fused_slots`."""
        slots = plan.indices.shape[0]
        if slots <= self.max_fused_slots + 1:
            if yt and self._step_fn_t is None:
                self._step_fn_t = self._build_step_fn(unet=self._yt_unet)
            if not yt and self._step_fn is None:
                self._step_fn = self._build_step_fn()
            step_fn = self._step_fn_t if yt else self._step_fn
            return step_fn(
                x, concat_conds, embeds, t_arr,
                jnp.asarray(plan.indices), jnp.asarray(plan.valid),
                jnp.asarray(randf_np, jnp.int32), jnp.asarray(flip_np),
            )
        return self._run_slots_split(
            x, concat_conds, embeds, t_arr, plan.indices, plan.valid,
            np.asarray(randf_np), np.asarray(flip_np), yt=yt,
        )

    def _build_step_sched_fn(self):
        """One fused graph per sampling step: chunked denoise + scheduler
        update + a sync scalar output. One dispatch + one host fetch per
        step instead of three dispatches (the axon tunnel charges
        ~0.1-1 s per dispatch round trip)."""
        sched = self.scheduler

        def fn(params, x, state, concat_conds, embeds, t, plan_idx,
               plan_valid, randfs, flips, key):
            noises = self._step_core(
                params, x, concat_conds, embeds, t, plan_idx, plan_valid,
                randfs, flips,
            )
            state, x = sched.step(state, noises, x, key)
            return x, state, jnp.max(jnp.abs(x[0, 0]))

        jitted = jax.jit(fn)
        return lambda *a: jitted(self.models.unet_params, *a)

    def _build_sched_only_fn(self):
        """Scheduler update alone, for the group-split slot path."""
        sched = self.scheduler

        def fn(state, noises, x, key):
            state, x = sched.step(state, noises, x, key)
            return x, state, jnp.max(jnp.abs(x[0, 0]))

        return jax.jit(fn)

    def _build_fuse_step_fn(self):
        """yt-fusion + scheduler update for the multi-axis path."""
        sched = self.scheduler

        def fn(noises, noises_t, alpha, state, x, key):
            noises_t = adaptive_instance_normalization(noises_t, noises)
            noises = (
                jnp.sqrt(alpha) * noises_t + jnp.sqrt(1.0 - alpha) * noises
            )
            state, x = sched.step(state, noises, x, key)
            return x, state, jnp.max(jnp.abs(x[0, 0]))

        return jax.jit(fn)

    def _yt_windows(self, n: int):
        """Overlapping temporal window starts (generate.py:246-258)."""
        win = min(self.win_size_t, n)
        n_slices = math.ceil((n - 1) / (win - 1)) if win > 1 else 1
        if n_slices > 1:
            total_overlap = n_slices * win - n
            overlap = total_overlap // (n_slices - 1)
            last_overlap = overlap + total_overlap % (n_slices - 1)
            overlap_list = [overlap] * (n_slices - 2) + [last_overlap]
            cum = np.cumsum(overlap_list)
            starts = [0] + [(i + 1) * win - cum[i] for i in range(n_slices - 1)]
        else:
            starts, overlap_list = [0], [0]
        return win, starts, overlap_list

    def _yt_chunk_size(self, w: int, win: int) -> int:
        """Chunk size for the yt pass (`chunk_size_t`; 0 = auto).

        Measured on the flagship 960x720x30 yt pass (tools/bench_yt_sweep.py,
        v5e): steady yt-pass seconds/step = 3.03 (cs_t=2), 2.67 (4), 3.43
        (8), 3.82 (12), 4.74 (16). Slots are fused into one dispatch, so
        per-slot overhead is small, while the merged self-attention FLOPs
        grow ~linearly in chunk size — the reference's chunk_size reuse
        (generate.py:262) is already the measured optimum, so auto = that.
        The knob stays for other shapes (win >> w videos shift the
        crossover)."""
        if self.chunk_size_t > 0:
            return min(self.chunk_size_t, w)
        return min(self.chunk_size, w)

    def _yt_bind(self, cs_t: int) -> bool:
        """Bind the yt UNet variant (ToMeSpec with n_frames=cs_t) lazily;
        returns whether the dedicated yt path is active."""
        if cs_t == self.chunk_size:
            return False
        if self._yt_cs != cs_t:
            spec_t = dataclasses.replace(self.tome_spec, n_frames=cs_t)
            self._yt_unet = self.models.with_tome(
                spec_t, attn_backend=self.attn_backend).unet
            self._yt_cs = cs_t
            self._step_fn_t = None
            self._slot0_fn_t = None
            self._group_fn_t = None
        return True

    def _temporal_noises(self, x, concat_conds, embeds_t, t, rng, step_fn=None):
        """yt-plane noise prediction (generate.py:241-278): width columns
        become the chunked 'frame' axis; windows slide over time."""
        n, h, w, c = x.shape
        win, starts, overlaps = self._yt_windows(n)
        cs_t = self._yt_chunk_size(w, win)
        yt = self._yt_bind(cs_t)
        noises_t = jnp.zeros_like(x)
        for widx, sl in enumerate(starts):
            plan = chunklib.make_chunk_plan(
                w, cs_t, rng, self.chunk_ord, self.tome_spec.merge_global
            )
            slots = plan.indices.shape[0]
            randfs = rng.integers(0, 4, size=slots)
            flips = rng.random(slots) <= self.global_rand
            xt = jnp.swapaxes(x[sl : sl + win], 0, 2)        # (W, H, win, C) -> want (W, win, H, C)
            xt = jnp.swapaxes(xt, 1, 2)                       # (W, win, H, C)
            cct = jnp.swapaxes(concat_conds[sl : sl + win], 0, 2)
            cct = jnp.swapaxes(cct, 1, 2)
            pred = self._run_slots(
                xt, cct, embeds_t, t, plan, randfs, flips, yt=yt
            )  # (W, win, H, C)
            pred = jnp.swapaxes(pred, 1, 2)
            pred = jnp.swapaxes(pred, 0, 2)                   # (win, H, W, C)
            noises_t = noises_t.at[sl : sl + win].set(pred)
            if sl > 0:
                ov = overlaps[widx - 1]
                noises_t = noises_t.at[sl : sl + ov].multiply(np.sqrt(0.5))
        return noises_t

    def _build_loop_fn(self):
        """The WHOLE xy sampling loop as one jitted `lax.scan` over steps:
        zero per-step host dispatch (the axon tunnel charges 0.1-1 s per
        dispatch). Plans/randomness precomputed host-side (SURVEY §7.1)."""
        sched = self.scheduler

        def loop(params, x, concat_conds, embeds, ts, plan_idx, plan_valid,
                 randfs, flips, keys):
            state = sched.init_state(x)

            def body(carry, inp):
                x, state = carry
                t, p_idx, p_valid, rf, fl, key = inp
                noises = self._step_core(
                    params, x, concat_conds, embeds, t, p_idx, p_valid, rf, fl
                )
                state, x = sched.step(state, noises, x, key)
                return (x, state), None

            (x, state), _ = jax.lax.scan(
                body, (x, state),
                (ts, plan_idx, plan_valid, randfs, flips, keys),
            )
            return x

        return jax.jit(loop)

    def ddim_sample(self, x, embeds, embeds_t, concat_conds, seed=None):
        """Full sampling loop (generate.py ddim_sample :207-239)."""
        seed = self.seed if seed is None else seed
        # re-device params if a previous post-opt stage offloaded them
        if self.models.unet_params is None:
            self.models.unet_params = self.models.rebuild_params()
        leaves = jax.tree.leaves(self.models.unet_params)
        if self.mesh is not None and not getattr(self, "_params_on_mesh", False):
            from tclight_tpu.parallel.mesh import shard_params

            self.models.unet_params = shard_params(
                self.models.unet_params, self.mesh)
            self._params_on_mesh = True
        elif leaves and isinstance(leaves[0], np.ndarray):
            self.models.unet_params = jax.tree.map(
                jnp.asarray, self.models.unet_params
            )
        n = x.shape[0]
        sched = self.scheduler
        timesteps = sched.timesteps()
        t_steps = len(timesteps)

        plan_rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)

        if self.use_pnp:
            if self._pnp_latents_dir is None:
                raise FileNotFoundError(
                    "control=pnp requires inverted latents: pass a "
                    "latents_path holding noisy_latents_{t} for every "
                    "generation timestep (run the Inverter with "
                    "save_intermediate and save_steps=n_timesteps)")
            uncond, cond = embeds
            src_e = self.encode_prompt_inner("")  # pnp_guidance_embeds
            sq = uncond.shape[1]
            if src_e.shape[1] < sq:
                src_e = jnp.concatenate(
                    [src_e] * math.ceil(sq / src_e.shape[1]), axis=1)[:, :sq]
            return self._ddim_sample_pnp(
                x, (src_e, uncond, cond), concat_conds, plan_rng, key)

        if self.use_controlnet:
            if getattr(self, "_control_images", None) is None:
                raise RuntimeError("control images not prepared; call the "
                                   "Generator via __call__")
            return self._ddim_sample_ctrl(x, embeds, concat_conds, plan_rng,
                                          key)

        if self.alpha_t <= 0 and self.fuse_loop:
            # xy-only: one fused scan over all steps
            plans_idx, plans_valid, randfs_all, flips_all = [], [], [], []
            for _ in range(t_steps):
                plan = chunklib.make_chunk_plan(
                    n, self.chunk_size, plan_rng, self.chunk_ord,
                    self.tome_spec.merge_global,
                )
                slots = plan.indices.shape[0]
                plans_idx.append(plan.indices)
                plans_valid.append(plan.valid)
                randfs_all.append(plan_rng.integers(0, 4, size=slots))
                flips_all.append(plan_rng.random(slots) <= self.global_rand)
            keys = jax.random.split(key, t_steps)
            if self._loop_fn is None:
                self._loop_fn = self._build_loop_fn()
            return self._loop_fn(
                self.models.unet_params, x, concat_conds, embeds,
                jnp.asarray(timesteps, jnp.float32),
                jnp.asarray(np.stack(plans_idx)),
                jnp.asarray(np.stack(plans_valid)),
                jnp.asarray(np.stack(randfs_all), jnp.int32),
                jnp.asarray(np.stack(flips_all)),
                keys,
            )

        state = sched.init_state(x)
        if self._step_sched_fn is None:
            self._step_sched_fn = self._build_step_sched_fn()
        if self.alpha_t > 0 and self._fuse_step_fn is None:
            self._fuse_step_fn = self._build_fuse_step_fn()
        sync_every = max(1, int(_cfg_get(
            self.config.get("generation", {}), "sync_every", 1)))

        self._last_step_times = []
        for i, t in enumerate(timesteps):
            t_step0 = time.perf_counter()
            plan = chunklib.make_chunk_plan(
                n, self.chunk_size, plan_rng, self.chunk_ord,
                self.tome_spec.merge_global,
            )
            slots = plan.indices.shape[0]
            randfs_np = plan_rng.integers(0, 4, size=slots)
            flips_np = plan_rng.random(slots) <= self.global_rand
            t_arr = jnp.asarray(t, jnp.float32)
            key, sub = jax.random.split(key)
            split = slots > self.max_fused_slots + 1

            if self.alpha_t > 0:
                noises = self._run_slots(
                    x, concat_conds, embeds, t_arr, plan, randfs_np, flips_np
                )
                factor = self.final_factor_t ** min(i / t_steps, 1.0)
                alpha = self.alpha_t * factor
                noises_t = self._temporal_noises(
                    x, concat_conds, embeds_t, t_arr, plan_rng
                )
                x, state, sync = self._fuse_step_fn(
                    noises, noises_t, jnp.float32(alpha), state, x, sub
                )
            elif split:
                noises = self._run_slots_split(
                    x, concat_conds, embeds, t_arr, plan.indices, plan.valid,
                    randfs_np, flips_np,
                )
                if self._sched_only_fn is None:
                    self._sched_only_fn = self._build_sched_only_fn()
                x, state, sync = self._sched_only_fn(state, noises, x, sub)
            else:
                x, state, sync = self._step_sched_fn(
                    x, state, concat_conds, embeds, t_arr,
                    jnp.asarray(plan.indices), jnp.asarray(plan.valid),
                    jnp.asarray(randfs_np, jnp.int32), jnp.asarray(flips_np),
                    sub,
                )
            # periodic sync: deep async queues degrade axon execution
            # pathologically (>40 min for 25 queued steps). NB
            # block_until_ready returns early on axon — a host scalar fetch
            # is the reliable sync. The scalar is an output of the fused
            # step graph, so fetching it costs no extra dispatch.
            if (i + 1) % sync_every == 0 or i == t_steps - 1:
                _ = float(sync)
            self._last_step_times.append(time.perf_counter() - t_step0)
            log.info("step %d/%d t=%.1f", i + 1, t_steps, float(t))
        return x

    # ------------------------------------------------------------ __call__

    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.models.vae.config.block_out_channels) - 1)

    def prepare_init_noise(self, n_frames: int, h: int, w: int, seed: int):
        key = jax.random.PRNGKey(seed)
        lat_h, lat_w = h // self.vae_factor, w // self.vae_factor
        if self.noise_mode.lower() == "same":
            noise = jax.random.normal(key, (1, lat_h, lat_w, 4))
            return jnp.tile(noise, (n_frames, 1, 1, 1))
        if self.noise_mode.lower() == "vanilla":
            return jax.random.normal(key, (n_frames, lat_h, lat_w, 4))
        raise NotImplementedError(self.noise_mode)

    def composite_background(self, frames: np.ndarray) -> np.ndarray:
        """Background-conditioned mode (generate.py:147-167): RMBG alpha
        matte + composite over the background video/image."""
        gen_cfg = self.config.get("generation", {})
        bg_path = _cfg_get(gen_cfg, "background_image_path")
        if not bg_path:
            return frames
        from tclight_tpu.models.briarmbg import (
            BriaRMBG, compute_alpha_mattes, convert_rmbg_params,
        )
        from tclight_tpu.models.convert import load_torch_state_dict

        rmbg_ckpt = _cfg_get(gen_cfg, "rmbg_ckpt")
        model = BriaRMBG()
        if rmbg_ckpt and Path(str(rmbg_ckpt)).exists():
            variables = convert_rmbg_params(load_torch_state_dict(rmbg_ckpt))
        else:
            log.warning("no RMBG checkpoint; skipping background compositing")
            return frames
        alpha = compute_alpha_mattes(model, variables, frames)[..., None]
        bg = self.data_parser.load_video(path=str(bg_path))
        if len(bg) < len(frames):
            bg = np.concatenate([bg] * (len(frames) // len(bg) + 1))[: len(frames)]
        return alpha * frames + (1 - alpha) * bg[: len(frames)]

    def __call__(self, latents_path, output_path, frame_ids):
        frames = self.data_parser.load_video(frame_ids=frame_ids)
        gen_cfg = self.config.get("generation", {})
        if _cfg_get(gen_cfg, "background_cond", False):
            frames = self.composite_background(frames)
        n, h, w, _ = frames.shape
        tracker = CostTracker()
        self._frame_ids = list(frame_ids) if frame_ids is not None else None

        init_noise = self.prepare_init_noise(n, h, w, self.seed)
        if self.use_controlnet:
            # control images from the source frames (prepare_control,
            # VidToMe utils.py:349-380). The ControlNet cond embedder
            # downsamples by 8 (SD1.5); resize when the VAE factor differs
            # (tiny test stacks) so residuals land at latent resolution.
            from tclight_tpu.data.controlnet_utils import control_preprocess

            model_fn = None
            if self.control in ("softedge", "scribble"):
                ann = _cfg_get(gen_cfg, "annotator_ckpt")
                if ann and Path(str(ann)).exists():
                    from tclight_tpu.models.hed import softedge_model_fn

                    model_fn = softedge_model_fn(ann)
            if self.control in ("lineart", "lineart_anime"):
                ann = _cfg_get(gen_cfg, "annotator_ckpt")
                if ann and Path(str(ann)).exists():
                    from tclight_tpu.models.lineart import lineart_model_fn

                    model_fn = lineart_model_fn(ann)
            if self.control == "openpose":
                ann = _cfg_get(gen_cfg, "annotator_ckpt")
                if ann and Path(str(ann)).exists():
                    from tclight_tpu.models.openpose import openpose_model_fn

                    model_fn = openpose_model_fn(ann)
            if self.control == "depth":
                # DPT-backed depth annotator (controlnet_utils.py:63-74):
                # per-frame normalized depth stacked to 3 channels
                def model_fn(fr):
                    d = np.asarray(self.prepare_depth(
                        fr, (h // self.vae_factor, w // self.vae_factor),
                        None))
                    d = np.asarray(_resize_like(d, h, w))
                    d = (d + 1.0) / 2.0  # [-1,1] -> [0,1]
                    return np.repeat(d, 3, axis=-1).astype(np.float32)
            ctrl = control_preprocess(frames, self.control, model_fn=model_fn)
            if self.vae_factor != 8:
                import cv2

                lat_h, lat_w = h // self.vae_factor, w // self.vae_factor
                ctrl = np.stack([
                    cv2.resize(f, (lat_w * 8, lat_h * 8)) for f in ctrl
                ])
            self._control_images = jnp.asarray(ctrl)
        if self.models.model_key != "iclight" and latents_path:
            # inversion -> generation resume boundary (generate.py:192-195):
            # the inverted latents at the first generation timestep replace
            # the fresh init noise
            init_noise = self._load_inverted_latents(
                latents_path, frame_ids, init_noise)
        if self.models.model_key == "iclight":
            concat_conds = self.encode_imgs_batch(frames)
            if self.models.unet.config.in_channels == 12:
                # fbc: foreground + background latents (init_iclight_bg,
                # model_utils.py:97-179)
                bg_path = _cfg_get(gen_cfg, "background_image_path")
                if bg_path:
                    bg = self.data_parser.load_video(path=str(bg_path))
                    if len(bg) < n:
                        bg = np.concatenate([bg] * (n // len(bg) + 1))[:n]
                    bg_lat = self.encode_imgs_batch(bg[:n])
                else:
                    bg_lat = jnp.zeros_like(concat_conds)
                concat_conds = jnp.concatenate([concat_conds, bg_lat], axis=-1)
        elif self.models.unet.config.in_channels == 5:
            # sd-depth variant: the 5th channel is a normalized DPT depth
            # map at latent resolution (prepare_depth, VidToMe
            # utils.py:215-301)
            concat_conds = self.prepare_depth(
                frames, init_noise.shape[1:3], output_path)
        else:
            # generic SD path: no conditioning channels (zero-width concat)
            concat_conds = jnp.zeros(init_noise.shape[:3] + (0,))

        # flow/track preprocessing up front, before HBM fills with denoise
        # buffers (prompt-independent; flows are disk-cached anyway)
        past_flows = mask_bwds = None
        if self.apply_opt and self.data_parser is not None:
            log.info("preparing flows/masks/tracks...")
            _, _, _, _, past_flows, mask_bwds = self.data_parser.load_data(frame_ids)
            log.info("flow data ready (%d tracks)", self.data_parser.n_unique or -1)

        results = {}
        for edit_name, edit_prompt in self.prompts.items():
            if edit_prompt is None:
                edit_prompt = self._handle_missing_prompt(frames, output_path)
                self.prompts[edit_name] = edit_prompt
            log.info("prompt [%s]: %s", edit_name, edit_prompt)
            cond, uncond = self.encode_prompt_pair(edit_prompt, self.negative_prompt)
            cond_t, uncond_t = self.encode_prompt_pair(
                self.prompt_t, self.negative_prompt_t
            )

            t_stage0 = time.perf_counter()
            clean_latent = self.ddim_sample(
                init_noise, (uncond, cond), (uncond_t, cond_t), concat_conds
            )
            self.stage_times = getattr(self, "stage_times", {})
            self.stage_times["sampling"] = time.perf_counter() - t_stage0
            self.stage_times["step_times"] = [
                round(s, 3) for s in getattr(self, "_last_step_times", [])
            ]
            losses_exposure = losses_uvt = np.zeros(0)
            if self.apply_opt and past_flows is not None:
                # offload UNet params to host BEFORE decode: 16G chips
                # can't hold SD1.5 params + the decoded video + the
                # optimization backward at once, and decode only needs the
                # VAE. Params transfer back lazily on the next prompt.
                # Drain the device queue before transferring (axon surfaces
                # async faults/OOMs at the next transfer otherwise)
                clean_latent = jax.block_until_ready(clean_latent)
                if (self._host_unet_params is None
                        and getattr(self.models, "rebuild_params", None)
                        is None):
                    # one-time leaf-by-leaf host fetch (a whole-pytree
                    # device_put needs a params-sized staging copy in HBM
                    # and OOMs); kept as the mirror for later prompts.
                    # Skipped when the models carry a rebuild_params
                    # factory (the d2h fetch is ~150 s over the tunnel).
                    self._host_unet_params = jax.tree.map(
                        lambda a: np.asarray(a), self.models.unet_params
                    )
                dev_params = self.models.unet_params
                self.models.unet_params = self._host_unet_params  # may be None
                self._params_on_mesh = False
                if jax.tree.leaves(dev_params) and isinstance(
                    jax.tree.leaves(dev_params)[0], jax.Array
                ):
                    jax.tree.map(lambda a: a.delete(), dev_params)

            log.info("sampling done; decoding latents...")
            t_s = time.perf_counter()
            clean_frames = self.decode_latents_batch(
                clean_latent,
                params_offloaded=self.apply_opt and past_flows is not None,
            )
            self.stage_times["decode"] = time.perf_counter() - t_s
            log.info("decode done")

            if self.apply_opt and past_flows is not None:
                clean_frames = jnp.asarray(clean_frames)
                # static warp-kernel radius for the scatter-free Pallas warp
                # (flows are fixed during post-opt); CPU keeps the gather AD
                on_tpu = compute_platform() == "tpu"
                radius = flow_radius(np.asarray(past_flows)) if on_tpu else None
                if on_tpu:
                    # compact f16 uploads over the slow tunnel; kept f16 on
                    # device (saves ~1.9 GB at 300x1280x720) — the post-opt
                    # losses promote per-batch slices to f32
                    flows_dev = jnp.asarray(np.asarray(past_flows, np.float16))
                    masks_dev = jnp.asarray(np.asarray(mask_bwds, np.float16))
                else:
                    flows_dev = jnp.asarray(past_flows)
                    masks_dev = jnp.asarray(mask_bwds)
                log.info("exposure alignment (%d epochs)...", self.post_cfg.epochs_exposure)
                t_s = time.perf_counter()
                clean_frames, _, losses_exposure, exp_times = run_exposure_align(
                    clean_frames, flows_dev, masks_dev,
                    self.post_cfg, seed=self.seed, warp_radius=radius,
                    mesh=self.mesh,
                )
                self.stage_times["exposure"] = time.perf_counter() - t_s
                self.stage_times["exposure_epochs"] = exp_times.tolist()
                # materialize the aligned frames before UVT: a UVT OOM
                # poisons any still-queued async ops, which would lose the
                # exposure result too
                clean_frames = jax.block_until_ready(clean_frames)
                log.info("UVT optimization (%d epochs)...", self.post_cfg.epochs)
                t_s = time.perf_counter()
                try:
                    clean_frames, losses_uvt, uvt_times = run_uvt(
                        clean_frames, flows_dev, masks_dev,
                        self.data_parser.unq_inv, self.data_parser.n_unique,
                        self.post_cfg, seed=self.seed, warp_radius=radius,
                        mesh=self.mesh,
                    )
                    self.stage_times["uvt_epochs"] = uvt_times.tolist()
                except Exception as e:  # noqa: BLE001
                    # UVT is a refinement stage; a toolchain failure (OOM at
                    # the 300x1280x720 palette scale, remote-compiler crash)
                    # must not lose the exposure-aligned result. After an
                    # OOM the device is too full for further work, so fetch
                    # the frames to host immediately (d2h allocates no HBM)
                    # and let the save path run host-side.
                    log.warning("UVT optimization failed (%s); keeping "
                                "exposure-aligned frames", e)
                    self.stage_times["uvt_failed"] = True
                    if isinstance(clean_frames, jax.Array):
                        try:
                            clean_frames = np.asarray(clean_frames)
                        except Exception:  # noqa: BLE001
                            log.warning("could not fetch exposure-aligned "
                                        "frames after the UVT failure")
                            raise

            if self.apply_opt and past_flows is not None:
                self.stage_times["uvt"] = time.perf_counter() - t_s
                # flows/masks are dead after post-opt (f16, ~1.7 GB at
                # 300x1280x720): free them before the output fetch — a
                # full device refuses even the small quantize slices
                for buf in (flows_dev, masks_dev):
                    if isinstance(buf, jax.Array):
                        try:
                            buf.delete()
                        except Exception:  # noqa: BLE001
                            pass
            t_out = time.perf_counter()
            save_name = (
                f"lmr_{self.tome_spec.local_ratio}_gmr_{self.tome_spec.global_ratio}"
                f"_alpha_t_{self.alpha_t}_opt_{edit_name}"
            )
            out_dir = Path(output_path) / save_name
            out_dir.mkdir(parents=True, exist_ok=True)
            fps = getattr(self.data_parser, "fps", 25)
            # the GT encode only needs the host input frames: run it on a
            # thread DURING the device fetch (cv2 encode + the d2h wait
            # both release the GIL)
            import threading

            gt_thread = threading.Thread(
                target=save_video, args=(frames, out_dir / "output_gt.mp4"),
                kwargs={"fps": fps}, name="gt-mp4")
            gt_thread.start()
            if (isinstance(clean_frames, jax.Array)
                    and compute_platform() == "tpu"):
                # quantize to uint8 on device: 4x less d2h over the slow
                # tunnel, and the mp4 output is 8-bit anyway. Chunked so
                # the temp never doubles a multi-GB video (and survives a
                # post-OOM fragmented HBM); chunks stream straight into
                # the threaded mp4 writer so the encode overlaps the
                # fetch. Local backends keep exact f32.
                try:
                    qbs = 16
                    q = jax.jit(lambda f: jnp.clip(
                        f * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8))
                    # keep uint8: save_video/save_frames take it directly,
                    # and the f32 round trip was a 250 MB host-side
                    # convert that save_video immediately re-quantized
                    fetched: list[np.ndarray] = []

                    def _fetch_chunks():
                        # dispatch EVERY quantize up front and queue their
                        # host copies async: the per-chunk
                        # dispatch->block->dispatch loop serialized a
                        # tunnel round-trip per 16 frames (output_fetch
                        # measured 5.5-17 s for 62 MB across same-code
                        # runs). The uint8 chunks total 1/4 of the f32
                        # source, so holding them all on device is cheap.
                        qs = [q(clean_frames[i : i + qbs])
                              for i in range(0, clean_frames.shape[0], qbs)]
                        for a in qs:
                            try:
                                a.copy_to_host_async()
                            except Exception:  # noqa: BLE001
                                pass
                        for a in qs:
                            c = np.asarray(a)
                            fetched.append(c)
                            yield c

                    save_video_stream(
                        _fetch_chunks(), out_dir / "output.mp4", fps=fps)
                    clean_frames = np.concatenate(fetched)
                except Exception:  # noqa: BLE001
                    # a full device (e.g. right after a multi-GB UVT
                    # render) can refuse even the small slice; fall back
                    # to a whole-buffer d2h, then per-frame fetches (the
                    # smallest possible device-side staging) as a last
                    # resort
                    log.warning("uint8 output path failed; fetching f32")
                    try:
                        clean_frames = np.asarray(clean_frames)
                    except Exception:  # noqa: BLE001
                        clean_frames = np.stack([
                            np.asarray(clean_frames[i])
                            for i in range(clean_frames.shape[0])
                        ])
                    save_video(clean_frames, out_dir / "output.mp4", fps=fps)
            else:
                clean_frames = np.asarray(clean_frames)
                save_video(clean_frames, out_dir / "output.mp4", fps=fps)
            # fetch and the two encodes overlap; report the combined wall
            # as output_fetch and the host-only tail as output_save
            self.stage_times["output_fetch"] = time.perf_counter() - t_out
            cost = tracker.finish(n, h, w)
            gt_thread.join()
            if self.save_frame:
                save_frames(clean_frames, out_dir / "frames")
            self._save_run_config(out_dir, cost, edit_name, edit_prompt)
            self._save_loss_curves(out_dir, losses_exposure, losses_uvt)
            # expose the raw curves for tests/tools (golden regression)
            self.last_postopt_losses = {
                "exposure": np.asarray(losses_exposure),
                "uvt": np.asarray(losses_uvt),
            }
            self.stage_times["output_save"] = (
                time.perf_counter() - t_out
                - self.stage_times.get("output_fetch", 0.0))
            results[edit_name] = clean_frames
            log.info("done [%s]: %.1fs total, %.2fs/frame", edit_name,
                     cost["total_time"], cost["sec_per_frame"])
        return results

    def prepare_depth(self, frames, latent_hw, output_path):
        """Depth channel for the sd-depth UNet, disk-cached like the
        reference (work_dir/depth, VidToMe utils.py:217-242). The DPT
        estimator loads from `generation.depth_ckpt`; tests may inject
        `self.depth_fn(frames, latent_hw) -> (N, lh, lw, 1)` directly."""
        cache = None
        if output_path:
            cache = (Path(output_path) / "depth" /
                     f"depth_{len(frames)}_{latent_hw[0]}x{latent_hw[1]}.npy")
            if cache.exists():
                log.info("loaded depth maps from %s", cache)
                return jnp.asarray(np.load(cache))
        if getattr(self, "depth_fn", None) is not None:
            depth = self.depth_fn(frames, latent_hw)
        else:
            from tclight_tpu.models.convert import load_torch_state_dict
            from tclight_tpu.models.dpt import (
                DPTForDepthEstimation, convert_dpt,
                dpt_config_for_state_dict, prepare_depth_maps)

            ckpt = _cfg_get(self.config.get("generation", {}), "depth_ckpt")
            if not ckpt or not Path(str(ckpt)).exists():
                raise FileNotFoundError(
                    "sd-depth needs generation.depth_ckpt pointing at a "
                    "local DPT checkpoint (transformers "
                    "DPTForDepthEstimation state dict)")
            sd = load_torch_state_dict(ckpt)
            cfg = dpt_config_for_state_dict(sd)
            model = DPTForDepthEstimation(cfg)
            params = convert_dpt(sd, cfg)
            depth = prepare_depth_maps(model, params, frames, latent_hw)
        if cache is not None:
            cache.parent.mkdir(parents=True, exist_ok=True)
            np.save(cache, np.asarray(depth))
        return depth

    def _load_inverted_latents(self, latents_path, frame_ids, init_noise):
        """Load `noisy_latents_{t0}` as init noise; for PnP, verify the
        whole per-timestep latent cache exists (check_latent_exists,
        generate_utils.py:328-338)."""
        from tclight_tpu.pipeline.invert import check_latent_exists, load_latent

        ts = self.scheduler.timesteps()
        need = list(ts) if self.use_pnp else [ts[0]]
        missing = [
            float(t) for t in need
            if not check_latent_exists(latents_path, float(t), frame_ids)
        ]
        if missing:
            msg = (f"inverted latents missing at {latents_path} for "
                   f"timesteps {missing[:5]}{'...' if len(missing) > 5 else ''}")
            if self.use_pnp:
                raise FileNotFoundError(
                    msg + " — PnP needs latents at every generation "
                    "timestep (Inverter save_intermediate with "
                    "save_steps == n_timesteps)")
            log.warning("%s; using fresh init noise", msg)
            return init_noise
        self._pnp_latents_dir = latents_path
        loaded = load_latent(latents_path, float(ts[0]), frame_ids)
        log.info("loaded inverted init latents %s from %s",
                 loaded.shape, latents_path)
        return jnp.asarray(loaded)

    def _handle_missing_prompt(self, frames, output_path) -> str:
        """Pixtral prompt upsampling (generate.py:536-547); falls back to a
        generic prompt when no upsampler checkpoint is available."""
        ckpt = _cfg_get(self.config.get("generation", {}), "prompt_upsampler_ckpt")
        if ckpt and Path(str(ckpt)).exists():
            from tclight_tpu.models.pixtral import upsample_prompt_from_frames

            return upsample_prompt_from_frames(ckpt, frames)
        log.warning("no prompt given and no upsampler checkpoint; using default")
        return "high quality, detailed, realistic lighting"

    def _save_run_config(self, out_dir: Path, cost, edit_name, edit_prompt):
        from tclight_tpu.config import ConfigDict, save_config

        cfg = (
            self.config.copy()
            if hasattr(self.config, "copy") and isinstance(self.config, dict)
            else ConfigDict(dict(self.config))
        )
        for k, v in cost.items():
            cfg[k] = v
        if "generation" in cfg:
            cfg["generation"]["prompt"] = {edit_name: edit_prompt}
        save_config(cfg, out_dir / "config.yaml")

    def _save_loss_curves(self, out_dir, losses_exposure, losses_uvt):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for name, arr in (
                ("loss_exposure", losses_exposure),
                ("loss_unique_tensor", losses_uvt),
            ):
                if arr.size:
                    fig = plt.figure()
                    plt.plot(arr)
                    plt.xlabel("iter")
                    plt.ylabel("loss")
                    fig.savefig(out_dir / f"{name}.png", dpi=80)
                    plt.close(fig)
        except Exception as e:  # loss curves are best-effort
            log.warning("loss curve saving failed: %s", e)
