"""Measure the yt-plane (temporal) denoise pass alone across chunk_size_t
variants on the flagship 960x720x30 shape (reference temporal_denoise,
generate.py:241-285).

The yt pass chunks the latent WIDTH axis; the reference reuses the xy
chunk_size (4), which on TPU means 31 slots of tiny (win x H) images per
step, dominated by per-slot fixed costs. This harness times ONLY
Generator._temporal_noises (the xy graphs never compile), so a 4-point
chunk_size_t sweep fits in ~15 min on the tunneled v5e.

Usage:  python tools/bench_yt_sweep.py [cs_t ...]   (default 4 8 12 16)
"""

from __future__ import annotations

import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=None) -> int:
    argv = list(_sys.argv[1:] if argv is None else argv)
    variants = [int(a) for a in argv] or [4, 8, 12, 16]

    import jax
    import jax.numpy as jnp

    from tclight_tpu.config import ConfigDict
    from tclight_tpu.diffusion.schedulers import DPMSolverMultistepScheduler
    from tclight_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from tclight_tpu.models.unet import UNet2DCondition, UNetConfig
    from tclight_tpu.models.vae import AutoencoderKL, VAEConfig
    from tclight_tpu.pipeline.generator import Generator
    from tclight_tpu.pipeline.iclight import DummyTokenizer, ICLightModels

    n, lat_h, lat_w = 30, 90, 120  # 960x720 latents
    key = jax.random.PRNGKey(0)
    ucfg = UNetConfig.sd15(in_channels=8)
    unet = UNet2DCondition(ucfg)
    t0 = time.time()
    unet_params = jax.jit(unet.init)(
        key, jnp.zeros((8, 16, 16, 8), ucfg.dtype), jnp.asarray(1.0),
        jnp.zeros((8, 77, ucfg.context_dim), ucfg.dtype))
    jax.block_until_ready(unet_params)
    print(f"unet init {time.time()-t0:.1f}s", flush=True)

    vcfg = VAEConfig.sd15(dtype=jnp.bfloat16)
    tcfg = CLIPTextConfig.sd15()
    text = CLIPTextModel(tcfg)
    models = ICLightModels(
        unet=unet, unet_params=unet_params,
        vae=AutoencoderKL(vcfg), vae_params=None,
        text_encoder=text,
        text_params=jax.jit(text.init)(key, jnp.zeros((1, 77), jnp.int32)),
        tokenizer=DummyTokenizer(vocab_size=tcfg.vocab_size),
        scheduler=DPMSolverMultistepScheduler(num_inference_steps=25),
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, lat_h, lat_w, 4)), jnp.float32)
    cc = jnp.asarray(rng.standard_normal((n, lat_h, lat_w, 4)), jnp.float32)
    t_arr = jnp.asarray(500.0, jnp.float32)

    results = {}
    for cs_t in variants:
        cfg = ConfigDict({
            "generation": {
                "guidance_scale": 2.0, "n_timesteps": 25, "chunk_size": 4,
                "chunk_ord": "mix-4", "local_merge_ratio": 0.6,
                "merge_global": True, "global_merge_ratio": 0.5,
                "align_batch": True, "max_downsample": 2,
                "alpha_t": 0.3, "win_size_t": 64, "chunk_size_t": cs_t,
                "prompt": {"bench": "x"},
            },
            "seed": 7,
        })
        gen = Generator(models, cfg)
        embeds_t = gen.encode_prompt_pair("best quality", "jittery")
        plan_rng = np.random.default_rng(7)

        t0 = time.time()
        out = gen._temporal_noises(x, cc, embeds_t, t_arr, plan_rng)
        _ = float(jnp.sum(out[0, 0, :2]))  # host fetch = reliable axon sync
        compile_s = time.time() - t0

        times = []
        for _i in range(3):
            t0 = time.time()
            out = gen._temporal_noises(x, cc, embeds_t, t_arr, plan_rng)
            _ = float(jnp.sum(out[0, 0, :2]))
            times.append(time.time() - t0)
        steady = float(np.median(times))
        results[cs_t] = (compile_s, steady)
        print(f"cs_t={cs_t:3d}: compile+first {compile_s:7.1f}s  "
              f"steady yt-pass {steady:6.2f}s  (runs {['%.2f' % t for t in times]})",
              flush=True)

    print("\nsummary (steady yt-pass seconds per sampling step):")
    for cs_t, (_c, s) in sorted(results.items()):
        print(f"  chunk_size_t={cs_t}: {s:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
