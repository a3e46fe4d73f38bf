"""TPU quality eval for the int8-QK attention variant (VERDICT r4 #2).

Runs the SAME end-to-end relighting workload (bench.py's synthetic
rolling-texture video, identical seeds/noise/weights) twice in one
process — fp (pallas) vs int8-QK (pallas_int8) — and reports
output-delta and temporal-consistency metrics:

- psnr / mean SSIM between the two final outputs (the int8 kernel is the
  ONLY difference, so this isolates the quantization's end-to-end effect
  through 25 denoise steps + post-opt);
- warp-L1 of each output under the exact synthetic flow (the temporal-
  consistency metric the golden regression tracks);
- golden-style out_mean/out_std per variant.

Decision rule (documented in PERF_NOTES): int8 defaults on when
psnr >= 35 dB, mean SSIM >= 0.95, and the warp-L1 relative delta is
within 5% — i.e. the variant is indistinguishable at the metrics that
matter for the task (temporal consistency + content preservation).
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))
import json
import os
import time

import numpy as np

import bench
from tclight_tpu.config import ConfigDict
from tclight_tpu.data.dataparsers import VideoDataParser
from tclight_tpu.eval.metrics import psnr, ssim_gaussian


def main():
    import jax
    import jax.numpy as jnp

    from tclight_tpu.diffusion.schedulers import DPMSolverMultistepScheduler
    from tclight_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from tclight_tpu.models.unet import UNet2DCondition, UNetConfig
    from tclight_tpu.models.vae import AutoencoderKL, VAEConfig
    from tclight_tpu.pipeline.generator import Generator
    from tclight_tpu.pipeline.iclight import DummyTokenizer, ICLightModels

    n, h, w, steps = 8, 384, 512, 25
    shift = 2
    key = jax.random.PRNGKey(0)
    ucfg = UNetConfig(in_channels=8, block_out_channels=(160, 320, 640, 640),
                      layers_per_block=2, num_heads=8, context_dim=768,
                      dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    unet_init = jax.jit(unet.init)

    def make_unet_params():
        return unet_init(
            key, jnp.zeros((8, 16, 16, 8), ucfg.dtype), jnp.asarray(1.0),
            jnp.zeros((8, 77, ucfg.context_dim), ucfg.dtype))

    unet_params = make_unet_params()
    vcfg = VAEConfig.sd15(dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg)
    vae_params = jax.jit(vae.init)(key, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    tcfg = CLIPTextConfig.sd15()
    text = CLIPTextModel(tcfg)
    text_params = jax.jit(text.init)(key, jnp.zeros((1, 77), jnp.int32))
    models = ICLightModels(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        tokenizer=DummyTokenizer(vocab_size=tcfg.vocab_size),
        scheduler=DPMSolverMultistepScheduler(num_inference_steps=steps),
        rebuild_params=make_unet_params)

    work = _Path(os.environ.get("EVAL_WORKDIR", "/tmp/tclight_qk_eval"))
    work.mkdir(parents=True, exist_ok=True)
    vid_dir, _ = bench.make_synthetic(work, n, h, w, shift=shift)

    def make_cfg(int8: bool) -> ConfigDict:
        return ConfigDict({
            "work_dir": str(work / ("wd_int8" if int8 else "wd_fp")),
            "data": {"scene_type": "video", "rgb_path": str(vid_dir),
                     "height": h, "width": w, "fps": 25,
                     "flow_model": "farneback"},
            "generation": {
                "guidance_scale": 2.0, "n_timesteps": steps, "chunk_size": 4,
                "chunk_ord": "mix-4", "local_merge_ratio": 0.6,
                "merge_global": True, "global_merge_ratio": 0.5,
                "align_batch": True, "max_downsample": 2,
                "noise_mode": "same", "alpha_t": 0.0,
                "attn_qk_int8": int8, "final_factor_t": 0.01,
                "win_size_t": 64, "prompt_t": "best quality",
                "negative_prompt_t": "jittery",
                "negative_prompt": "low quality", "save_frame": False,
                "prompt": {"qk": "warm golden hour sunlight, photoreal"}},
            "post_opt": {"apply_opt": True, "epochs_exposure": 5,
                         "epochs": 7, "batch_size": 8, "lambda_dssim": 0.2,
                         "lambda_flow": 0.8, "lambda_tv": 0.05,
                         "feature_lr": 0.05, "exposure_lr_init": 0.01,
                         "exposure_lr_final": 0.001,
                         "exposure_lr_delay_steps": 0,
                         "exposure_lr_delay_mult": 0.0, "ms_ssim_levels": 5},
            "seed": 7,
        })

    outs = {}
    for name, int8 in (("fp", False), ("int8", True)):
        # the post-opt offload DELETES the UNet device params at the end
        # of each run; rebuild before constructing the next Generator
        try:
            jax.tree.leaves(models.unet_params)[0].is_deleted()
            deleted = jax.tree.leaves(models.unet_params)[0].is_deleted()
        except Exception:  # noqa: BLE001 — None or host arrays
            deleted = models.unet_params is None
        if deleted:
            models.unet_params = make_unet_params()
        parser = VideoDataParser(make_cfg(int8).data)
        gen = Generator(models, make_cfg(int8), data_parser=parser)
        t0 = time.time()
        outs[name] = np.asarray(
            gen(None, str(work / f"out_{name}"), list(range(n)))["qk"],
            np.float32)
        print(f"[{name}] pipeline {time.time()-t0:.1f}s "
              f"stages {getattr(gen, 'stage_times', {})}", flush=True)

    # pipeline outputs are uint8-scale (0..255); psnr/ssim assume range 1.0
    a, b_ = outs["fp"] / 255.0, outs["int8"] / 255.0

    def warp_l1(out):
        rolled = np.stack([np.roll(out[t], shift, axis=1)
                           for t in range(n - 1)])
        return float(np.abs(rolled - out[1:]).mean())

    res = {
        "psnr_fp_vs_int8": round(psnr(a, b_), 2),
        "ssim_fp_vs_int8": round(float(np.mean(
            [ssim_gaussian(a[t], b_[t]) for t in range(n)])), 4),
        "warp_l1_fp": round(warp_l1(a), 5),
        "warp_l1_int8": round(warp_l1(b_), 5),
        "out_mean_fp": round(float(a.mean()), 5),
        "out_mean_int8": round(float(b_.mean()), 5),
        "out_std_fp": round(float(a.std()), 5),
        "out_std_int8": round(float(b_.std()), 5),
    }
    res["warp_l1_rel_delta"] = round(
        abs(res["warp_l1_int8"] - res["warp_l1_fp"])
        / max(res["warp_l1_fp"], 1e-9), 4)
    res["neutral"] = bool(res["psnr_fp_vs_int8"] >= 35.0
                          and res["ssim_fp_vs_int8"] >= 0.95
                          and res["warp_l1_rel_delta"] <= 0.05)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
