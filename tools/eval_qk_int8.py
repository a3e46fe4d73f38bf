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
import argparse
import json
import os
import time

import numpy as np

import bench
from tclight_tpu.config import ConfigDict
from tclight_tpu.data.dataparsers import VideoDataParser
from tclight_tpu.eval.metrics import psnr, ssim_gaussian


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pv", action="store_true",
                    help="evaluate int8 PV on top of int8 QK (baseline "
                         "becomes QK-int8 so the PV change is isolated)")
    args = ap.parse_args()

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

    def make_cfg(variant: tuple) -> ConfigDict:
        qk, pv, tag = variant
        return ConfigDict({
            "work_dir": str(work / f"wd_{tag}"),
            "data": {"scene_type": "video", "rgb_path": str(vid_dir),
                     "height": h, "width": w, "fps": 25,
                     "flow_model": "farneback"},
            "generation": {
                "guidance_scale": 2.0, "n_timesteps": steps, "chunk_size": 4,
                "chunk_ord": "mix-4", "local_merge_ratio": 0.6,
                "merge_global": True, "global_merge_ratio": 0.5,
                "align_batch": True, "max_downsample": 2,
                "noise_mode": "same", "alpha_t": 0.0,
                "attn_qk_int8": qk, "attn_pv_int8": pv,
                "final_factor_t": 0.01,
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

    if args.pv:
        variants = ((True, False, "qk8"), (True, True, "qk8pv8"))
    else:
        variants = ((False, False, "fp"), (True, False, "qk8"))
    base_tag, test_tag = variants[0][2], variants[1][2]
    outs = {}
    for variant in variants:
        # the post-opt offload DELETES the UNet device params at the end
        # of each run; rebuild before constructing the next Generator
        try:
            deleted = jax.tree.leaves(models.unet_params)[0].is_deleted()
        except Exception:  # noqa: BLE001 — None or host arrays
            deleted = models.unet_params is None
        if deleted:
            models.unet_params = make_unet_params()
        tag = variant[2]
        parser = VideoDataParser(make_cfg(variant).data)
        gen = Generator(models, make_cfg(variant), data_parser=parser)
        t0 = time.time()
        outs[tag] = np.asarray(
            gen(None, str(work / f"out_{tag}"), list(range(n)))["qk"],
            np.float32)
        print(f"[{tag}] pipeline {time.time()-t0:.1f}s "
              f"stages {getattr(gen, 'stage_times', {})}", flush=True)

    # pipeline outputs are uint8-scale (0..255); psnr/ssim assume range 1.0
    a, b_ = outs[base_tag] / 255.0, outs[test_tag] / 255.0

    def warp_l1(out):
        rolled = np.stack([np.roll(out[t], shift, axis=1)
                           for t in range(n - 1)])
        return float(np.abs(rolled - out[1:]).mean())

    res = {
        "base": base_tag, "test": test_tag,
        "psnr_base_vs_test": round(psnr(a, b_), 2),
        "ssim_base_vs_test": round(float(np.mean(
            [ssim_gaussian(a[t], b_[t]) for t in range(n)])), 4),
        f"warp_l1_{base_tag}": round(warp_l1(a), 5),
        f"warp_l1_{test_tag}": round(warp_l1(b_), 5),
        f"out_mean_{base_tag}": round(float(a.mean()), 5),
        f"out_mean_{test_tag}": round(float(b_.mean()), 5),
        f"out_std_{base_tag}": round(float(a.std()), 5),
        f"out_std_{test_tag}": round(float(b_.std()), 5),
    }
    res["warp_l1_rel_delta"] = round(
        abs(res[f"warp_l1_{test_tag}"] - res[f"warp_l1_{base_tag}"])
        / max(res[f"warp_l1_{base_tag}"], 1e-9), 4)
    res["neutral"] = bool(res["psnr_base_vs_test"] >= 35.0
                          and res["ssim_base_vs_test"] >= 0.95
                          and res["warp_l1_rel_delta"] <= 0.05)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
