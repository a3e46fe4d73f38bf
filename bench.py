"""End-to-end benchmark: TC-Light relighting sec/frame on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BENCH_PRESET=full, default): 30 frames @ 960x720, SD1.5-topology
IC-Light UNet (random bf16 weights — identical compute to real weights), 25
DPM-Solver++(SDE) steps with VidToMe token merging + global banks, VAE
encode/decode, and the full two-stage post-optimization (35 exposure + 70
UVT epochs) on a synthetic rolling video with analytically-known flow.
This mirrors the reference's default workload (configs/tclight_default.yaml
:frame_range 0..30, 960x720; BASELINE.md) end to end.

vs_baseline: the reference publishes no sec/frame number (BASELINE.json
published: {}; the paper's tables are not in-repo and this environment has
no GPU or diffusers to measure the torch pipeline). The baseline is
therefore a DERIVED A100-40G cost model, anchored on public SD1.5
throughput (see BASELINE.md "Derived A100 baseline" for the full
arithmetic): ~77 ms per CFG denoise step at 512x512 on A100 fp16+xformers,
scaled by latent area to 960x720 (x2.64) with a ~1.6x VidToMe merge
speedup -> ~127 ms/frame-step; + VAE decode, MemFlow, and the 105
post-opt epochs -> ~150 s for the 30-frame default workload, i.e.
~5.0 s/frame. vs_baseline = 5.0 / measured.

By default the bench runs the pipeline TWICE on the same Generator and
reports the second run: compiles and the tunnel's first-transfer stall
(55-600 s, PERF_NOTES) are one-time process costs, while the framework's
serving shape is many videos/prompts per process. The cold first run is
logged to stderr. BENCH_RUNS=1 restores the cold measurement.

Env knobs: BENCH_PRESET=full|quick, BENCH_FRAMES, BENCH_H, BENCH_W,
BENCH_STEPS, BENCH_UNET=sd15|mid|tiny, BENCH_RUNS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_SEC_PER_FRAME = 5.0  # derived A100 model; see BASELINE.md


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_backend(retries: int | None = None, timeout: int | None = None,
                  backoff: int | None = None):
    """Probe JAX backend availability in a SUBPROCESS with bounded retries.

    A down axon tunnel hangs indefinitely inside
    `xla_client.make_c_api_client` — uninterruptible in-process (this
    crashed the round-2 driver bench with a raw UNAVAILABLE traceback).
    Probing out-of-process keeps the bench responsive and lets it emit an
    explicit artifact on a dead backend instead of rc=1.

    Returns (platform, n_devices) or (None, 0) after all retries fail.
    """
    import subprocess

    retries = retries or int(os.environ.get("BENCH_PROBE_RETRIES", 3))
    timeout = timeout or int(os.environ.get("BENCH_PROBE_TIMEOUT", 240))
    backoff = backoff or int(os.environ.get("BENCH_PROBE_BACKOFF", 45))
    code = "import jax; d = jax.devices(); print(d[0].platform, len(d))"
    for attempt in range(1, retries + 1):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=timeout,
            )
            line = out.stdout.strip().splitlines()
            if out.returncode == 0 and line:
                platform, ndev = line[-1].split()
                log(f"[bench] backend probe ok: {platform} x{ndev}")
                return platform, int(ndev)
            log(f"[bench] probe {attempt}/{retries}: rc={out.returncode} "
                f"{out.stderr.strip().splitlines()[-1:]}")
        except subprocess.TimeoutExpired:
            log(f"[bench] probe {attempt}/{retries}: timed out after "
                f"{timeout}s (tunnel down?)")
        if attempt < retries:
            log(f"[bench] retrying backend probe in {backoff}s")
            time.sleep(backoff)
    return None, 0


def emit(payload: dict) -> None:
    """The ONE JSON line the driver records."""
    print(json.dumps(payload), flush=True)


def load_variant_blocks() -> dict:
    """Builder-measured flagship-variant numbers (multi-axis yt pass,
    300x1280x720 long video, cold/steady splits), committed as
    BENCH_VARIANTS.json whenever they are re-measured on real TPU. Embedded
    in the bench output so every round's artifact carries them, clearly
    labeled with their measurement timestamp."""
    p = Path(__file__).parent / "BENCH_VARIANTS.json"
    if p.exists():
        try:
            return json.loads(p.read_text())
        except Exception:
            return {}
    return {}


def make_synthetic(work: Path, n: int, h: int, w: int, shift: int = 2):
    """Rolling-texture video + exact flow caches (so the bench measures the
    pipeline, not Farneback)."""
    from tclight_tpu.utils.video_io import save_frames

    rng = np.random.default_rng(0)
    base = rng.uniform(0.15, 0.85, (h, w, 3)).astype(np.float32)
    # smooth the texture so it resembles natural video statistics
    import cv2

    base = cv2.GaussianBlur(base, (0, 0), 3)
    frames = np.stack([np.roll(base, shift * t, axis=1) for t in range(n)])
    vid_dir = work / "vid"
    save_frames(frames, vid_dir)
    fut = np.zeros((n, h, w, 2), np.float32)
    fut[..., 0] = shift
    past = -fut
    for d, arr in (("future", fut), ("past", past)):
        cache = work / f"vid_{d}_flow_farneback"
        cache.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            np.save(cache / f"{i:05d}.npy", arr[i])
    return vid_dir, frames


def main() -> int:
    t_start = time.time()
    preset = os.environ.get("BENCH_PRESET", "full")
    if preset == "quick":
        n, h, w, steps, unet_kind = 8, 384, 512, 25, "mid"
    else:
        n, h, w, steps, unet_kind = 30, 720, 960, 25, "sd15"
    n = int(os.environ.get("BENCH_FRAMES", n))
    h = int(os.environ.get("BENCH_H", h))
    w = int(os.environ.get("BENCH_W", w))
    steps = int(os.environ.get("BENCH_STEPS", steps))
    unet_kind = os.environ.get("BENCH_UNET", unet_kind)

    platform, ndev = probe_backend()
    if platform is None:
        emit({
            "metric": f"e2e_sec_per_frame_{w}x{h}x{n}",
            "value": 0.0,
            "unit": "s/frame",
            "vs_baseline": 0.0,
            "error": "backend unavailable: jax.devices() did not come up "
                     "in any bounded probe (axon tunnel down); no "
                     "measurement possible this run",
            "variants": load_variant_blocks(),
        })
        return 0

    import jax
    import jax.numpy as jnp

    from tclight_tpu.config import ConfigDict
    from tclight_tpu.data.dataparsers import VideoDataParser
    from tclight_tpu.diffusion.schedulers import DPMSolverMultistepScheduler
    from tclight_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from tclight_tpu.models.unet import UNet2DCondition, UNetConfig
    from tclight_tpu.models.vae import AutoencoderKL, VAEConfig
    from tclight_tpu.pipeline.generator import Generator
    from tclight_tpu.pipeline.iclight import DummyTokenizer, ICLightModels

    log(f"[bench] preset={preset} frames={n} {w}x{h} steps={steps} unet={unet_kind}")
    log(f"[bench] devices: {jax.devices()}")

    key = jax.random.PRNGKey(0)
    if unet_kind == "sd15":
        ucfg = UNetConfig.sd15(in_channels=8)
    elif unet_kind == "mid":
        ucfg = UNetConfig(in_channels=8, block_out_channels=(160, 320, 640, 640),
                          layers_per_block=2, num_heads=8, context_dim=768,
                          dtype=jnp.bfloat16)
    else:
        ucfg = UNetConfig.tiny(in_channels=8, dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    t0 = time.time()
    unet_init = jax.jit(unet.init)

    def make_unet_params():
        return unet_init(
            key, jnp.zeros((8, 16, 16, 8), ucfg.dtype), jnp.asarray(1.0),
            jnp.zeros((8, 77, ucfg.context_dim), ucfg.dtype),
        )

    unet_params = make_unet_params()
    jax.block_until_ready(unet_params)
    log(f"[bench] unet init {time.time()-t0:.1f}s")

    vcfg = VAEConfig.sd15(dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg)
    t0 = time.time()
    vae_params = jax.jit(vae.init)(key, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    jax.block_until_ready(vae_params)
    log(f"[bench] vae init {time.time()-t0:.1f}s")

    tcfg = CLIPTextConfig.sd15()
    text = CLIPTextModel(tcfg)
    text_params = jax.jit(text.init)(key, jnp.zeros((1, 77), jnp.int32))

    models = ICLightModels(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        tokenizer=DummyTokenizer(vocab_size=tcfg.vocab_size),
        scheduler=DPMSolverMultistepScheduler(num_inference_steps=steps),
        # deterministic re-init on device: post-opt offload deletes params
        # instead of fetching a 1.7 GB host mirror over the tunnel
        rebuild_params=make_unet_params,
    )

    work = Path(os.environ.get("BENCH_WORKDIR", "/tmp/tclight_bench"))
    work.mkdir(parents=True, exist_ok=True)
    vid_dir, _ = make_synthetic(work, n, h, w)

    cfg = ConfigDict({
        "work_dir": str(work / "wd"),
        "data": {"scene_type": "video", "rgb_path": str(vid_dir),
                 "height": h, "width": w, "fps": 25,
                 "flow_model": "farneback"},
        "generation": {
            "guidance_scale": 2.0, "n_timesteps": steps, "chunk_size": 4,
            "chunk_ord": "mix-4",
            # BENCH_MERGE=off|local|full (default full) — merge ablation
            "local_merge_ratio":
                0.0 if os.environ.get("BENCH_MERGE") == "off" else 0.6,
            "merge_global":
                os.environ.get("BENCH_MERGE", "full") == "full",
            "global_merge_ratio": 0.5,
            "align_batch": True, "max_downsample": 2, "noise_mode": "same",
            # BENCH_ALPHA_T > 0 exercises the yt-plane multi-axis pass
            "alpha_t": float(os.environ.get("BENCH_ALPHA_T", 0.0)),
            # yt-pass chunk size (0 = auto; see Generator._yt_chunk_size)
            "chunk_size_t": int(os.environ.get("BENCH_CHUNK_T", 0)),
            # int8 QK attention (ops/attention.py pallas_int8): metric-
            # neutral (tools/eval_qk_int8.py) but toolchain-dependent
            # speed — eval-gated, off by default (PERF_NOTES round 5)
            "attn_qk_int8": bool(int(os.environ.get("BENCH_QK_INT8", "0"))),
            "attn_pv_int8": bool(int(os.environ.get("BENCH_PV_INT8", "0"))),
            "final_factor_t": 0.01, "win_size_t": 64,
            "prompt_t": "best quality", "negative_prompt_t": "jittery",
            "negative_prompt": "low quality", "save_frame": False,
            "fuse_loop": bool(os.environ.get("BENCH_FUSE")),
            # >1 fetches the per-step sync scalar every Nth step (deep
            # async queues degrade axon pathologically; small N is safe)
            "sync_every": int(os.environ.get("BENCH_SYNC_EVERY", 1)),
            "prompt": {"bench": "warm golden hour sunlight, photoreal"},
        },
        # Reference budgets are 35/70 epochs; each epoch at 960x720x30 costs
        # ~45 s on one v5e, so by default we run a calibration slice and
        # extrapolate linearly (epochs are homogeneous shuffled passes).
        # BENCH_FULL_OPT=1 runs the true budgets.
        "post_opt": {"apply_opt": not os.environ.get("BENCH_NO_OPT"),
                     "epochs_exposure": 35 if os.environ.get("BENCH_FULL_OPT") else 5,
                     "epochs": 70 if os.environ.get("BENCH_FULL_OPT") else 7,
                     "batch_size": 16, "lambda_dssim": 0.2, "lambda_flow": 0.8,
                     "lambda_tv": 0.05, "feature_lr": 0.05,
                     "exposure_lr_init": 0.01, "exposure_lr_final": 0.001,
                     "exposure_lr_delay_steps": 0,
                     "exposure_lr_delay_mult": 0.0,
                     "ms_ssim_levels": 5},
        "seed": 7,
    })
    parser = VideoDataParser(cfg.data)
    gen = Generator(models, cfg, data_parser=parser)

    t_setup = time.time() - t_start
    runs = int(os.environ.get("BENCH_RUNS", 2))
    t0 = time.time()
    run_totals = []
    try:
        for r in range(runs):
            t_run = time.time()
            gen(None, str(work / "out"), list(range(n)))
            run_totals.append(time.time() - t_run)
            log(f"[bench] run {r + 1}/{runs}: {run_totals[-1]:.1f}s "
                f"stages {getattr(gen, 'stage_times', {})}")
        total = run_totals[-1]
        stage = getattr(gen, "stage_times", {})
        suffix = ""
        if not os.environ.get("BENCH_FULL_OPT") and not os.environ.get("BENCH_NO_OPT"):
            # extrapolate to the reference budgets using the measured
            # STEADY-STATE epoch time (first epoch carries the jit compile,
            # which is paid once, not per epoch)
            def steady(times, measured_total, budget):
                if times and len(times) > 1:
                    per_epoch = float(np.median(times[1:]))
                else:
                    per_epoch = measured_total / max(len(times), 1)
                return per_epoch * (budget - len(times))

            total += steady(stage.get("exposure_epochs", []),
                            stage.get("exposure", 0.0), 35)
            total += steady(stage.get("uvt_epochs", []),
                            stage.get("uvt", 0.0), 70)
            suffix = "_postopt_extrapolated"
            if stage.get("uvt_failed"):
                suffix += "_noUVT"
        if runs > 1:
            suffix += "_steady"
        sec_per_frame = total / n
        log(f"[bench] setup {t_setup:.1f}s, stages {stage}, e2e {total:.1f}s "
            f"({sec_per_frame:.2f} s/frame{suffix})")
        payload = {
            "metric": f"e2e_sec_per_frame_{w}x{h}x{n}{suffix}",
            "value": round(sec_per_frame, 4),
            "unit": "s/frame",
            "vs_baseline": round(BASELINE_SEC_PER_FRAME / sec_per_frame, 3),
            # cold-vs-steady split (VERDICT r2 #9): run 1 pays jit compiles
            # + the tunnel's first-h2d-transfer stall; later runs are the
            # serving-path shape. Raw measured, no extrapolation.
            "cold_sec_per_frame": round(run_totals[0] / n, 4),
            "steady_sec_per_frame": (
                round(run_totals[-1] / n, 4) if runs > 1 else None
            ),
            "platform": platform,
            # tunnel-transfer accounting: the output fetch rides the axon
            # d2h link whose bandwidth varies ~10x between sessions
            # (measured 0.4-11 MB/s same-day); reporting it separately
            # lets readers subtract harness transport from framework cost
            "output_fetch_s": round(stage.get("output_fetch", 0.0), 2),
            "variants": load_variant_blocks(),
        }
        emit(payload)
        return 0
    except Exception as e:  # noqa: BLE001 — always emit a metric
        log(f"[bench] e2e failed ({type(e).__name__}: {e}); falling back to "
            f"measured UNet-step extrapolation")
        return fallback_step_metric(models, gen, n, h, w, steps)


def fallback_step_metric(models, gen, n, h, w, steps) -> int:
    """Direct measurement of the denoise chunk-step + extrapolation when
    the full pipeline cannot finish (e.g. OOM in a later stage). The
    extrapolated number excludes VAE/post-opt and is labeled as such."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tclight_tpu.pipeline.chunks import make_chunk_plan, n_chunk_slots

    factor = gen.vae_factor
    lh, lw = h // factor, w // factor
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, lh, lw, 4))
    cc = jax.random.normal(key, (n, lh, lw, 4)) if         models.unet.config.in_channels > 4 else jnp.zeros((n, lh, lw, 0))
    cond, uncond = gen.encode_prompt_pair("bench prompt", "bad")
    # the post-opt offload may have deleted/host-mirrored the UNet params
    # before the e2e failure; restore them for the direct step measurement
    if models.unet_params is None and getattr(models, "rebuild_params", None):
        models.unet_params = models.rebuild_params()
    elif models.unet_params is not None and isinstance(
        jax.tree.leaves(models.unet_params)[0], np.ndarray
    ):
        models.unet_params = jax.tree.map(jnp.asarray, models.unet_params)
    if gen._step_fn is None:
        gen._step_fn = gen._build_step_fn()
    rng = np.random.default_rng(0)
    plan = make_chunk_plan(n, gen.chunk_size, rng)
    slots = plan.indices.shape[0]
    randfs = jnp.asarray(rng.integers(0, 4, size=slots), jnp.int32)
    flips = jnp.asarray(rng.random(slots) <= gen.global_rand)
    args = (x, cc, (uncond, cond), jnp.asarray(500.0),
            jnp.asarray(plan.indices), jnp.asarray(plan.valid), randfs, flips)
    out = gen._step_fn(*args)
    float(jnp.sum(out))  # sync
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = gen._step_fn(*args)
        float(jnp.sum(out))
    step_time = (time.time() - t0) / reps
    sec_per_frame = step_time * steps / n
    log(f"[bench] denoise step {step_time:.2f}s -> extrapolated "
        f"{sec_per_frame:.2f} s/frame (sampling only)")
    emit({
        "metric": f"denoise_sec_per_frame_{w}x{h}x{n}_extrapolated",
        "value": round(sec_per_frame, 4),
        "unit": "s/frame",
        "vs_baseline": round(BASELINE_SEC_PER_FRAME / max(sec_per_frame, 1e-9), 3),
        "variants": load_variant_blocks(),
    })
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # noqa: BLE001 — the driver must always get JSON
        import traceback

        traceback.print_exc(file=sys.stderr)
        emit({
            "metric": "bench_failed",
            "value": 0.0,
            "unit": "s/frame",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
            "variants": load_variant_blocks(),
        })
        sys.exit(0)
