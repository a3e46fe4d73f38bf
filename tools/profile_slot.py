"""On-TPU decomposition of ONE flagship bank-slot UNet apply (the unit the
xy sampling step runs 8x per step at 960x720x30, generator.py::_group_core).

Times the full apply plus ablations that zero out one term at a time:

  full        — banks-carrying chunk slot, cfg_dedup, flagship ToMeSpec
  no-attn     — every attention core replaced by identity (out = v):
                isolates the MXU attention term (QK^T + PV + projections
                stay for proj variant; here q/k/v/proj linears REMAIN, so
                the delta is the flash/dot kernels only)
  no-merge    — ToMe disabled (tome_spec=None): isolates merge-plan
                machinery (matchers, argsorts, gathers) + the token-count
                reduction it buys back in attention
  dot-xla     — flash kernels swapped for the XLA online-softmax path

Compile is per-variant (~2-4 min each on the tunneled toolchain); run
time ~seconds. Use after step-level changes to re-attribute the slot
budget before picking the next kernel target.

Usage: python tools/profile_slot.py [--chunk 4] [--h 720] [--w 960]
"""

from __future__ import annotations

import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse

import numpy as np


def _timeit(fn, *args, n=8):
    out = fn(*args)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[:1]
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[:1]
    return (time.perf_counter() - t0) / n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--variants", default="full,no-attn,no-merge")
    ap.add_argument("--trace", default="",
                    help="jax.profiler trace logdir for the LAST variant's "
                         "steady calls (parse with tools/parse_xplane.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tclight_tpu.models.unet import ToMeSpec, UNet2DCondition, UNetConfig

    print(f"backend: {jax.default_backend()}")
    lat_h, lat_w = args.h // 8, args.w // 8
    cs = args.chunk
    cfg = UNetConfig.sd15(in_channels=8)
    spec = ToMeSpec(n_frames=cs, local_ratio=0.6, merge_global=True,
                    global_ratio=0.5, align_batch=True, max_downsample=2)

    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.standard_normal((cs, lat_h, lat_w, 8)),
                      jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((2 * cs, 77, cfg.context_dim)),
                      jnp.bfloat16)
    t = jnp.asarray(500.0)
    randf = jnp.int32(1)
    flip = jnp.bool_(False)

    def build(tome, attn_identity=False, backend=None):
        import tclight_tpu.models.unet as unet_mod

        model = UNet2DCondition(cfg, tome_spec=tome)
        if backend is not None:
            # route every attention core through the requested backend
            orig_flash = unet_mod.flash_attention
            unet_mod.flash_attention = (
                lambda q, k, v, **kw: orig_flash(q, k, v, backend=backend))
        if attn_identity:
            # identity must be q-shaped (cross-attention has skv=77 != sq)
            unet_mod.flash_attention = lambda q, k, v, **kw: q
            unet_mod.dot_product_attention = lambda q, k, v, **kw: q
        key = jax.random.PRNGKey(0)
        # init with the plain duplicated CFG batch (the dedup apply shares
        # the same params; see tests/test_models.py::test_unet_cfg_dedup_exact)
        full = jnp.concatenate([inp, inp], axis=0)
        params = jax.jit(model.init)(key, full, t, ctx)
        return model, params

    def reset():
        import importlib

        import tclight_tpu.models.unet as unet_mod

        importlib.reload(unet_mod)

    results = {}
    for variant in args.variants.split(","):
        reset()
        if variant == "full":
            model, params = build(spec)
        elif variant == "no-attn":
            model, params = build(spec, attn_identity=True)
        elif variant == "no-merge":
            model, params = build(None)
        elif variant == "match-kernel":
            # force the fused matmul+argmax matcher at pipeline B=2 shapes
            # (gated off by _KERNEL_MATCH_MIN_ELEMS from an ISOLATED
            # measurement that carried wrapper layout transposes)
            import tclight_tpu.ops.tome as tome_mod

            tome_mod._KERNEL_MATCH_MIN_ELEMS = 0
            from tclight_tpu.utils import device as dev_mod

            dev_mod.set_compute_platform("tpu")
            model, params = build(spec)
        elif variant == "dot-xla":
            model, params = build(spec, backend="xla")
        else:
            raise SystemExit(f"unknown variant {variant}")

        # slot 0 builds banks; the timed call is the bank-carrying slot
        fn0 = jax.jit(lambda p, x: model.apply(
            p, x, t, ctx, randf=randf, flip=flip, use_global=False,
            cfg_dedup=True))
        fn1 = jax.jit(lambda p, x, b: model.apply(
            p, x, t, ctx, randf=randf, flip=flip, banks=b, use_global=True,
            cfg_dedup=True))
        if variant == "no-merge":
            # no ToMe -> no global banks to carry; time the plain slot
            t0 = time.perf_counter()
            out, _ = fn0(params, inp)
            _ = np.asarray(out).ravel()[:1]
            print(f"[{variant}] slot compile+run {time.perf_counter()-t0:.1f}s")
            dt = _timeit(lambda: fn0(params, inp))
            results[variant] = dt
            print(f"[{variant}] slot steady {dt*1e3:.1f} ms")
            continue
        t0 = time.perf_counter()
        _, banks = fn0(params, inp)
        jax.block_until_ready(banks)
        print(f"[{variant}] slot0 compile+run {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        out, _ = fn1(params, inp, banks)
        _ = np.asarray(out).ravel()[:1]
        print(f"[{variant}] bank-slot compile+run {time.perf_counter()-t0:.1f}s")
        dt = _timeit(lambda: fn1(params, inp, banks))
        results[variant] = dt
        print(f"[{variant}] bank-slot steady {dt*1e3:.1f} ms")
        if args.trace:
            with jax.profiler.trace(args.trace):
                for _i in range(3):
                    out, _ = fn1(params, inp, banks)
                _ = np.asarray(out).ravel()[:1]
            print(f"[{variant}] trace written to {args.trace}")

    if "full" in results:
        base = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"delta full - {k}: {1e3*(base - v):.1f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
