"""Isolated TPU timing of the flash-attention kernels at the flagship
ToMe level-0 shape: exact bf16 QK vs the eval-gated int8 QK path
(ops/attention.py backend='pallas_int8'), reporting per-call wall time
and the int8 path's output error vs the exact kernel.

Usage: python tools/bench_attn_int8.py [sq] [heads] [batch]
"""

from __future__ import annotations

import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    argv = _sys.argv[1:]
    # level-0 ToMe shape on the 960x720 flagship: joined chunk of 4 frames
    # merged at lmr 0.6 -> ~35.6k tokens; CFG-dedup batch 2; 8 heads of 40
    sq = int(argv[0]) if argv else 35640
    h = int(argv[1]) if len(argv) > 1 else 8
    b = int(argv[2]) if len(argv) > 2 else 2

    import jax
    import jax.numpy as jnp

    from tclight_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    d = 40
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sq, h, d)) + 0.7, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)

    def timeit(fn, n=20):
        out = fn()
        _ = np.asarray(out).ravel()[:1]  # force full sync through the tunnel
        t0 = time.perf_counter()
        for _i in range(n):
            out = fn()
        _ = np.asarray(out).ravel()[:1]
        return (time.perf_counter() - t0) / n, out

    f_exact = jax.jit(lambda: flash_attention(q, k, v, backend="pallas"))
    f_int8 = jax.jit(lambda: flash_attention(q, k, v, backend="pallas_int8"))

    f_int8pv = jax.jit(
        lambda: flash_attention(q, k, v, backend="pallas_int8pv"))

    print("compiling/timing exact...", flush=True)
    t_exact, o_exact = timeit(f_exact)
    print(f"pallas bf16 : {t_exact*1e3:8.2f} ms/call", flush=True)
    print("compiling/timing int8...", flush=True)
    t_int8, o_int8 = timeit(f_int8)
    print("compiling/timing int8+pv...", flush=True)
    t_pv, o_pv = timeit(f_int8pv)
    ref = np.asarray(o_exact, np.float32)
    denom = np.abs(ref).max()
    err = np.abs(np.asarray(o_int8, np.float32) - ref)
    err_pv = np.abs(np.asarray(o_pv, np.float32) - ref)
    print(f"shape b={b} sq={sq} h={h} d={d}")
    print(f"pallas bf16    : {t_exact*1e3:8.2f} ms/call")
    print(f"pallas int8 QK : {t_int8*1e3:8.2f} ms/call  "
          f"({t_exact/t_int8:.2f}x)  max_rel_err={err.max()/denom:.2e}")
    print(f"pallas int8 QKPV: {t_pv*1e3:7.2f} ms/call  "
          f"({t_exact/t_pv:.2f}x)  max_rel_err={err_pv.max()/denom:.2e}")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
