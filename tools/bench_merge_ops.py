"""Micro-bench the ToMe merge machinery at flagship (960x720, chunk 4)
shapes: the score matmul, the node argsort, and the merge/unmerge
gather/scatter chains. These are the ~110 ms/slot residual between the
measured xy step and its attention+conv roofline (docs/PERF_NOTES.md
round 3); this harness gives each op's isolated XLA floor on the v5e.

Also measures candidate replacements:
- one-key u64 packed sort vs variadic (key, iota) argsort
- merge gathers via one fused take vs the current 3-gather chain
"""

from __future__ import annotations

import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(fn, *args, n=20):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # sync
    t0 = time.time()
    for _i in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / n


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> int:
    rng = np.random.default_rng(0)
    B, C = 2, 320
    T = 10800           # tokens/frame at 960x720 level 0
    S, D = 3 * T, T     # level-0 src/dst
    r = int(S * 0.6)
    L = (S - r) + D     # merged length ~ 23760

    x = jnp.asarray(rng.standard_normal((B, 4 * T, C)), jnp.bfloat16)
    node_max = jnp.asarray(rng.standard_normal(L), jnp.float32)

    # --- argsort variants on an L-length node_max -------------------------
    argsort = jax.jit(lambda v: jnp.argsort(-v))
    t = timeit(argsort, node_max)
    print(f"argsort(-x) L={L}: {t*1e3:7.2f} ms")

    def packed(v):
        # order-preserving f32->u32 (flip sign bit for positives, all bits
        # for negatives), descending via complement; index in low 32 bits
        u = jax.lax.bitcast_convert_type(v, jnp.uint32)
        u = jnp.where(v >= 0, u | jnp.uint32(0x80000000), ~u)
        key = (~u).astype(jnp.uint64) << 32 | jnp.arange(
            v.shape[0], dtype=jnp.uint64)
        return (jax.lax.sort(key) & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)

    packed_j = jax.jit(packed)
    t = timeit(packed_j, node_max)
    print(f"packed u64 sort L={L}: {t*1e3:7.2f} ms")
    a = np.asarray(argsort(node_max))
    b = np.asarray(packed_j(node_max))
    ok = (np.asarray(node_max)[a] == np.asarray(node_max)[b]).all()
    print(f"  same sorted values: {ok}; same perm: {(a == b).all()}")

    # --- score matmul (level-0 matcher) -----------------------------------
    a_m = jnp.asarray(rng.standard_normal((B, S, C)), jnp.bfloat16)
    b_m = jnp.asarray(rng.standard_normal((B, D, C)), jnp.bfloat16)
    scores = jax.jit(lambda a, b: jnp.einsum(
        "bsc,bdc->bsd", a, b, preferred_element_type=jnp.float32))
    t = timeit(scores, a_m, b_m)
    print(f"scores einsum (B{B} {S}x{C}x{D}): {t*1e3:7.2f} ms "
          f"({2*B*S*C*D/t/1e12:.1f} TFLOP/s)")

    # --- merge gathers -----------------------------------------------------
    a_idx = jnp.asarray(rng.permutation(4 * T)[:S].astype(np.int32))
    b_idx = jnp.asarray(rng.permutation(4 * T)[:D].astype(np.int32))
    unm_idx = jnp.asarray(rng.permutation(S)[: S - r].astype(np.int32))[None]

    def merge_3gather(x):
        src = x[:, a_idx]
        dst = x[:, b_idx]
        unm = jnp.take_along_axis(
            src, jnp.broadcast_to(unm_idx, (B, S - r))[..., None], axis=1)
        return jnp.concatenate([unm, dst], axis=1)

    t = timeit(jax.jit(merge_3gather), x)
    print(f"merge 3-gather chain: {t*1e3:7.2f} ms")

    def merge_fused(x):
        # single composed index: unm positions = a_idx[unm_idx]
        comp = jnp.concatenate([a_idx[unm_idx[0]], b_idx])
        return x[:, comp]

    t = timeit(jax.jit(merge_fused), x)
    o1 = np.asarray(jax.jit(merge_3gather)(x))
    o2 = np.asarray(jax.jit(merge_fused)(x))
    print(f"merge fused 1-gather: {t*1e3:7.2f} ms  equal={np.array_equal(o1, o2)}")

    # --- unmerge scatter chain --------------------------------------------
    y = jnp.asarray(rng.standard_normal((B, L, C)), jnp.bfloat16)
    dst_idx = jnp.asarray(rng.integers(0, D, (1, r)).astype(np.int32))
    src_idx = jnp.asarray(rng.permutation(S)[:r].astype(np.int32))[None]

    def unmerge(y):
        n_unm = S - r
        unm, dst = y[:, :n_unm], y[:, n_unm:]
        src_restored = jnp.take_along_axis(
            dst, jnp.broadcast_to(dst_idx, (B, r))[..., None], axis=1)
        unm_pos = a_idx[jnp.broadcast_to(unm_idx, (B, n_unm))]
        src_pos = a_idx[jnp.broadcast_to(src_idx, (B, r))]

        def _one(dst_i, unm_i, src_i, unm_pos_i, src_pos_i):
            out = jnp.zeros((4 * T, C), dtype=y.dtype)
            out = out.at[b_idx].set(dst_i)
            out = out.at[unm_pos_i].set(unm_i)
            out = out.at[src_pos_i].set(src_i)
            return out

        return jax.vmap(_one)(dst, unm, src_restored, unm_pos, src_pos)

    t = timeit(jax.jit(unmerge), y)
    print(f"unmerge scatter chain: {t*1e3:7.2f} ms")

    def unmerge_gather(y):
        # scatter -> gather inversion: build one composed gather index
        # mapping every original position to its slot in [unm | dst]
        n_unm = S - r
        pos_to_slot = jnp.zeros((4 * T,), jnp.int32)
        pos_to_slot = pos_to_slot.at[b_idx].set(n_unm + jnp.arange(D))
        unm_pos = a_idx[unm_idx[0]]
        pos_to_slot = pos_to_slot.at[unm_pos].set(jnp.arange(n_unm))
        src_pos = a_idx[src_idx[0]]
        pos_to_slot = pos_to_slot.at[src_pos].set(n_unm + dst_idx[0])
        return y[:, pos_to_slot]

    t = timeit(jax.jit(unmerge_gather), y)
    o1 = np.asarray(jax.jit(unmerge)(y))
    o2 = np.asarray(jax.jit(unmerge_gather)(y))
    print(f"unmerge composed gather: {t*1e3:7.2f} ms  "
          f"equal={np.array_equal(o1, o2)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
