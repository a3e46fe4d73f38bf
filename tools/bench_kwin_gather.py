"""TPU micro-bench: K-window + kinematic-relabel banded UVT gather vs
sorted-CSR at long-video scale (1280x720 frames, multi-generation ids)."""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root (tools run as scripts)
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from tclight_tpu.pipeline import postopt as po
from tclight_tpu.ops import banded_gather as bg

rng = np.random.default_rng(0)
h, w = 720, 1280
hw = h * w


def rolling_ids(n, shift):
    nid = hw
    grid = np.arange(hw, dtype=np.int32).reshape(h, w)
    out = np.empty((n, hw), np.int32)
    out[0] = grid.reshape(-1)
    cur = grid
    for t in range(1, n):
        g = np.empty_like(cur)
        g[:, shift:] = cur[:, :-shift]
        g[:, :shift] = (np.arange(h * shift, dtype=np.int32)
                        .reshape(h, shift) + nid)
        nid += h * shift
        out[t] = g.reshape(-1)
        cur = g
    return out


def bench_tables(tb, ts, p_pad, label, feats_b, feats_s, check=True):
    idx = jnp.asarray(np.arange(16))
    cot = jnp.asarray(rng.standard_normal((16, hw, 3)), jnp.float32)

    def run(tables, feats, name):
        # tables as jit ARGUMENTS (closing over them inlines the multi-GB
        # plans as HLO constants -> remote_compile HTTP 413)
        f = jax.jit(lambda ft, tb: po.uvt_gather(ft, tb, idx, hw=hw))
        fwd = f(feats, tables)
        fwd.block_until_ready()
        t0 = time.time()
        for _ in range(5):
            fwd = f(feats, tables)
        fwd.block_until_ready()
        t_fwd = (time.time() - t0) / 5

        def loss(ft, tb):
            return jnp.vdot(po.uvt_gather(ft, tb, idx, hw=hw), cot)

        g = jax.jit(jax.grad(loss))
        adj = g(feats, tables)
        adj.block_until_ready()
        t0 = time.time()
        for _ in range(5):
            adj = g(feats, tables)
        adj.block_until_ready()
        t_vjp = (time.time() - t0) / 5
        print(f"[{label}] {name}: fwd {t_fwd*1e3:.1f} ms  "
              f"grad {t_vjp*1e3:.1f} ms", flush=True)
        return np.asarray(fwd), np.asarray(adj)

    fb, gb = run(tb, feats_b, "banded")
    fs, gs = run(ts, feats_s, "sorted-CSR")
    if check:
        np.testing.assert_array_equal(fb, fs)
        print(f"[{label}] fwd exact vs CSR", flush=True)
    return gb, gs


def sorted_tables(ids):
    perm_np = np.argsort(ids, axis=1, kind="stable").astype(np.int32)
    ids_sorted_np = np.take_along_axis(ids, perm_np, axis=1)
    return (jnp.asarray(ids), jnp.asarray(perm_np),
            jnp.asarray(ids_sorted_np))


scen = sys.argv[1] if len(sys.argv) > 1 else "roll"

if scen == "roll":
    # the long-video bench structure: creation-order ramps
    # (n=300 shift=4 ~= the real 300x1280x720 run's 1.78M tracks)
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    shift = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    ids = rolling_ids(n, shift)
    p_pad = -(-int(ids.max() + 1) // 128) * 128
    print("roll: p_pad", p_pad, "n", n, flush=True)
    t0 = time.time()
    tb, inv_b = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                    allow_banded=True)
    print("build (incl relabel+plan):", f"{time.time()-t0:.1f}s",
          "layout", len(tb),
          "K", tb[1].shape[-1] if tb[1].ndim == 3 else 1, flush=True)
    assert len(tb) == 10, "banded did not activate"
    ts = sorted_tables(ids)
    feats_s = jnp.asarray(rng.standard_normal((p_pad, 3)), jnp.float32)
    # map features into the relabeled numbering through the pixel corresp.
    perm = np.full(p_pad, -1, np.int64)
    perm[ids.reshape(-1)] = inv_b.reshape(-1)
    used = perm >= 0
    fb_np = np.zeros((p_pad, 3), np.float32)
    fb_np[perm[used]] = np.asarray(feats_s)[used]
    gb, gs = bench_tables(tb, ts, p_pad, "roll", jnp.asarray(fb_np),
                          feats_s, check=False)
    err = np.abs(gb[perm[used]] - gs[used]).max()
    print("roll grad max|diff| (relabel-mapped):", err, flush=True)
else:
    # spatially-coherent multi-band generations (real-footage pattern)
    n, bands = 32, 4
    base = np.arange(hw, dtype=np.int32)
    ids = np.empty((n, hw), np.int32)
    gen_size = 60_000
    for t in range(n):
        ids[t] = np.roll(base, -37 * t)
        for g in range(1, bands):
            m = np.zeros(hw, bool)
            start = (g * 147_000 + t * 9_000) % (hw - 220_000)
            m[start:start + 200_000:3] = True
            k = int(m.sum())
            ids[t, m] = (hw + g * 260_000 + t * gen_size
                         + np.arange(k, dtype=np.int32) % gen_size)
        out = rng.integers(0, hw, hw // 64)
        ids[t, out] = rng.integers(hw, hw + 900_000,
                                   hw // 64).astype(np.int32)
    p_pad = -(-int(ids.max() + 1) // 128) * 128
    print("bands: p_pad", p_pad, "n", n, flush=True)
    t0 = time.time()
    tb, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=True)
    print("build:", f"{time.time()-t0:.1f}s", "layout", len(tb),
          "K", tb[1].shape[-1] if tb[1].ndim == 3 else 1, flush=True)
    assert len(tb) == 10
    ts = sorted_tables(ids)
    feats = jnp.asarray(rng.standard_normal((p_pad, 3)), jnp.float32)
    gb, gs = bench_tables(tb, ts, p_pad, "bands", feats, feats)
    print("bands grad max|diff|:", np.abs(gb - gs).max(), flush=True)
print("OK", flush=True)
