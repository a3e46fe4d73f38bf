"""TPU measurement: REAL run_uvt epochs at long-video scale (300x1280x720,
rolling-texture ids matching bench.py's synthetic workload) — exercises the
kinematic-relabel + banded-gather path end-to-end inside the production
epoch scan, reporting per-epoch wall seconds."""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root (tools run as scripts)
import sys
import time

import numpy as np
import jax.numpy as jnp

from tclight_tpu.pipeline import postopt as po

n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
h, w, shift = 720, 1280, 2
hw = h * w

grid = np.arange(hw, dtype=np.int32).reshape(h, w)
ids = np.empty((n, hw), np.int32)
ids[0] = grid.reshape(-1)
cur = grid
nid = hw
for t in range(1, n):
    g = np.empty_like(cur)
    g[:, shift:] = cur[:, :-shift]
    g[:, :shift] = (np.arange(h * shift, dtype=np.int32)
                    .reshape(h, shift) + nid)
    nid += h * shift
    ids[t] = g.reshape(-1)
    cur = g
n_unique = int(ids.max()) + 1
print(f"n={n} {w}x{h} tracks={n_unique}", flush=True)

rng = np.random.default_rng(0)
base = rng.uniform(0.15, 0.85, (h, w, 3)).astype(np.float32)
frames = np.stack([np.roll(base, shift * t, axis=1) for t in range(n)])
flows = np.zeros((n, h, w, 2), np.float16)
flows[..., 0] = -shift
masks = np.ones((n, h, w, 1), np.float16)

cfg = po.PostOptConfig(epochs=epochs, batch_size=16)
t0 = time.time()
rendered, hist, times = po.run_uvt(
    jnp.asarray(frames), jnp.asarray(flows), jnp.asarray(masks),
    ids.reshape(-1), n_unique, cfg,
    warp_radius=po.flow_radius(flows))
print(f"total {time.time()-t0:.1f}s  epoch walls: "
      f"{np.round(np.asarray(times), 2)}", flush=True)
print(f"steady uvt_epoch_s: {float(times[-1]):.2f}", flush=True)
print("loss head/tail:", hist[:2], hist[-2:], flush=True)
