"""TPU stress: UVT planner acceptance + epoch cost on a TURNOVER-HEAVY
long video (VERDICT r4 #3).

The banded-UVT precondition was only demonstrated on the rolling-texture
workload, whose churn is edge-birth only. Real footage adds (a) occlusion
boundaries — a foreground object with its own motion killing background
tracks and forcing disocclusion REBIRTH in the middle of the frame, (b)
tracker churn — random track restarts anywhere. This synthetic has both:

- background: horizontal roll (2 px/frame), edge birth like the flagship
  long-video bench;
- foreground: an orbiting box (vertical amplitude `A` px) carrying its own
  persistent track set. At any frame its ids sit ~A rows away (in flat
  position) from where their MEAN position ranks them, so after kinematic
  relabeling the box blocks mix two+ far-apart id bands — exactly the
  multi-band structure that rejects a single-window plan (PERF_NOTES
  round 3) and exercises the K-window planner;
- disocclusion: background uncovered by the box gets NEW tracks;
- churn: `churn_frac` of pixels per frame restart as new tracks anywhere.

Reports the production planner decision (via build_uvt_tables' table
arity/shape) and measured run_uvt epoch walls. `--csr` forces the
sorted-CSR fallback for a cost comparison on identical ids.
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))
import argparse
import logging
import time

import numpy as np
import jax.numpy as jnp

from tclight_tpu.pipeline import postopt as po
from tclight_tpu.utils.logging import get_logger


def make_turnover_ids(n, h, w, shift=2, box_h=180, box_w=320, amp=150,
                      period=100, churn_frac=0.01, seed=0):
    """Returns (ids (n, h*w) int32, n_unique, box_rects (n, 2) int32 of
    per-frame (y0, x0) box corners)."""
    rng = np.random.default_rng(seed)
    bg = np.arange(h * w, dtype=np.int32).reshape(h, w)
    next_id = h * w
    fg = None
    prev_box = np.zeros((h, w), bool)
    ids = np.empty((n, h * w), np.int32)
    rects = np.empty((n, 2), np.int32)
    cx0, cy0 = w // 2, h // 2
    for t in range(n):
        if t:
            # background rolls right; left edge is born
            bg[:, shift:] = bg[:, :-shift]
            bg[:, :shift] = np.arange(
                h * shift, dtype=np.int32).reshape(h, shift) + next_id
            next_id += h * shift
            # random tracker churn anywhere
            k = int(churn_frac * h * w)
            if k:
                pos = rng.integers(0, h * w, size=k)
                bg.reshape(-1)[pos] = np.arange(k, dtype=np.int32) + next_id
                next_id += k
        # orbiting foreground box
        cy = int(cy0 + amp * np.sin(2 * np.pi * t / period))
        cx = int(cx0 + 0.6 * amp * np.cos(2 * np.pi * t / period))
        y0 = np.clip(cy - box_h // 2, 0, h - box_h)
        x0 = np.clip(cx - box_w // 2, 0, w - box_w)
        box = np.zeros((h, w), bool)
        box[y0:y0 + box_h, x0:x0 + box_w] = True
        if fg is None:
            fg = np.arange(box_h * box_w, dtype=np.int32) + next_id
            next_id += box_h * box_w
        # disocclusion: background uncovered this frame is REBORN
        uncovered = prev_box & ~box
        n_unc = int(uncovered.sum())
        if n_unc:
            bg[uncovered] = np.arange(n_unc, dtype=np.int32) + next_id
            next_id += n_unc
        frame = bg.copy()
        frame[box] = fg.reshape(box_h, box_w).reshape(-1)
        ids[t] = frame.reshape(-1)
        rects[t] = (y0, x0)
        prev_box = box
    return ids, int(next_id), rects


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--churn", type=float, default=0.01)
    ap.add_argument("--amp", type=int, default=150)
    ap.add_argument("--csr", action="store_true",
                    help="force the sorted-CSR fallback for comparison")
    ap.add_argument("--plan-only", action="store_true",
                    help="planner acceptance only (no TPU epochs)")
    args = ap.parse_args()
    n, h, w, shift = args.frames, 720, 1280, 2
    hw = h * w
    logging.basicConfig(level=logging.INFO)

    t0 = time.time()
    ids, n_unique, rects = make_turnover_ids(
        n, h, w, shift=shift, churn_frac=args.churn, amp=args.amp)
    per_frame_new = np.array(
        [len(np.setdiff1d(ids[t], ids[t - 1], assume_unique=False))
         for t in range(1, min(n, 12))])
    print(f"ids built in {time.time()-t0:.1f}s: {n_unique/1e6:.2f}M tracks, "
          f"~{per_frame_new.mean()/hw*100:.2f}%/frame new-track churn",
          flush=True)

    if args.plan_only:
        p_pad = max(128, int(np.ceil(n_unique / 128)) * 128)
        tables, _ = po.build_uvt_tables(
            ids.reshape(-1), n, h, w, p_pad, allow_banded=True)
        kind = {10: "banded", 4: "dense", 3: "sorted-CSR"}[len(tables)]
        nwin = tables[1].shape[-1] if len(tables) == 10 and \
            tables[1].ndim == 3 else 1
        print(f"planner decision: {kind}"
              + (f" ({nwin} window(s)/block, overflow fwd "
                 f"{tables[3].shape[1]} + merged bwd {tables[8].shape[1]} "
                 f"cols)" if len(tables) == 10 else ""), flush=True)
        return

    rng = np.random.default_rng(0)
    base = rng.uniform(0.15, 0.85, (h, w, 3)).astype(np.float32)

    # Device-side data synthesis: the axon tunnel moves ~10-25 MB/s, so a
    # naive host upload of frames+flows+masks (~1.9 GB at 300x720x1280)
    # costs tens of minutes. Upload ONE base frame (2.6 MB) + the (n, 2)
    # box corners and build everything on device.
    import jax

    base_d = jnp.asarray(base)
    rects_d = jnp.asarray(rects)
    box_h, box_w = 180, 320

    @jax.jit
    def synth():
        col = jnp.arange(w)

        def one_frame(t):
            # == np.roll(base, shift*t, axis=1)
            return base_d[:, (col - shift * t) % w, :]

        frames = jax.vmap(one_frame)(jnp.arange(n))
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]

        def one_mask(r):
            box = ((yy >= r[0]) & (yy < r[0] + box_h)
                   & (xx >= r[1]) & (xx < r[1] + box_w))
            return (~box)[..., None].astype(jnp.float16)

        masks = jax.vmap(one_mask)(rects_d)  # occluded: no flow loss
        flows = jnp.concatenate(
            [jnp.full((n, h, w, 1), -shift, jnp.float16),
             jnp.zeros((n, h, w, 1), jnp.float16)], axis=-1)
        return frames, flows, masks

    frames, flows, masks = synth()
    flow_host = np.array([[-shift, 0.0]], np.float32)  # for flow_radius

    cfg = po.PostOptConfig(epochs=args.epochs, batch_size=16)
    if args.csr:
        po._UVT_TABLE_CACHE.clear()
        orig = po.build_uvt_tables

        def no_banded(unq_inv, n_, h_, w_, p_pad, allow_banded=None):
            return orig(unq_inv, n_, h_, w_, p_pad, allow_banded=False)

        po.build_uvt_tables = no_banded
    t0 = time.time()
    rendered, hist, times = po.run_uvt(
        frames, flows, masks,
        ids.reshape(-1), n_unique, cfg,
        warp_radius=po.flow_radius(flow_host))
    print(f"total {time.time()-t0:.1f}s  epoch walls: "
          f"{np.round(np.asarray(times), 2)}", flush=True)
    print(f"steady uvt_epoch_s: {float(times[-1]):.2f}", flush=True)
    print("loss head/tail:", hist[:2], hist[-2:], flush=True)


if __name__ == "__main__":
    main()
