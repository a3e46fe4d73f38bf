"""Evaluation metrics.

Rebuilds utils/evaluation/eval_utils.py:
- `warp_error_ssim` = SaveWarpingImage (:300-366): warp edited frame t to
  t+1 along backward flow computed on the *source* video, mask by fwd/bwd
  consistency, SSIM between masked warped/next frames. The reference uses
  skimage structural_similarity (uniform 7x7 window, uint8 data range); we
  implement that exact SSIM variant (`ssim_uniform`).
- `clip_frame_score` (:146-161): mean pairwise off-diagonal cosine of CLIP
  image embeddings.
- `clip_text_score` (:129-144): mean image-text cosine.
- `pick_score` (:163-176): PickScore (CLIP-H fine-tune) logit-scaled
  text-image similarity.

The CLIP-based metrics need local checkpoints (zero-egress environment);
they accept an `embed_fn` so any CLIP tower (ours via
models/clip_vision.py, or an HF torch model) plugs in.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.ops.flow import compute_fwdbwd_mask, warp_flow

__all__ = [
    "ssim_uniform",
    "warp_error_ssim",
    "clip_frame_score",
    "clip_text_score",
    "pick_score",
]


def ssim_uniform(a: np.ndarray, b: np.ndarray, win: int = 7,
                 data_range: float = 255.0) -> float:
    """skimage.metrics.structural_similarity defaults: uniform win x win
    filter, per-channel mean, sample (ddof=1) covariances, Gaussian off."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]

    pad = win // 2
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    n = win * win
    cov_norm = n / (n - 1)

    def filt(x):
        # uniform filter via cumulative sums, 'valid' region only
        from scipy.ndimage import uniform_filter

        return uniform_filter(x, size=win)

    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        ux, uy = filt(x), filt(y)
        uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2)
        )
        vals.append(s[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def warp_error_ssim(
    edited: np.ndarray,          # (N, H, W, 3) float [0,1] edited frames
    source: np.ndarray,          # (N, H, W, 3) float [0,1] source frames
    flow_fn: Callable[[np.ndarray, np.ndarray], np.ndarray] | None = None,
    flow_fwd: np.ndarray | None = None,
    flow_bwd: np.ndarray | None = None,
) -> float:
    """SaveWarpingImage parity: flows from the SOURCE video, SSIM on the
    EDITED video. flow_fn(a, b) -> flow mapping a->b when flows not given."""
    n = edited.shape[0]
    if flow_fwd is None or flow_bwd is None:
        assert flow_fn is not None, "need flow_fn or precomputed flows"
        flow_fwd = np.stack(
            [flow_fn(source[i], source[i + 1]) for i in range(n - 1)]
        )
        flow_bwd = np.stack(
            [flow_fn(source[i + 1], source[i]) for i in range(n - 1)]
        )
    scores = []
    for i in range(n - 1):
        ff = jnp.asarray(flow_fwd[i][None])
        fb = jnp.asarray(flow_bwd[i][None])
        _, mask_bwd = compute_fwdbwd_mask(ff, fb)
        mask = np.asarray(mask_bwd)[0][..., None]
        warped = np.asarray(
            warp_flow(jnp.asarray(edited[i][None]), fb, mode="bilinear")
        )[0]
        cur = np.where(mask, warped, 0.0)
        nxt = np.where(mask, edited[i + 1], 0.0)
        scores.append(
            ssim_uniform(
                np.uint8(np.clip(cur, 0, 1) * 255.0),
                np.uint8(np.clip(nxt, 0, 1) * 255.0),
            )
        )
    return float(np.mean(scores))


def clip_frame_score(image_embs: np.ndarray) -> float:
    """Mean pairwise off-diagonal cosine similarity of frame embeddings."""
    e = image_embs / np.linalg.norm(image_embs, axis=-1, keepdims=True)
    sim = e @ e.T
    np.fill_diagonal(sim, 0.0)
    n = len(e)
    return float(sim.sum() / (n * (n - 1)))


def clip_text_score(image_embs: np.ndarray, text_emb: np.ndarray) -> float:
    ie = image_embs / np.linalg.norm(image_embs, axis=-1, keepdims=True)
    te = text_emb / np.linalg.norm(text_emb)
    return float((ie @ te).mean())


def pick_score(image_embs: np.ndarray, text_emb: np.ndarray,
               logit_scale: float = 100.0) -> float:
    ie = image_embs / np.linalg.norm(image_embs, axis=-1, keepdims=True)
    te = text_emb / np.linalg.norm(text_emb)
    return float((logit_scale * (te @ ie.T)).mean())
