"""Optical-flow backends for the data layer.

The reference lazily runs RAFT or MemFlow over frame pairs and caches
per-frame flow files next to the video (utils/dataparsers/
video_dataparser.py:63-156). Backends here:

- "raft": our JAX RAFT (tclight_tpu/models/raft.py) when a checkpoint is
  available;
- "memflow": the checkpoint-exact MemFlowNet GMA-SK2 streaming core
  (tclight_tpu/models/memflow_sk.py) with forward-interpolated warm
  starts, matching the reference's calc_flow (video_dataparser.py:141-156);
- "farneback": OpenCV dense flow — weight-free fallback so the full
  pipeline (including flow-linked UVT optimization) runs without any
  downloaded checkpoints.

All backends return flows in (N, H, W, 2) [dx, dy] convention.
"""

from __future__ import annotations

import numpy as np

__all__ = ["compute_flow_pairs", "available_backends"]


def _farneback_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    import cv2

    ga = cv2.cvtColor((a * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    gb = cv2.cvtColor((b * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    flow = cv2.calcOpticalFlowFarneback(
        ga, gb, None, pyr_scale=0.5, levels=4, winsize=21, iterations=3,
        poly_n=7, poly_sigma=1.5, flags=0,
    )
    return flow.astype(np.float32)


def compute_flow_pairs(
    frames: np.ndarray, direction: str = "future", backend: str = "farneback",
    raft=None,
) -> np.ndarray:
    """Flows between consecutive frames.

    direction "future": flow[i] maps frame i -> i+1 (last entry zeros).
    direction "past":   flow[i] maps frame i -> i-1 (first entry zeros).
    """
    n, h, w, _ = frames.shape
    flows = np.zeros((n, h, w, 2), np.float32)
    if backend == "raft":
        if raft is None:
            raise ValueError("raft backend requires a loaded RAFT model")
        pairs_a, pairs_b = [], []
        for i in range(n - 1):
            if direction == "future":
                pairs_a.append(frames[i]); pairs_b.append(frames[i + 1])
            else:
                pairs_a.append(frames[i + 1]); pairs_b.append(frames[i])
        preds = raft.batched_flow(np.stack(pairs_a), np.stack(pairs_b))
        if direction == "future":
            flows[: n - 1] = preds
        else:
            flows[1:] = preds
        return flows
    if backend == "memflow":
        if raft is None:
            raise ValueError(
                "memflow backend requires a loaded InferenceCoreSK "
                "(pass it via the dataparser's `raft` slot)"
            )
        core = raft
        core.reset()
        # streaming with warm start, like calc_flow (video_dataparser.py
        # :141-156): sequential over pairs in the chosen direction
        for i in range(n - 1):
            if direction == "future":
                flows[i] = core.step(frames[i], frames[i + 1])
            else:
                flows[i + 1] = core.step(frames[i + 1], frames[i])
        return flows
    if backend != "farneback":
        raise ValueError(f"unknown flow backend {backend}")
    for i in range(n - 1):
        if direction == "future":
            flows[i] = _farneback_pair(frames[i], frames[i + 1])
        else:
            flows[i + 1] = _farneback_pair(frames[i + 1], frames[i])
    return flows


def load_memflow_core(ckpt_path: str):
    """Load MemFlowNet_things.pth -> streaming InferenceCoreSK
    (eval_utils.py prepare_memflow_model:197-250 equivalent)."""
    import torch

    from tclight_tpu.models.memflow_sk import (
        InferenceCoreSK, MemFlowNetSK, MemFlowSKConfig, convert_memflow_params)

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    cfg = MemFlowSKConfig()
    params = convert_memflow_params(sd, cfg)
    return InferenceCoreSK(MemFlowNetSK(cfg), params)


def available_backends() -> list[str]:
    return ["farneback", "raft", "memflow"]
