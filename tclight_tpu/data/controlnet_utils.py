"""ControlNet conditioning preprocessors.

Rebuild of utils/VidToMe/controlnet_utils.py: the `CONTROLNET_DICT` model-id
registry (:17-25) and per-type control-image preprocessors (:29-94). The
reference delegates to the `controlnet_aux` package (HED/openpose/midas
networks); here:
- 'canny' and 'tile' are self-contained (cv2 / identity);
- the model-backed types take a `model_fn`, which the Generator wires
  from the checkpoint-gated Flax annotator ports when `annotator_ckpt`
  points at local weights: softedge/scribble -> models/hed.py,
  depth -> models/dpt.py, lineart/lineart_anime -> models/lineart.py,
  openpose -> models/openpose.py. Without a checkpoint a clear error is
  raised (zero-egress build: no weights are downloaded).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

CONTROLNET_DICT = {
    "tile": "lllyasviel/control_v11f1e_sd15_tile",
    "ip2p": "lllyasviel/control_v11e_sd15_ip2p",
    "openpose": "lllyasviel/control_v11p_sd15_openpose",
    "softedge": "lllyasviel/control_v11p_sd15_softedge",
    "depth": "lllyasviel/control_v11f1p_sd15_depth",
    "lineart_anime": "lllyasviel/control_v11p_sd15s2_lineart_anime",
    "lineart": "lllyasviel/control_v11p_sd15_lineart",
    "canny": "lllyasviel/control_v11p_sd15_canny",
}


def canny_preprocess(frames: np.ndarray, low: int = 100, high: int = 200) -> np.ndarray:
    import cv2

    outs = []
    for f in frames:
        edges = cv2.Canny((f * 255).astype(np.uint8), low, high)
        outs.append(np.stack([edges] * 3, -1).astype(np.float32) / 255.0)
    return np.stack(outs)


def tile_preprocess(frames: np.ndarray, resample_rate: float = 1.0) -> np.ndarray:
    """Down/up resample blur (controlnet_utils.py:47-50); identity at
    rate 1.0 (the reference default)."""
    if resample_rate == 1.0:
        return frames.copy()
    import cv2

    n, h, w, _ = frames.shape
    lo = (max(1, int(round(w * resample_rate))),
          max(1, int(round(h * resample_rate))))
    outs = []
    for f in frames:
        small = cv2.resize(f, lo, interpolation=cv2.INTER_LINEAR)
        outs.append(cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR))
    return np.stack(outs).astype(np.float32)


def ip2p_preprocess(frames: np.ndarray) -> np.ndarray:
    return frames.copy()


_MODEL_BACKED = ("openpose", "softedge", "depth", "lineart",
                 "lineart_anime")


def control_preprocess(
    frames: np.ndarray,
    control_type: str,
    model_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    **kw,
) -> np.ndarray:
    """frames (N, H, W, 3) [0,1] -> control images (N, H, W, 3) [0,1]."""
    if control_type == "none":
        raise ValueError("control_type 'none' has no preprocessing")
    if control_type == "canny":
        return canny_preprocess(frames, **kw)
    if control_type == "tile":
        return tile_preprocess(frames, **kw)
    if control_type == "ip2p":
        return ip2p_preprocess(frames)
    if control_type in _MODEL_BACKED:
        if model_fn is None:
            raise NotImplementedError(
                f"'{control_type}' preprocessing needs a local model; pass "
                f"model_fn (e.g. a MiDaS/HED port loaded from a checkpoint)"
            )
        return model_fn(frames)
    raise KeyError(f"unknown control type {control_type!r}; "
                   f"known: {sorted(CONTROLNET_DICT)}")
