"""RetinaFace (ResNet50) face detector in Flax + face pixelation.

Rebuild of the Cosmos face-blur guardrail
(cosmos1/models/guardrail/face_blur_filter/face_blur_filter.py:41-187,
retinaface_utils.py decode/NMS, blur_utils.pixelate_face), whose detector
is biubug6/Pytorch_Retinaface's `RetinaFace(cfg_re50, phase='test')`.

`convert_retinaface` consumes the Resnet50_Final.pth state dict, folding
every BatchNorm (eval mode) into its preceding conv. Priors/decode/NMS are
numpy ports of the reference utilities; parity is tested against a torch
replica of the published architecture (tests/test_guardrail_models.py).
"""

from __future__ import annotations

import dataclasses
import math
import re
from itertools import product
from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RetinaFaceConfig", "RetinaFace", "convert_retinaface", "prior_boxes",
    "decode_boxes", "nms", "filter_detected_boxes", "pixelate_face",
    "RetinaFaceDetector",
]

# detect.py constants mirrored by the Cosmos filter (face_blur_filter.py:35-38)
TOP_K = 5000
KEEP_TOP_K = 750
NMS_THRESHOLD = 0.4
VARIANCES = (0.1, 0.2)
BGR_MEANS = np.array([104.0, 117.0, 123.0], np.float32)


@dataclasses.dataclass(frozen=True)
class RetinaFaceConfig:
    # cfg_re50: resnet50 body, taps at layer2/3/4
    layers: tuple = (3, 4, 6, 3)
    stem_width: int = 64
    in_channels: tuple = (512, 1024, 2048)
    out_channel: int = 256
    min_sizes: tuple = ((16, 32), (64, 128), (256, 512))
    steps: tuple = (8, 16, 32)
    n_anchors: int = 2
    dtype: Any = jnp.float32

    @staticmethod
    def re50() -> "RetinaFaceConfig":
        return RetinaFaceConfig()

    @staticmethod
    def tiny() -> "RetinaFaceConfig":
        """Shrunk topology for parity tests (same structure)."""
        return RetinaFaceConfig(layers=(1, 1, 1, 1), stem_width=8,
                                in_channels=(64, 128, 256), out_channel=32)


def _conv(x, features, k, s, name, padding=None):
    pad = padding if padding is not None else k // 2
    return nn.Conv(features, (k, k), strides=(s, s),
                   padding=((pad, pad), (pad, pad)), name=name)(x)


class RetinaFace(nn.Module):
    """__call__(images (B, H, W, 3) BGR mean-subtracted) ->
    (loc (B, P, 4), conf (B, P, 2) softmaxed, landms (B, P, 10))."""

    config: RetinaFaceConfig = RetinaFaceConfig()

    @nn.compact
    def __call__(self, x):
        c = self.config
        w0 = c.stem_width

        # --- resnet stem
        h = nn.relu(nn.Conv(w0, (7, 7), strides=(2, 2),
                            padding=((3, 3), (3, 3)), name="stem")(x))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                  (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

        # --- layers 1..4 (bottlenecks, BN folded into convs), tap 2/3/4
        def bottleneck(x, width, stride, has_down, name_p):
            out = nn.relu(_conv(x, width, 1, 1, f"{name_p}_conv1"))
            out = nn.relu(_conv(out, width, 3, stride, f"{name_p}_conv2"))
            out = _conv(out, width * 4, 1, 1, f"{name_p}_conv3")
            if has_down:
                x = _conv(x, width * 4, 1, stride, f"{name_p}_down", padding=0)
            return nn.relu(out + x)

        taps = []
        for li, blocks in enumerate(c.layers):
            width = w0 * (2 ** li)
            for bi in range(blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                has_down = bi == 0  # channel change (layer1) or stride
                h = bottleneck(h, width, stride, has_down,
                               f"layer{li + 1}_{bi}")
            if li >= 1:
                taps.append(h)

        # --- FPN (3 levels, nearest-neighbor top-down)
        oc = c.out_channel
        o1 = _conv(taps[0], oc, 1, 1, "fpn_output1", padding=0)
        o2 = _conv(taps[1], oc, 1, 1, "fpn_output2", padding=0)
        o3 = _conv(taps[2], oc, 1, 1, "fpn_output3", padding=0)

        def up_nearest(t, hw):
            reps_h = -(-hw[0] // t.shape[1])
            reps_w = -(-hw[1] // t.shape[2])
            t = jnp.repeat(jnp.repeat(t, reps_h, axis=1), reps_w, axis=2)
            return t[:, : hw[0], : hw[1]]

        o2 = o2 + up_nearest(o3, o2.shape[1:3])
        o2 = _conv(o2, oc, 3, 1, "fpn_merge2")
        o1 = o1 + up_nearest(o2, o1.shape[1:3])
        o1 = _conv(o1, oc, 3, 1, "fpn_merge1")
        feats = [o1, o2, o3]

        # --- SSH context modules
        def ssh(t, name):
            c3 = _conv(t, oc // 2, 3, 1, f"{name}_conv3X3")
            c5_1 = nn.relu(_conv(t, oc // 4, 3, 1, f"{name}_conv5X5_1"))
            c5 = _conv(c5_1, oc // 4, 3, 1, f"{name}_conv5X5_2")
            c7_2 = nn.relu(_conv(c5_1, oc // 4, 3, 1, f"{name}_conv7X7_2"))
            c7 = _conv(c7_2, oc // 4, 3, 1, f"{name}_conv7x7_3")
            return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))

        feats = [ssh(t, f"ssh{i + 1}") for i, t in enumerate(feats)]

        # --- heads
        def head(t, name, dims):
            b = t.shape[0]
            y = nn.Conv(c.n_anchors * dims, (1, 1), name=name)(t)
            return y.reshape(b, -1, dims)

        loc = jnp.concatenate(
            [head(t, f"BboxHead_{i}", 4) for i, t in enumerate(feats)], axis=1)
        conf = jnp.concatenate(
            [head(t, f"ClassHead_{i}", 2) for i, t in enumerate(feats)], axis=1)
        landms = jnp.concatenate(
            [head(t, f"LandmarkHead_{i}", 10) for i, t in enumerate(feats)],
            axis=1)
        return loc, jax.nn.softmax(conf, axis=-1), landms


# ------------------------------------------------------------- priors/boxes


def prior_boxes(cfg: RetinaFaceConfig, image_h: int, image_w: int) -> np.ndarray:
    """PriorBox(cfg_re50) anchors in center-offset form, shape (P, 4)."""
    anchors = []
    for k, step in enumerate(cfg.steps):
        fh, fw = math.ceil(image_h / step), math.ceil(image_w / step)
        for i, j in product(range(fh), range(fw)):
            for min_size in cfg.min_sizes[k]:
                s_kx = min_size / image_w
                s_ky = min_size / image_h
                cx = (j + 0.5) * step / image_w
                cy = (i + 0.5) * step / image_h
                anchors.append([cx, cy, s_kx, s_ky])
    return np.asarray(anchors, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray,
                 variances=VARIANCES) -> np.ndarray:
    """Batched center-offset decode (retinaface_utils.py:46-76). loc
    (B, P, 4), priors (P, 4) -> corner-form boxes (B, P, 4), normalized."""
    priors = priors[None]
    centers = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    sizes = priors[..., 2:] * np.exp(loc[..., 2:] * variances[1])
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=-1)
    return boxes


def nms(dets: np.ndarray, thresh: float) -> list[int]:
    """py_cpu_nms: greedy IoU suppression over (x1,y1,x2,y2,score) rows."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return keep


def filter_detected_boxes(boxes: np.ndarray, scores: np.ndarray,
                          confidence_threshold: float = 0.7,
                          nms_threshold: float = NMS_THRESHOLD,
                          top_k: int = TOP_K,
                          keep_top_k: int = KEEP_TOP_K) -> np.ndarray:
    """Confidence filter + top-k + NMS (retinaface_utils.py:24-43)."""
    inds = np.where(scores > confidence_threshold)[0]
    boxes, scores = boxes[inds], scores[inds]
    order = scores.argsort()[::-1][:top_k]
    boxes, scores = boxes[order], scores[order]
    dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
    keep = nms(dets, nms_threshold)
    return dets[keep][:keep_top_k, :4]


def pixelate_face(face_img: np.ndarray, blocks: int = 5) -> np.ndarray:
    """blur_utils.pixelate_face: block-average pixelation."""
    h, w = face_img.shape[:2]
    out = face_img.copy()
    xs = np.linspace(0, w, blocks + 1, dtype=int)
    ys = np.linspace(0, h, blocks + 1, dtype=int)
    for i in range(blocks):
        for j in range(blocks):
            y0, y1 = ys[i], ys[i + 1]
            x0, x1 = xs[j], xs[j + 1]
            if y1 > y0 and x1 > x0:
                out[y0:y1, x0:x1] = face_img[y0:y1, x0:x1].mean(
                    axis=(0, 1), keepdims=True)
    return out


class RetinaFaceDetector:
    """Detection + blur driver (face_blur_filter.py:72-187 semantics):
    frames in [0,1] RGB; detector sees BGR mean-subtracted 255-scale."""

    def __init__(self, params, config: RetinaFaceConfig = RetinaFaceConfig(),
                 confidence_threshold: float = 0.7, batch: int = 4):
        self.model = RetinaFace(config)
        self.params = params
        self.config = config
        self.confidence_threshold = confidence_threshold
        self.batch = batch
        self._fn = jax.jit(lambda p, x: self.model.apply(p, x))

    def detect(self, frames: np.ndarray) -> list[np.ndarray]:
        """frames (N, H, W, 3) [0,1] RGB -> per-frame (K, 4) pixel boxes."""
        n, h, w, _ = frames.shape
        priors = prior_boxes(self.config, h, w)
        bgr = frames[..., ::-1] * 255.0 - BGR_MEANS
        out = []
        for i in range(0, n, self.batch):
            loc, conf, _ = self._fn(self.params,
                                    jnp.asarray(bgr[i : i + self.batch]))
            boxes = decode_boxes(np.asarray(loc), priors)
            boxes = boxes * np.array([w, h, w, h], np.float32)
            scores = np.asarray(conf)[..., 1]
            for b in range(boxes.shape[0]):
                out.append(filter_detected_boxes(
                    boxes[b], scores[b], self.confidence_threshold))
        return out

    def blur_faces(self, frames: np.ndarray) -> np.ndarray:
        """Pixelate every detected face region (blur_detected_faces)."""
        out = frames.copy()
        for f, boxes in enumerate(self.detect(frames)):
            h, w = frames.shape[1:3]
            for x1, y1, x2, y2 in boxes:
                x1, y1 = max(int(x1), 0), max(int(y1), 0)
                x2, y2 = min(int(x2), w), min(int(y2), h)
                if x2 > x1 and y2 > y1:
                    out[f, y1:y2, x1:x2] = pixelate_face(out[f, y1:y2, x1:x2])
        return out


# ---------------------------------------------------------------- converter


def _fold_bn(conv_w, bn, eps=1e-5):
    """Fold eval-mode BatchNorm into the preceding (bias-free) conv.
    conv_w OIHW; returns (HWIO kernel, bias)."""
    gamma, beta, mean, var = bn
    scale = gamma / np.sqrt(var + eps)
    w = np.asarray(conv_w) * scale[:, None, None, None]
    b = beta - mean * scale
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32), b.astype(np.float32)


def convert_retinaface(sd: Mapping[str, np.ndarray],
                       cfg: RetinaFaceConfig = RetinaFaceConfig()) -> dict:
    """Pytorch_Retinaface Resnet50_Final.pth -> params (BN folded)."""
    sd = {re.sub(r"^module\.", "", k): np.asarray(v) for k, v in sd.items()}
    p: dict = {}

    def put(name, kernel, bias):
        p[name] = {"kernel": kernel, "bias": bias}

    def bn_at(prefix):
        return (sd[f"{prefix}.weight"], sd[f"{prefix}.bias"],
                sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"])

    # stem
    put("stem", *_fold_bn(sd["body.conv1.weight"], bn_at("body.bn1")))
    # resnet layers
    for li, blocks in enumerate(cfg.layers):
        for bi in range(blocks):
            base = f"body.layer{li + 1}.{bi}"
            for ci in (1, 2, 3):
                put(f"layer{li + 1}_{bi}_conv{ci}",
                    *_fold_bn(sd[f"{base}.conv{ci}.weight"],
                              bn_at(f"{base}.bn{ci}")))
            if f"{base}.downsample.0.weight" in sd:
                put(f"layer{li + 1}_{bi}_down",
                    *_fold_bn(sd[f"{base}.downsample.0.weight"],
                              bn_at(f"{base}.downsample.1")))
    # fpn (Sequential: 0=conv no-bias, 1=bn)
    for name in ("output1", "output2", "output3", "merge1", "merge2"):
        put(f"fpn_{name}", *_fold_bn(sd[f"fpn.{name}.0.weight"],
                                     bn_at(f"fpn.{name}.1")))
    # ssh modules
    for i in (1, 2, 3):
        for sub in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2",
                    "conv7x7_3"):
            put(f"ssh{i}_{sub}", *_fold_bn(sd[f"ssh{i}.{sub}.0.weight"],
                                           bn_at(f"ssh{i}.{sub}.1")))
    # heads (plain 1x1 convs with bias)
    for head in ("ClassHead", "BboxHead", "LandmarkHead"):
        for i in range(3):
            w = sd[f"{head}.{i}.conv1x1.weight"]
            b = sd[f"{head}.{i}.conv1x1.bias"]
            put(f"{head}_{i}", np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
                b.astype(np.float32))
    return {"params": p}
