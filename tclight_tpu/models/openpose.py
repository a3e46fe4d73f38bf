"""OpenPose body-pose annotator in Flax (controlnet_aux `openpose` — the
reference's `openpose_prepreocess`, utils/VidToMe/controlnet_utils.py
:54-56).

Network: the CMU COCO-18 body model (pytorch-openpose `bodypose_model`,
checkpoint body_pose_model.pth): a VGG-derived feature trunk
(conv1_1..conv4_4_CPM -> 128ch at stride 8), a two-branch stage 1 (PAF
38ch / heatmap 19ch), and five 7x7-conv refinement stages over
concat([L1, L2, features]).

Postprocessing transcribes the published Body.__call__ pipeline: single
0.5*368/H scale, stride-8 pad, /256-0.5 feed, bilinear heatmap/PAF
upsampling, gaussian-smoothed NMS peaks (thre1 0.1), 10-point PAF line
integrals with the 0.5*H/len-1 distance prior (thre2 0.05), greedy
bipartite limb connection over the 19-limb COCO mapIdx, and multi-person
subset assembly. `draw_bodypose` renders the canonical 18-color skeleton
(ellipse limbs, radius-4 joints) on a black canvas — what ControlNet's
openpose conditioning expects.
"""

from __future__ import annotations

import math
from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BodyPoseNet", "convert_bodypose", "estimate_body",
           "draw_bodypose", "openpose_model_fn"]

# (name, out_ch, kernel, relu) per trunk layer; 'P' = 2x2 maxpool
_TRUNK = [
    ("conv1_1", 64, 3), ("conv1_2", 64, 3), "P",
    ("conv2_1", 128, 3), ("conv2_2", 128, 3), "P",
    ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
    ("conv3_4", 256, 3), "P",
    ("conv4_1", 512, 3), ("conv4_2", 512, 3),
    ("conv4_3_CPM", 256, 3), ("conv4_4_CPM", 128, 3),
]

# COCO-18 limb pairs (1-indexed) and their PAF channel pairs
LIMB_SEQ = [[2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
            [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
            [1, 16], [16, 18], [3, 17], [6, 18]]
MAP_IDX = [[31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44],
           [19, 20], [21, 22], [23, 24], [25, 26], [27, 28], [29, 30],
           [47, 48], [49, 50], [53, 54], [51, 52], [55, 56], [37, 38],
           [45, 46]]
COLORS = [[255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
          [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85],
          [0, 255, 170], [0, 255, 255], [0, 170, 255], [0, 85, 255],
          [0, 0, 255], [85, 0, 255], [170, 0, 255], [255, 0, 255],
          [255, 0, 170], [255, 0, 85]]


class BodyPoseNet(nn.Module):
    """__call__(x (B, H, W, 3), values in [-0.5, 0.5]) ->
    (paf (B, H/8, W/8, 38), heatmap (B, H/8, W/8, 19))."""

    width_mult: float = 1.0   # <1 shrinks every hidden width for tests

    def _ch(self, c):
        return max(1, int(c * self.width_mult))

    @nn.compact
    def __call__(self, x):
        h = x
        for item in _TRUNK:
            if item == "P":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                name, ch, k = item
                h = nn.relu(nn.Conv(self._ch(ch), (k, k),
                                    padding=((k // 2,) * 2,) * 2,
                                    name=name)(h))
        feat = h

        def stage1(branch: str, out_ch: int, x):
            for i in (1, 2, 3):
                x = nn.relu(nn.Conv(self._ch(128), (3, 3),
                                    padding=((1, 1), (1, 1)),
                                    name=f"conv5_{i}_CPM_{branch}")(x))
            x = nn.relu(nn.Conv(self._ch(512), (1, 1),
                                name=f"conv5_4_CPM_{branch}")(x))
            return nn.Conv(out_ch, (1, 1), name=f"conv5_5_CPM_{branch}")(x)

        def stageN(n: int, branch: str, out_ch: int, x):
            for i in range(1, 6):
                x = nn.relu(nn.Conv(self._ch(128), (7, 7),
                                    padding=((3, 3), (3, 3)),
                                    name=f"Mconv{i}_stage{n}_{branch}")(x))
            x = nn.relu(nn.Conv(self._ch(128), (1, 1),
                                name=f"Mconv6_stage{n}_{branch}")(x))
            return nn.Conv(out_ch, (1, 1),
                           name=f"Mconv7_stage{n}_{branch}")(x)

        l1 = stage1("L1", 38, feat)
        l2 = stage1("L2", 19, feat)
        for n in range(2, 7):
            cat = jnp.concatenate([l1, l2, feat], axis=-1)
            l1 = stageN(n, "L1", 38, cat)
            l2 = stageN(n, "L2", 19, cat)
        return l1, l2


def convert_bodypose(sd: Mapping[str, np.ndarray]) -> dict:
    """pytorch-openpose body_pose_model.pth layout
    (``model0.conv1_1.weight``, ``model{s}_{b}.Mconv...``) -> params."""
    p: dict = {}
    for k, v in sd.items():
        v = np.asarray(v)
        _, layer, wb = k.split(".")  # e.g. model2_1.Mconv1_stage2_L1.weight
        key = "kernel" if wb == "weight" else "bias"
        val = np.transpose(v, (2, 3, 1, 0)) if wb == "weight" else v
        p.setdefault(layer, {})[key] = val
    return {"params": p}


def _pad_to_stride(img: np.ndarray, stride: int, pad_value: float):
    h, w = img.shape[:2]
    ph = (stride - h % stride) % stride
    pw = (stride - w % stride) % stride
    out = np.pad(img, ((0, ph), (0, pw), (0, 0)), constant_values=pad_value)
    return out, (ph, pw)


def _find_peaks(heatmap: np.ndarray, thre1: float):
    """Per-part gaussian-smoothed NMS peak lists [(x, y, score, id), ...]."""
    from scipy.ndimage import gaussian_filter

    all_peaks = []
    peak_counter = 0
    for part in range(18):
        map_ori = heatmap[:, :, part]
        smooth = gaussian_filter(map_ori, sigma=3)
        up = np.zeros_like(smooth); up[1:, :] = smooth[:-1, :]
        down = np.zeros_like(smooth); down[:-1, :] = smooth[1:, :]
        left = np.zeros_like(smooth); left[:, 1:] = smooth[:, :-1]
        right = np.zeros_like(smooth); right[:, :-1] = smooth[:, 1:]
        binary = ((smooth >= up) & (smooth >= down) & (smooth >= left)
                  & (smooth >= right) & (smooth > thre1))
        ys, xs = np.nonzero(binary)
        peaks = [(int(x), int(y), float(map_ori[y, x]), peak_counter + i)
                 for i, (x, y) in enumerate(zip(xs, ys))]
        peak_counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def _connect_limbs(paf: np.ndarray, all_peaks, img_h: int, thre2: float):
    """PAF line-integral scoring + greedy assignment per limb."""
    connection_all, special_k = [], []
    mid_num = 10
    for k, (ma, mb) in enumerate(MAP_IDX):
        score_mid = paf[:, :, [ma - 19, mb - 19]]
        cand_a = all_peaks[LIMB_SEQ[k][0] - 1]
        cand_b = all_peaks[LIMB_SEQ[k][1] - 1]
        if not cand_a or not cand_b:
            special_k.append(k)
            connection_all.append([])
            continue
        candidates = []
        for i, a in enumerate(cand_a):
            for j, b in enumerate(cand_b):
                vec = np.asarray([b[0] - a[0], b[1] - a[1]], np.float64)
                norm = max(math.hypot(*vec), 1e-5)
                vec = vec / norm
                xs = np.linspace(a[0], b[0], mid_num).round().astype(int)
                ys = np.linspace(a[1], b[1], mid_num).round().astype(int)
                vx = score_mid[ys, xs, 0]
                vy = score_mid[ys, xs, 1]
                score_pts = vx * vec[0] + vy * vec[1]
                prior = min(0.5 * img_h / norm - 1, 0)
                score = float(score_pts.mean() + prior)
                crit1 = int((score_pts > thre2).sum()) > 0.8 * mid_num
                crit2 = score > 0
                if crit1 and crit2:
                    candidates.append(
                        (i, j, score, score + a[2] + b[2]))
        candidates.sort(key=lambda c: c[2], reverse=True)
        connection = np.zeros((0, 5))
        used_a, used_b = set(), set()
        for i, j, s, _ in candidates:
            if i in used_a or j in used_b:
                continue
            connection = np.vstack(
                [connection, [cand_a[i][3], cand_b[j][3], s, i, j]])
            used_a.add(i); used_b.add(j)
            if len(connection) >= min(len(cand_a), len(cand_b)):
                break
        connection_all.append(connection)
    return connection_all, special_k


def _assemble_subsets(all_peaks, connection_all, special_k):
    """Greedy multi-person assembly into (n_people, 20) subset rows."""
    subset = -1 * np.ones((0, 20))
    candidate = np.asarray(
        [item for sub in all_peaks for item in sub], np.float64)
    for k in range(len(MAP_IDX)):
        if k in special_k or len(connection_all[k]) == 0:
            continue
        part_as = connection_all[k][:, 0]
        part_bs = connection_all[k][:, 1]
        idx_a, idx_b = np.asarray(LIMB_SEQ[k]) - 1
        for i in range(len(connection_all[k])):
            found, subset_idx = 0, [-1, -1]
            for j in range(len(subset)):
                if subset[j][idx_a] == part_as[i] or \
                        subset[j][idx_b] == part_bs[i]:
                    subset_idx[found] = j
                    found += 1
            if found == 1:
                j = subset_idx[0]
                if subset[j][idx_b] != part_bs[i]:
                    subset[j][idx_b] = part_bs[i]
                    subset[j][-1] += 1
                    subset[j][-2] += (candidate[part_bs[i].astype(int), 2]
                                      + connection_all[k][i][2])
            elif found == 2:
                j1, j2 = subset_idx
                membership = ((subset[j1] >= 0).astype(int)
                              + (subset[j2] >= 0).astype(int))[:-2]
                if (membership == 2).sum() == 0:  # merge disjoint
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += connection_all[k][i][2]
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][idx_b] = part_bs[i]
                    subset[j1][-1] += 1
                    subset[j1][-2] += (candidate[part_bs[i].astype(int), 2]
                                       + connection_all[k][i][2])
            elif not found and k < 17:
                row = -1 * np.ones(20)
                row[idx_a] = part_as[i]
                row[idx_b] = part_bs[i]
                row[-1] = 2
                row[-2] = (candidate[
                    connection_all[k][i, :2].astype(int), 2].sum()
                    + connection_all[k][i][2])
                subset = np.vstack([subset, row])
    # prune weak/short subsets (reference: <4 parts or mean score < 0.4)
    delete_idx = [i for i in range(len(subset))
                  if subset[i][-1] < 4 or subset[i][-2] / subset[i][-1] < 0.4]
    subset = np.delete(subset, delete_idx, axis=0)
    return candidate, subset


def estimate_body(model: BodyPoseNet, params, img: np.ndarray,
                  boxsize: int = 368, stride: int = 8,
                  thre1: float = 0.1, thre2: float = 0.05):
    """img (H, W, 3) [0,1] RGB -> (candidate (n,4), subset (m,20)) in
    image coordinates (the published single-scale 0.5 pipeline)."""
    import cv2

    h, w = img.shape[:2]
    scale = 0.5 * boxsize / h
    scaled = cv2.resize(img, (0, 0), fx=scale, fy=scale,
                        interpolation=cv2.INTER_CUBIC)
    padded, (ph, pw) = _pad_to_stride(scaled, stride, 128 / 255.0)
    # published feed: pixel/256 - 0.5 with 0..255 inputs
    x = jnp.asarray(padded[None] * 255.0 / 256.0 - 0.5)
    paf_lo, heat_lo = jax.jit(
        lambda p, v: model.apply(p, v))(params, x)
    paf_lo = np.asarray(paf_lo[0], np.float32)
    heat_lo = np.asarray(heat_lo[0], np.float32)

    def up(m):
        m = cv2.resize(m, (0, 0), fx=stride, fy=stride,
                       interpolation=cv2.INTER_CUBIC)
        m = m[: padded.shape[0] - ph, : padded.shape[1] - pw]
        return cv2.resize(m, (w, h), interpolation=cv2.INTER_CUBIC)

    heatmap = up(heat_lo)
    paf = up(paf_lo)
    all_peaks = _find_peaks(heatmap, thre1)
    connection_all, special_k = _connect_limbs(paf, all_peaks, h, thre2)
    return _assemble_subsets(all_peaks, connection_all, special_k)


def draw_bodypose(h: int, w: int, candidate: np.ndarray,
                  subset: np.ndarray) -> np.ndarray:
    """Black canvas + 18-color skeleton (published draw_bodypose)."""
    import cv2

    canvas = np.zeros((h, w, 3), np.uint8)
    stickwidth = 4
    for i in range(17):
        for n in range(len(subset)):
            index = subset[n][np.asarray(LIMB_SEQ[i]) - 1]
            if -1 in index:
                continue
            ys = candidate[index.astype(int), 0]
            xs = candidate[index.astype(int), 1]
            m_x, m_y = xs.mean(), ys.mean()
            length = math.hypot(xs[0] - xs[1], ys[0] - ys[1])
            angle = math.degrees(math.atan2(xs[0] - xs[1], ys[0] - ys[1]))
            poly = cv2.ellipse2Poly(
                (int(m_y), int(m_x)), (int(length / 2), stickwidth),
                int(angle), 0, 360, 1)
            cv2.fillConvexPoly(canvas, poly, COLORS[i])
    canvas = (canvas * 0.6).astype(np.uint8)
    for i in range(18):
        for n in range(len(subset)):
            index = int(subset[n][i])
            if index == -1:
                continue
            x, y = candidate[index][0:2]
            cv2.circle(canvas, (int(x), int(y)), 4, COLORS[i], thickness=-1)
    return canvas


def openpose_model_fn(ckpt_path, width_mult: float = 1.0):
    """Generator hook: body_pose_model.pth -> model_fn for
    control_preprocess('openpose') (skeleton canvases in [0,1])."""
    from tclight_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(ckpt_path)
    model = BodyPoseNet(width_mult=width_mult)
    params = convert_bodypose(sd)

    def model_fn(frames: np.ndarray) -> np.ndarray:
        n, h, w, _ = frames.shape
        out = np.zeros((n, h, w, 3), np.float32)
        for i, f in enumerate(frames):
            cand, sub = estimate_body(model, params, f)
            out[i] = draw_bodypose(h, w, cand, sub).astype(np.float32) / 255.0
        return out

    return model_fn
