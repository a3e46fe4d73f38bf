"""OpenPose annotator tests: (1) network parity vs a torch replica of the
pytorch-openpose `bodypose_model` (the body_pose_model.pth architecture
behind controlnet_aux's OpenposeDetector; reference openpose_prepreocess,
utils/VidToMe/controlnet_utils.py:54-56) on random weights through
convert_bodypose; (2) behavioral checks of the peak/PAF/assembly pipeline
on synthetic two-person pose fields with known geometry."""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tclight_tpu.models.openpose import (  # noqa: E402
    BodyPoseNet, COLORS, LIMB_SEQ, MAP_IDX, _assemble_subsets,
    _connect_limbs, _find_peaks, convert_bodypose, draw_bodypose)

WM = 0.125  # width multiplier for the test nets


def _c(ch):
    return max(1, int(ch * WM))


def _make_layers(plan, no_relu_layers):
    layers = []
    for name, v in plan.items():
        if "pool" in name:
            layers.append((name, tnn.MaxPool2d(kernel_size=v[0],
                                               stride=v[1], padding=v[2])))
        else:
            layers.append((name, tnn.Conv2d(v[0], v[1], v[2], v[3], v[4])))
            if name not in no_relu_layers:
                layers.append(("relu_" + name, tnn.ReLU()))
    return tnn.Sequential(OrderedDict(layers))


class _TorchBody(tnn.Module):
    """pytorch-openpose bodypose_model, width-scaled."""

    def __init__(self):
        super().__init__()
        no_relu = ["conv5_5_CPM_L1", "conv5_5_CPM_L2"] + [
            f"Mconv7_stage{n}_{b}" for n in range(2, 7) for b in ("L1", "L2")]
        block0 = OrderedDict([
            ("conv1_1", [3, _c(64), 3, 1, 1]),
            ("conv1_2", [_c(64), _c(64), 3, 1, 1]),
            ("pool1_stage1", [2, 2, 0]),
            ("conv2_1", [_c(64), _c(128), 3, 1, 1]),
            ("conv2_2", [_c(128), _c(128), 3, 1, 1]),
            ("pool2_stage1", [2, 2, 0]),
            ("conv3_1", [_c(128), _c(256), 3, 1, 1]),
            ("conv3_2", [_c(256), _c(256), 3, 1, 1]),
            ("conv3_3", [_c(256), _c(256), 3, 1, 1]),
            ("conv3_4", [_c(256), _c(256), 3, 1, 1]),
            ("pool3_stage1", [2, 2, 0]),
            ("conv4_1", [_c(256), _c(512), 3, 1, 1]),
            ("conv4_2", [_c(512), _c(512), 3, 1, 1]),
            ("conv4_3_CPM", [_c(512), _c(256), 3, 1, 1]),
            ("conv4_4_CPM", [_c(256), _c(128), 3, 1, 1]),
        ])
        self.model0 = _make_layers(block0, no_relu)

        def stage1(branch, out_ch):
            return _make_layers(OrderedDict([
                (f"conv5_1_CPM_{branch}", [_c(128), _c(128), 3, 1, 1]),
                (f"conv5_2_CPM_{branch}", [_c(128), _c(128), 3, 1, 1]),
                (f"conv5_3_CPM_{branch}", [_c(128), _c(128), 3, 1, 1]),
                (f"conv5_4_CPM_{branch}", [_c(128), _c(512), 1, 1, 0]),
                (f"conv5_5_CPM_{branch}", [_c(512), out_ch, 1, 1, 0]),
            ]), no_relu)

        def stageN(n, branch, out_ch):
            cat_ch = 38 + 19 + _c(128)
            return _make_layers(OrderedDict([
                (f"Mconv1_stage{n}_{branch}", [cat_ch, _c(128), 7, 1, 3]),
                (f"Mconv2_stage{n}_{branch}", [_c(128), _c(128), 7, 1, 3]),
                (f"Mconv3_stage{n}_{branch}", [_c(128), _c(128), 7, 1, 3]),
                (f"Mconv4_stage{n}_{branch}", [_c(128), _c(128), 7, 1, 3]),
                (f"Mconv5_stage{n}_{branch}", [_c(128), _c(128), 7, 1, 3]),
                (f"Mconv6_stage{n}_{branch}", [_c(128), _c(128), 1, 1, 0]),
                (f"Mconv7_stage{n}_{branch}", [_c(128), out_ch, 1, 1, 0]),
            ]), no_relu)

        self.model1_1 = stage1("L1", 38)
        self.model1_2 = stage1("L2", 19)
        for n in range(2, 7):
            setattr(self, f"model{n}_1", stageN(n, "L1", 38))
            setattr(self, f"model{n}_2", stageN(n, "L2", 19))

    def forward(self, x):
        feat = self.model0(x)
        l1 = self.model1_1(feat)
        l2 = self.model1_2(feat)
        for n in range(2, 7):
            cat = torch.cat([l1, l2, feat], 1)
            l1 = getattr(self, f"model{n}_1")(cat)
            l2 = getattr(self, f"model{n}_2")(cat)
        return l1, l2


def test_bodypose_network_parity(rng):
    torch.manual_seed(0)
    net = _TorchBody().eval()
    with torch.no_grad():
        for p in net.parameters():
            p.normal_(0.0, 0.05)
    x = rng.normal(size=(1, 64, 48, 3)).astype(np.float32) * 0.5

    with torch.no_grad():
        ref_paf, ref_heat = net(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    model = BodyPoseNet(width_mult=WM)
    params = convert_bodypose(sd)

    import jax.numpy as jnp

    paf, heat = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(paf), np.transpose(ref_paf.numpy(), (0, 2, 3, 1)),
        atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(heat), np.transpose(ref_heat.numpy(), (0, 2, 3, 1)),
        atol=3e-4, rtol=1e-3)
    assert paf.shape == (1, 8, 6, 38) and heat.shape == (1, 8, 6, 19)


def _gaussian_blob(h, w, cy, cx, sigma=3.0):
    ys, xs = np.mgrid[:h, :w]
    return np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma**2))


def _synthetic_pose_fields(h, w, people):
    """people: list of {part_index: (x, y)} dicts -> (heatmap, paf)."""
    heat = np.zeros((h, w, 19), np.float32)
    paf = np.zeros((h, w, 38), np.float32)
    for person in people:
        for part, (x, y) in person.items():
            heat[:, :, part] += _gaussian_blob(h, w, y, x)
        for k, (pa, pb) in enumerate(LIMB_SEQ):
            if pa - 1 not in person or pb - 1 not in person:
                continue
            ax, ay = person[pa - 1]
            bx, by = person[pb - 1]
            vec = np.asarray([bx - ax, by - ay], np.float64)
            norm = max(np.hypot(*vec), 1e-5)
            vec = vec / norm
            for t in np.linspace(0, 1, 24):
                px = int(round(ax + t * (bx - ax)))
                py = int(round(ay + t * (by - ay)))
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        yy = np.clip(py + dy, 0, h - 1)
                        xx = np.clip(px + dx, 0, w - 1)
                        paf[yy, xx, MAP_IDX[k][0] - 19] = vec[0]
                        paf[yy, xx, MAP_IDX[k][1] - 19] = vec[1]
    return heat, paf


def test_peak_paf_assembly_two_people():
    h, w = 120, 160
    # minimal 5-part chains: nose(0) neck(1) shoulders(2,5) + elbows(3,6)
    person1 = {0: (40, 20), 1: (40, 40), 2: (28, 42), 3: (22, 66),
               5: (52, 42), 6: (58, 66)}
    person2 = {0: (110, 24), 1: (110, 44), 2: (98, 46), 3: (92, 70),
               5: (122, 46), 6: (128, 70)}
    heat, paf = _synthetic_pose_fields(h, w, [person1, person2])
    all_peaks = _find_peaks(heat, thre1=0.1)
    # every seeded part found exactly twice
    for part in (0, 1, 2, 3, 5, 6):
        assert len(all_peaks[part]) == 2, part
    conn, special = _connect_limbs(paf, all_peaks, h, thre2=0.05)
    candidate, subset = _assemble_subsets(all_peaks, conn, special)
    assert len(subset) == 2
    for row in subset:
        assert row[-1] >= 5  # parts per person assembled
    # the two subsets use disjoint peak ids
    ids0 = {int(i) for i in subset[0][:-2] if i >= 0}
    ids1 = {int(i) for i in subset[1][:-2] if i >= 0}
    assert not ids0 & ids1

    canvas = draw_bodypose(h, w, candidate, subset)
    assert canvas.shape == (h, w, 3) and canvas.max() > 0
    # joints drawn at seeded coordinates (a colored disk near nose 1)
    assert canvas[20, 40].max() > 0 and canvas[24, 110].max() > 0


def test_colors_table_is_reference_palette():
    assert len(COLORS) == 18 and COLORS[0] == [255, 0, 0]
    assert len(LIMB_SEQ) == len(MAP_IDX) == 19
