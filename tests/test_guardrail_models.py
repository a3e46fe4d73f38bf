"""Guardrail model stacks: SigLIP vision tower (parity vs transformers),
safety classifier (parity vs the Cosmos torch head), RetinaFace (parity vs
a torch replica of Pytorch_Retinaface), and the checkpoint-gated wiring
(reference: cosmos1/models/guardrail/{video_content_safety_filter,
face_blur_filter}/)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


# --------------------------------------------------------------- SigLIP


def _hf_siglip_tiny():
    import torch
    from transformers import SiglipVisionConfig as HFCfg
    from transformers import SiglipVisionModel as HFModel

    cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, image_size=28, patch_size=14)
    torch.manual_seed(0)
    return HFModel(cfg).eval()


def test_siglip_vision_parity(rng):
    import torch

    from tclight_tpu.models.siglip import (
        SiglipVisionConfig, SiglipVisionTower, convert_siglip_vision)

    hf = _hf_siglip_tiny()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    model = SiglipVisionTower(SiglipVisionConfig.tiny())
    params = convert_siglip_vision(sd)

    imgs = rng.uniform(-1, 1, size=(2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(imgs, -1, 1).copy())
                 ).pooler_output.numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_safety_classifier_parity(rng):
    """Vs the reference's torch head (model.py:29-46), incl. BN folding."""
    import torch
    import torch.nn as nn

    from tclight_tpu.models.siglip import (
        SafetyClassifier, convert_safety_classifier)

    torch.manual_seed(1)
    net = nn.Sequential(
        nn.Linear(48, 512), nn.BatchNorm1d(512), nn.ReLU(),
        nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
        nn.Linear(256, 7),
    )
    # non-trivial running stats
    net.train()
    with torch.no_grad():
        for _ in range(3):
            net(torch.randn(32, 48))
    net.eval()
    sd = {f"network.layers.{k}": v.numpy() for k, v in net.state_dict().items()}
    params = convert_safety_classifier(sd)
    model = SafetyClassifier(input_size=48, num_classes=7)
    x = rng.normal(size=(4, 48)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


# ------------------------------------------------------------ RetinaFace


def _torch_retinaface_tiny(cfg):
    """Torch replica of Pytorch_Retinaface's RetinaFace(cfg, phase='test')
    at the tiny topology, with the published module/key layout."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def conv_bn(inp, oup, k=3, s=1, p=1):
        return nn.Sequential(nn.Conv2d(inp, oup, k, s, p, bias=False),
                             nn.BatchNorm2d(oup))

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inp, width, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(inp, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(width * 4)
            self.downsample = None
            if stride != 1 or inp != width * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, width * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(width * 4))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return F.relu(out + idt)

    class Body(nn.Module):
        def __init__(self, w0, layers):
            super().__init__()
            self.conv1 = nn.Conv2d(3, w0, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(w0)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            inp = w0
            for li, blocks in enumerate(layers):
                width = w0 * (2 ** li)
                mods = []
                for bi in range(blocks):
                    stride = 2 if (bi == 0 and li > 0) else 1
                    mods.append(Bottleneck(inp, width, stride))
                    inp = width * 4
                setattr(self, f"layer{li + 1}", nn.Sequential(*mods))

        def forward(self, x):
            x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
            x = self.layer1(x)
            c2 = self.layer2(x)
            c3 = self.layer3(c2)
            c4 = self.layer4(c3)
            return c2, c3, c4

    class SSH(nn.Module):
        def __init__(self, inp, out):
            super().__init__()
            self.conv3X3 = conv_bn(inp, out // 2)
            self.conv5X5_1 = conv_bn(inp, out // 4)
            self.conv5X5_2 = conv_bn(out // 4, out // 4)
            self.conv7X7_2 = conv_bn(out // 4, out // 4)
            self.conv7x7_3 = conv_bn(out // 4, out // 4)

        def forward(self, x):
            c3 = self.conv3X3(x)
            c5_1 = F.relu(self.conv5X5_1(x))
            c5 = self.conv5X5_2(c5_1)
            c7_2 = F.relu(self.conv7X7_2(c5_1))
            c7 = self.conv7x7_3(c7_2)
            return F.relu(torch.cat([c3, c5, c7], dim=1))

    class FPN(nn.Module):
        def __init__(self, ins, out):
            super().__init__()
            self.output1 = conv_bn(ins[0], out, 1, 1, 0)
            self.output2 = conv_bn(ins[1], out, 1, 1, 0)
            self.output3 = conv_bn(ins[2], out, 1, 1, 0)
            self.merge1 = conv_bn(out, out)
            self.merge2 = conv_bn(out, out)

        def forward(self, c2, c3, c4):
            o1, o2, o3 = self.output1(c2), self.output2(c3), self.output3(c4)
            o2 = self.merge2(o2 + F.interpolate(o3, size=o2.shape[2:],
                                                mode="nearest"))
            o1 = self.merge1(o1 + F.interpolate(o2, size=o1.shape[2:],
                                                mode="nearest"))
            return o1, o2, o3

    class Head(nn.Module):
        def __init__(self, inp, dims, anchors=2):
            super().__init__()
            self.conv1x1 = nn.Conv2d(inp, anchors * dims, 1)
            self.dims = dims

        def forward(self, x):
            y = self.conv1x1(x).permute(0, 2, 3, 1).contiguous()
            return y.view(y.shape[0], -1, self.dims)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.body = Body(cfg.stem_width, cfg.layers)
            self.fpn = FPN(cfg.in_channels, cfg.out_channel)
            self.ssh1 = SSH(cfg.out_channel, cfg.out_channel)
            self.ssh2 = SSH(cfg.out_channel, cfg.out_channel)
            self.ssh3 = SSH(cfg.out_channel, cfg.out_channel)
            self.ClassHead = nn.ModuleList(
                [Head(cfg.out_channel, 2) for _ in range(3)])
            self.BboxHead = nn.ModuleList(
                [Head(cfg.out_channel, 4) for _ in range(3)])
            self.LandmarkHead = nn.ModuleList(
                [Head(cfg.out_channel, 10) for _ in range(3)])

        def forward(self, x):
            c2, c3, c4 = self.body(x)
            f = self.fpn(c2, c3, c4)
            feats = [self.ssh1(f[0]), self.ssh2(f[1]), self.ssh3(f[2])]
            loc = torch.cat([self.BboxHead[i](t) for i, t in enumerate(feats)], 1)
            conf = torch.cat([self.ClassHead[i](t) for i, t in enumerate(feats)], 1)
            lm = torch.cat([self.LandmarkHead[i](t) for i, t in enumerate(feats)], 1)
            return loc, F.softmax(conf, dim=-1), lm

    torch.manual_seed(0)
    net = Net()
    # non-trivial BN stats
    net.train()
    with torch.no_grad():
        for _ in range(2):
            net(torch.randn(2, 3, 64, 64))
    return net.eval()


@pytest.mark.slow
def test_retinaface_parity_with_torch_replica(rng):
    import torch

    from tclight_tpu.models.retinaface import (
        RetinaFace, RetinaFaceConfig, convert_retinaface)

    cfg = RetinaFaceConfig.tiny()
    net = _torch_retinaface_tiny(cfg)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert_retinaface(sd, cfg)
    model = RetinaFace(cfg)

    imgs = rng.normal(0, 50, size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        loc_t, conf_t, lm_t = net(torch.from_numpy(
            np.moveaxis(imgs, -1, 1).copy()))
    loc, conf, lm = model.apply(params, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(loc), loc_t.numpy(), atol=1e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(conf), conf_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lm), lm_t.numpy(), atol=1e-3,
                               rtol=1e-3)


def test_priors_decode_nms():
    from tclight_tpu.models.retinaface import (
        RetinaFaceConfig, decode_boxes, filter_detected_boxes, nms,
        prior_boxes)

    cfg = RetinaFaceConfig.tiny()
    priors = prior_boxes(cfg, 64, 64)
    expected = sum(
        int(np.ceil(64 / s)) ** 2 * 2 for s in cfg.steps)
    assert priors.shape == (expected, 4)
    # zero offsets decode back to the priors (corner form)
    boxes = decode_boxes(np.zeros((1, len(priors), 4), np.float32), priors)
    np.testing.assert_allclose(boxes[0, :, 2] - boxes[0, :, 0],
                               priors[:, 2], atol=1e-6)
    # NMS keeps the higher-scoring of two identical boxes
    dets = np.array([[0, 0, 10, 10, 0.9], [0, 0, 10, 10, 0.8],
                     [20, 20, 30, 30, 0.7]], np.float32)
    assert nms(dets, 0.4) == [0, 2]
    kept = filter_detected_boxes(dets[:, :4], dets[:, 4],
                                 confidence_threshold=0.75)
    assert kept.shape == (1, 4)


def test_pixelate_and_blur_wiring(rng):
    from tclight_tpu.models.retinaface import pixelate_face

    img = rng.uniform(size=(20, 20, 3)).astype(np.float32)
    out = pixelate_face(img, blocks=5)
    assert out.shape == img.shape
    # each 4x4 block is constant
    blk = out[:4, :4]
    assert np.allclose(blk, blk[0, 0])


def test_video_safety_checker_gating(tmp_path, rng):
    """Without checkpoints the checker passes through; with an injected
    predict it gates."""
    from tclight_tpu.cosmos.guardrails import (
        SafetyResult, VideoContentSafetyChecker, presets_video)

    frames = rng.uniform(size=(4, 16, 16, 3)).astype(np.float32)
    checker = VideoContentSafetyChecker(None)
    assert checker(frames).is_safe

    flagged = VideoContentSafetyChecker(
        None, predict=lambda f: SafetyResult(False, "Violence"))
    runner = presets_video()
    assert runner.is_safe("x").is_safe
    assert not flagged(frames).is_safe
    # face blur without ckpt = identity
    out = runner.postprocess(frames)
    np.testing.assert_allclose(out, frames)
