"""MemFlowNet (GMA-SK2) numerics parity vs the reference torch
implementation driven through its own InferenceCore — validates the
checkpoint-exact rebuild (models/memflow_sk.py) including the SKII blocks,
GMA aggregation, memory attention scale, and the working-memory roll."""

import os
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "utils/evaluation/memflow")),
    reason="reference checkout not available",
)


class _Cfg(dict):
    """yacs-like: both attribute and item access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _stub_timm():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    vit = types.ModuleType("timm.models.vision_transformer")
    for name in ("DropPath", "to_2tuple", "trunc_normal_", "Mlp"):
        setattr(layers, name, object)
        setattr(vit, name, object)
    timm.models = models
    models.layers = layers
    models.vision_transformer = vit
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers
    sys.modules["timm.models.vision_transformer"] = vit


def _build_ref(depth):
    from _ref_oracle import ref_import

    _stub_timm()
    MemFlowNet = ref_import(
        "utils.evaluation.memflow.core.Networks.MemFlowNet.MemFlow"
    ).MemFlowNet
    inference_core_skflow = ref_import(
        "utils.evaluation.memflow.inference.inference_core_skflow"
    )

    cfg = _Cfg(
        cnet="basicencoder", fnet="basicencoder", gma="GMA-SK2",
        corr_fn="default", corr_levels=4, corr_radius=4, down_ratio=8,
        feat_dim=256, decoder_depth=12, val_decoder_depth=depth,
        train_avg_length=(400 * 720 // 64) * 3 / 2, pretrain=False,
        mem_every=1, enable_long_term=False,
        enable_long_term_count_usage=True, max_mid_term_frames=2,
        min_mid_term_frames=1, num_prototypes=128,
        max_long_term_elements=10000, top_k=None,
    )
    torch.manual_seed(0)
    net = MemFlowNet(cfg)
    with torch.no_grad():
        for p in net.parameters():
            if p.ndim > 1:
                p.normal_(0.0, 0.05)
            else:
                p.normal_(0.0, 0.01)
    net = net.eval()
    core = inference_core_skflow.InferenceCore(net, config=cfg)
    return net, core


@pytest.mark.slow
def test_memflow_streaming_parity():
    from tclight_tpu.models.memflow_sk import (
        InferenceCoreSK,
        MemFlowNetSK,
        MemFlowSKConfig,
        convert_memflow_params,
    )

    depth = 3
    ref_net, ref_core = _build_ref(depth)
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    cfg = MemFlowSKConfig(decoder_depth=depth)
    params = convert_memflow_params(sd, cfg)

    model = MemFlowNetSK(cfg)
    ours = InferenceCoreSK(model, params, warm_start=False)

    rng = np.random.default_rng(0)
    base = rng.uniform(size=(128, 160, 3)).astype(np.float32)
    frames = [np.roll(base, 2 * i, axis=1) for i in range(3)]

    for t in range(2):
        f1, f2 = frames[t], frames[t + 1]
        pair = torch.tensor(
            np.stack([f1, f2]).transpose(0, 3, 1, 2) * 2.0 - 1.0
        )[None]
        with torch.no_grad():
            _, flow_ref = ref_core.step(pair)
        flow_ref = flow_ref[0].numpy().transpose(1, 2, 0)

        flow = ours.step(f1, f2)
        err = np.abs(flow - flow_ref).max()
        assert err < 5e-3, f"pair {t}: max flow err {err}"
