"""ControlNet branch: model/converter structure + residual injection +
e2e steering through the Generator (reference: diffusers ControlNetModel
used at generate_utils.py:267-272, loaded at VidToMe utils.py:49-55)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.models.controlnet import (
    ControlNetModel, convert_controlnet)
from tclight_tpu.models.unet import ToMeSpec, UNet2DCondition, UNetConfig


def _tiny_cfg():
    return UNetConfig.tiny(in_channels=4)


@pytest.mark.slow
def test_controlnet_residual_shapes_and_zero_init(rng):
    cfg = _tiny_cfg()
    model = ControlNetModel(cfg)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 77, cfg.context_dim)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.asarray(1.0),
                                 ctx, cond)
    down, mid = model.apply(params, x, jnp.asarray(1.0), ctx, cond)
    # SD topology: 1 conv_in + levels*(blocks+downsample) + last-level blocks
    n_levels, lpb = len(cfg.block_out_channels), cfg.layers_per_block
    expected = 1 + (n_levels - 1) * (lpb + 1) + lpb
    assert len(down) == expected
    # zero convs: residuals are exactly zero at init
    for r in down:
        assert float(jnp.abs(r).max()) == 0.0
    assert float(jnp.abs(mid).max()) == 0.0


@pytest.mark.slow
def test_unet_residual_injection_changes_output(rng):
    cfg = _tiny_cfg()
    unet = UNet2DCondition(cfg)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 77, cfg.context_dim)).astype(np.float32))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, jnp.asarray(1.0), ctx)
    base, _ = unet.apply(params, x, jnp.asarray(1.0), ctx)

    cnet = ControlNetModel(cfg)
    cond = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    cparams = jax.jit(cnet.init)(jax.random.PRNGKey(1), x, jnp.asarray(1.0),
                                 ctx, cond)
    down, mid = cnet.apply(cparams, x, jnp.asarray(1.0), ctx, cond)
    # zero-init residuals must be a no-op
    same, _ = unet.apply(params, x, jnp.asarray(1.0), ctx,
                         down_residuals=down, mid_residual=mid)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)
    # non-zero residuals must steer the output
    down2 = [r + 0.3 for r in down]
    steered, _ = unet.apply(params, x, jnp.asarray(1.0), ctx,
                            down_residuals=down2, mid_residual=mid + 0.3)
    assert float(jnp.abs(steered - base).max()) > 1e-4


@pytest.mark.slow
def test_convert_controlnet_against_diffusers_layout(rng):
    """Build a synthetic diffusers-style state dict for the tiny topology
    and check the converter produces the exact param tree."""
    cfg = _tiny_cfg()
    model = ControlNetModel(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, cfg.context_dim))
    cond = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.asarray(1.0),
                                 ctx, cond)["params"]

    # synthesize torch keys from the flax tree (inverse of the converter)
    sd = {}

    def conv_back(w):
        return np.transpose(np.asarray(w), (3, 2, 0, 1))

    def walk(node, path):
        for k, v in node.items():
            p = path + [k]
            if isinstance(v, dict):
                walk(v, p)
                continue
            key = "/".join(p)
            tk = _flax_to_torch_key(key)
            if tk is None:
                continue
            if key.endswith("kernel") and np.asarray(v).ndim == 4:
                sd[tk] = conv_back(v)
            elif key.endswith("kernel"):
                sd[tk] = np.transpose(np.asarray(v))
            else:
                sd[tk] = np.asarray(v)

    def _flax_to_torch_key(key):
        import re

        k = key
        k = k.replace("/kernel", ".weight").replace("/bias", ".bias")
        k = k.replace("/scale", ".weight")
        m = re.match(r"controlnet_down_(\d+)\.(weight|bias)", k)
        if m:
            return f"controlnet_down_blocks.{m.group(1)}.{m.group(2)}"
        if k.startswith("controlnet_mid."):
            return k.replace("controlnet_mid.", "controlnet_mid_block.")
        if k.startswith("controlnet_cond_embedding/"):
            return (k.replace("controlnet_cond_embedding/", "controlnet_cond_embedding.")
                    .replace("blocks_", "blocks."))
        m = re.match(r"down_(\d+)_res_(\d+)/(.+)", k)
        if m:
            return f"down_blocks.{m.group(1)}.resnets.{m.group(2)}.{m.group(3).replace('/', '.')}"
        m = re.match(r"down_(\d+)_attn_(\d+)/(.+)", k)
        if m:
            return _attn_back(f"down_blocks.{m.group(1)}.attentions.{m.group(2)}", m.group(3))
        m = re.match(r"mid_attn/(.+)", k)
        if m:
            return _attn_back("mid_block.attentions.0", m.group(1))
        m = re.match(r"mid_res_(\d+)/(.+)", k)
        if m:
            return f"mid_block.resnets.{m.group(1)}.{m.group(2).replace('/', '.')}"
        m = re.match(r"down_(\d+)_ds/conv\.(weight|bias)", k)
        if m:
            return f"down_blocks.{m.group(1)}.downsamplers.0.conv.{m.group(2)}"
        if k.startswith(("conv_in.", "time_embedding/")):
            return k.replace("/", ".")
        return None

    def _attn_back(prefix, rest):
        r = rest.replace("/", ".")
        r = r.replace("transformer_blocks_0", "transformer_blocks.0")
        r = r.replace("to_out_0", "to_out.0")
        r = r.replace("ff.net_0.proj", "ff.net.0.proj")
        r = r.replace("ff.net_2", "ff.net.2")
        return f"{prefix}.{r}"

    walk(params, [])
    converted = convert_controlnet(sd, n_levels=len(cfg.block_out_channels))["params"]

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(converted)
    paths_a = {jax.tree_util.keystr(p) for p, _ in flat_a}
    paths_b = {jax.tree_util.keystr(p) for p, _ in flat_b}
    assert paths_a == paths_b, (
        f"missing: {sorted(paths_a - paths_b)[:5]} "
        f"extra: {sorted(paths_b - paths_a)[:5]}")
    b_map = {jax.tree_util.keystr(p): v for p, v in flat_b}
    for p, v in flat_a:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(b_map[jax.tree_util.keystr(p)]),
            err_msg=jax.tree_util.keystr(p))


@pytest.mark.slow
def test_controlnet_generator_e2e(tmp_path, rng):
    """control=canny steers the tiny pipeline (residuals perturbed away
    from zero-init so the branch has signal)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_pipeline_e2e import make_config, make_synthetic_video

    from tclight_tpu.data.dataparsers import VideoDataParser
    from tclight_tpu.pipeline.generator import Generator
    from tclight_tpu.pipeline.iclight import build_tiny_sd

    vid_dir, _ = make_synthetic_video(tmp_path, n=4)
    models = build_tiny_sd(seed=0, num_inference_steps=2)
    cfg_u = models.unet.config
    cnet = ControlNetModel(cfg_u)
    cparams = jax.jit(cnet.init)(
        jax.random.PRNGKey(2), jnp.zeros((1, 4, 4, 4)), jnp.asarray(1.0),
        jnp.zeros((1, 77, cfg_u.context_dim)), jnp.zeros((1, 32, 32, 3)))
    # un-zero the zero convs so control actually steers
    cparams = jax.tree.map(
        lambda a: a + 0.05 if a.ndim == 4 else a, cparams)
    models = dataclasses.replace(models, controlnet=cnet,
                                 controlnet_params=cparams)

    def run(control):
        cfg = make_config(tmp_path, vid_dir, control=control, n_timesteps=2)
        cfg["post_opt"]["apply_opt"] = False
        gen = Generator(models, cfg, data_parser=VideoDataParser(cfg["data"]))
        out = gen(None, str(tmp_path / f"out_{control}"), list(range(4)))
        return np.asarray(next(iter(out.values())))

    out_ctrl = run("canny")
    out_plain = run("none")
    assert np.isfinite(out_ctrl).all()
    assert np.abs(out_ctrl - out_plain).max() > 1e-4
