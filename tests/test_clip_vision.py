import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionModel,
    convert_clip_vision,
)


def test_vision_forward_shapes(rng):
    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModel(cfg)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, cfg.projection_dim)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_vision_parity_with_transformers(rng):
    import torch
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection as HFModel

    hf_cfg = HFCfg(image_size=32, patch_size=16, hidden_size=32,
                   num_hidden_layers=2, num_attention_heads=2,
                   intermediate_size=64, projection_dim=16,
                   hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_vision(sd)

    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModel(cfg)
    imgs = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    # HF expects normalized CHW input; ours normalizes internally
    from tclight_tpu.models.clip_vision import CLIP_MEAN, CLIP_STD

    hf_in = torch.from_numpy(
        np.moveaxis((imgs - CLIP_MEAN) / CLIP_STD, -1, 1).copy()
    )
    with torch.no_grad():
        ref = hf(hf_in).image_embeds.numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)
