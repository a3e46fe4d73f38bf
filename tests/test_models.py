"""Model shape/sanity tests on tiny deterministic configs
(SURVEY §4 fixture (a))."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.models.unet import UNet2DCondition, UNetConfig, ToMeSpec
from tclight_tpu.models.vae import AutoencoderKL, VAEConfig
from tclight_tpu.models.clip_text import CLIPTextModel, CLIPTextConfig


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny(in_channels=8)
    model = UNet2DCondition(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 8))
    ctx = jnp.zeros((2, 77, cfg.context_dim))
    params = model.init(key, x, jnp.asarray(5.0), ctx)
    return model, params, cfg


@pytest.mark.slow
def test_unet_forward_shapes(tiny_unet):
    model, params, cfg = tiny_unet
    x = jnp.ones((2, 16, 16, 8)) * 0.1
    ctx = jnp.ones((2, 77, cfg.context_dim)) * 0.1
    out, banks = model.apply(params, x, jnp.asarray(10.0), ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_unet_timestep_sensitivity(tiny_unet):
    model, params, cfg = tiny_unet
    x = jnp.ones((2, 16, 16, 8)) * 0.1
    ctx = jnp.ones((2, 77, cfg.context_dim)) * 0.1
    o1, _ = model.apply(params, x, jnp.asarray(1.0), ctx)
    o2, _ = model.apply(params, x, jnp.asarray(500.0), ctx)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5


@pytest.mark.slow
def test_unet_with_tome_banks():
    cfg = UNetConfig.tiny(in_channels=4)
    spec = ToMeSpec(n_frames=4, local_ratio=0.5, merge_global=True,
                    global_ratio=0.5, max_downsample=2)
    model = UNet2DCondition(cfg, tome_spec=spec)
    key = jax.random.PRNGKey(0)
    b, f = 2, 4
    x = jax.random.normal(key, (b * f, 16, 16, 4))
    ctx = jnp.zeros((b * f, 77, cfg.context_dim))
    params = model.init(key, x, jnp.asarray(5.0), ctx)
    randf = jnp.int32(1)
    flip = jnp.bool_(False)
    # chunk 0: builds banks
    out0, banks = model.apply(params, x, jnp.asarray(5.0), ctx,
                              randf=randf, flip=flip, use_global=False)
    assert out0.shape == (b * f, 16, 16, 4)
    assert len(banks) > 0
    for k, v in banks.items():
        assert v.ndim == 3 and v.shape[0] == b
    # chunk 1: consumes + updates banks; same shapes
    out1, banks2 = model.apply(params, x, jnp.asarray(5.0), ctx,
                               randf=randf, flip=flip, banks=banks,
                               use_global=True)
    assert out1.shape == out0.shape
    assert set(banks2.keys()) == set(banks.keys())
    for k in banks:
        assert banks2[k].shape == banks[k].shape
    assert np.isfinite(np.asarray(out1)).all()


@pytest.mark.slow
def test_unet_tome_jit_compiles():
    cfg = UNetConfig.tiny(in_channels=4)
    spec = ToMeSpec(n_frames=4, local_ratio=0.5, merge_global=True)
    model = UNet2DCondition(cfg, tome_spec=spec)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 16, 16, 4))
    ctx = jnp.zeros((8, 77, cfg.context_dim))
    params = model.init(key, x, jnp.asarray(5.0), ctx)

    @jax.jit
    def step(x, t, ctx, banks, randf, flip):
        return model.apply(params, x, t, ctx, randf=randf, flip=flip,
                           banks=banks, use_global=True)

    _, banks = model.apply(params, x, jnp.asarray(5.0), ctx,
                           randf=jnp.int32(0), flip=jnp.bool_(False))
    out, banks2 = step(x, jnp.asarray(3.0), ctx, banks, jnp.int32(2),
                       jnp.bool_(True))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 3))
    params = model.init(key, x)
    recon, mean, logvar = model.apply(params, x)
    assert mean.shape == (2, 16, 16, 4)
    assert recon.shape == x.shape
    z = model.apply(params, x, method=AutoencoderKL.encode)[0]
    dec = model.apply(params, z, method=AutoencoderKL.decode)
    assert dec.shape == x.shape


@pytest.mark.slow
def test_clip_text_shapes():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (2, 77)))
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 77, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_causal_mask():
    """Changing a later token must not affect earlier positions."""
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    rng = np.random.default_rng(0)
    ids1 = rng.integers(0, 1000, (1, 10))
    ids2 = ids1.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % 1000
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids1))
    o1 = model.apply(params, jnp.asarray(ids1))
    o2 = model.apply(params, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(o1)[0, :-1], np.asarray(o2)[0, :-1],
                               atol=1e-5)
    assert np.abs(np.asarray(o1)[0, -1] - np.asarray(o2)[0, -1]).max() > 1e-4


@pytest.mark.slow
def test_unet_cfg_dedup_exact():
    """cfg_dedup (shared-half input, duplicate at the first cross-attn)
    must be EXACT vs the plain duplicated-batch forward — slot0 (bank
    init) and a bank-carrying global-merge slot."""
    import jax
    import jax.numpy as jnp

    from tclight_tpu.models.unet import ToMeSpec, UNet2DCondition, UNetConfig

    cfg = UNetConfig.tiny(in_channels=8)
    spec = ToMeSpec(n_frames=4, local_ratio=0.5, merge_global=True,
                    global_ratio=0.5, max_downsample=2)
    unet = UNet2DCondition(cfg, tome_spec=spec)
    key = jax.random.PRNGKey(0)
    cs = 4
    half = jax.random.normal(key, (cs, 16, 16, 8))
    full = jnp.concatenate([half, half], axis=0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2 * cs, 77, cfg.context_dim))
    params = jax.jit(unet.init)(key, full, jnp.asarray(1.0), ctx)

    kw = dict(randf=jnp.int32(1), flip=jnp.bool_(False))
    eps_ref, banks_ref = unet.apply(params, full, jnp.asarray(500.0), ctx,
                                    use_global=False, **kw)
    eps_dd, banks_dd = unet.apply(params, half, jnp.asarray(500.0), ctx,
                                  use_global=False, cfg_dedup=True, **kw)
    np.testing.assert_array_equal(np.asarray(eps_dd), np.asarray(eps_ref))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), banks_dd, banks_ref)

    # bank-carrying slot (global merge active)
    eps_ref2, nb_ref = unet.apply(params, full, jnp.asarray(400.0), ctx,
                                  banks=banks_ref, use_global=True, **kw)
    eps_dd2, nb_dd = unet.apply(params, half, jnp.asarray(400.0), ctx,
                                banks=banks_ref, use_global=True,
                                cfg_dedup=True, **kw)
    np.testing.assert_array_equal(np.asarray(eps_dd2), np.asarray(eps_ref2))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), nb_dd, nb_ref)
