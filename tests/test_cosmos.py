"""Cosmos-equivalent modules: EDM solvers, DiT shapes, FSQ round-trips,
conditioner CFG, guardrails."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.cosmos.conditioner import (
    ConditionField,
    GeneralConditioner,
)
from tclight_tpu.cosmos.dit import DiTConfig, GeneralDIT, make_edm_denoiser
from tclight_tpu.cosmos.edm import EDMScaling, rho_timesteps, sample_edm
from tclight_tpu.cosmos.fsq import (
    CausalDiscreteVideoTokenizer,
    FSQuantizer,
    TokenizerConfig,
    haar_patch_3d,
    haar_unpatch_3d,
)
from tclight_tpu.cosmos.guardrails import (
    Blocklist,
    GuardrailRunner,
    presets_text,
    presets_video,
)


def test_rho_timesteps():
    ts = rho_timesteps(80.0, 0.002, 10)
    assert ts[0] == pytest.approx(80.0, rel=1e-5)
    assert ts[-2] == pytest.approx(0.002, rel=1e-4)
    assert ts[-1] == 0.0
    assert (np.diff(ts) < 0).all()


def test_edm_scaling_consistency():
    s = EDMScaling(0.5)
    c_skip, c_out, c_in, c_noise = s(jnp.asarray([1.0]))
    # boundary-condition identity: c_skip^2 + (c_out/sigma_data)^2 * ... =>
    # at least verify smooth values and perfect-denoiser interpolation
    assert 0 < float(c_skip[0]) < 1
    assert float(c_in[0]) == pytest.approx(1 / np.sqrt(1 + 0.25), rel=1e-5)


@pytest.mark.parametrize("solver", ["euler", "heun", "multistep"])
def test_edm_sampler_recovers_x0(solver):
    x0_true = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 4, 4, 2)).astype(np.float32)
    )

    def x0_fn(x, sigma):
        return x0_true

    noise = jax.random.normal(jax.random.PRNGKey(0), x0_true.shape)
    out = sample_edm(x0_fn, noise, rho_timesteps(n=20), solver=solver)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=1e-3)


@pytest.mark.slow
def test_dit_forward_shapes():
    cfg = DiTConfig.tiny()
    model = GeneralDIT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 10, cfg.context_dim))
    c_noise = jnp.asarray([0.1, 0.5])
    params = model.init(jax.random.PRNGKey(0), x, c_noise, ctx)
    out = model.apply(params, x, c_noise, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dit_edm_denoiser_wrap():
    cfg = DiTConfig.tiny()
    model = GeneralDIT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 10, cfg.context_dim))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0.1]), ctx)
    x0_fn = make_edm_denoiser(model, params, ctx)
    out = x0_fn(x, 1.0)
    assert out.shape == x.shape


def test_fsq_quantizer_roundtrip(rng):
    q = FSQuantizer((8, 5, 5))
    assert q.codebook_size == 200
    z = jnp.asarray(rng.standard_normal((100, 3)).astype(np.float32) * 2)
    codes = q.quantize(z)
    idx = q.codes_to_indices(codes)
    assert int(idx.min()) >= 0 and int(idx.max()) < 200
    back = q.indices_to_codes(idx)
    np.testing.assert_allclose(np.asarray(back), np.asarray(codes), atol=1e-5)


def test_haar_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 3)).astype(np.float32))
    patched = haar_patch_3d(x, 1)
    assert patched.shape == (1, 2, 4, 4, 24)
    back = haar_unpatch_3d(patched, 1)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_video_tokenizer_shapes(rng):
    cfg = TokenizerConfig.tiny()
    model = CausalDiscreteVideoTokenizer(cfg)
    video = jnp.asarray(rng.uniform(size=(1, 4, 8, 8, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    recon, idx = model.apply(params, video)
    assert recon.shape == video.shape
    assert idx.shape == (1, 2, 4, 4)
    dec = model.apply(params, idx, method=CausalDiscreteVideoTokenizer.decode_indices)
    assert dec.shape == video.shape


def test_conditioner_cfg_pair():
    embed = lambda x: jnp.asarray(x, jnp.float32)
    cond_fields = {
        "crossattn": ConditionField(embed, dropout_rate=0.2),
        "fps": ConditionField(embed, dropout_rate=0.0),
    }
    c = GeneralConditioner(cond_fields)
    inputs = {"crossattn": np.ones((2, 4, 8), np.float32),
              "fps": np.full((2, 1), 24.0, np.float32)}
    cond, uncond = c.get_condition_uncondition(inputs)
    np.testing.assert_allclose(np.asarray(cond.crossattn_emb), 1.0)
    np.testing.assert_allclose(np.asarray(uncond.crossattn_emb), 0.0)
    np.testing.assert_allclose(np.asarray(uncond.extras["fps"]), 24.0)


def test_guardrails():
    runner = presets_text()
    assert runner.is_safe("a beautiful sunset over the ocean").is_safe
    assert not runner.is_safe("graphic GORE everywhere").is_safe
    bl = Blocklist(["exploding"])
    assert not bl("things keep explode-ing... exploded!").is_safe  # lemma match
    video_runner = presets_video()
    frames = np.zeros((2, 8, 8, 3), np.float32)
    out = video_runner.postprocess(frames)
    np.testing.assert_allclose(out, frames)


@pytest.mark.slow
def test_latent_diffusion_decoder():
    """Token-conditioned decoder: generated latents depend on the AR token
    stream (channel-concat conditioning, network.py:98-163)."""
    from tclight_tpu.cosmos.diffusion_decoder import build_tiny_decoder

    dec = build_tiny_decoder()
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    tokens_a = jnp.zeros((1, 4, 4, 4), jnp.int32)
    tokens_b = jnp.full((1, 4, 4, 4), 7, jnp.int32)
    out_a = dec(tokens_a, ctx, latent_shape=(4, 8, 8, 4))
    assert out_a.shape == (1, 4, 8, 8, 4)
    assert np.isfinite(np.asarray(out_a)).all()
    # zero-init token embedder: conditioning starts neutral but the
    # pathway must be live — perturb the embedder and expect different
    # generations for different tokens
    import jax as _jax

    params = _jax.tree_util.tree_map(lambda a: a, dec.params)
    emb = np.asarray(
        params["params"]["token_embedder"]["embedding"])
    emb = emb + np.random.default_rng(0).normal(0, 0.5, emb.size).reshape(
        emb.shape).astype(emb.dtype)
    params["params"]["token_embedder"]["embedding"] = jnp.asarray(emb)
    dec.params = params
    out_a2 = dec(tokens_a, ctx, latent_shape=(4, 8, 8, 4))
    out_b = dec(tokens_b, ctx, latent_shape=(4, 8, 8, 4))
    assert np.abs(np.asarray(out_a2) - np.asarray(out_b)).max() > 1e-5
