"""Offload strategies + CV tokenizer wrapper + t2w/v2w CLI smoke tests
(reference: world_generation_pipeline.py:56-645, pretrained_vae.py:314-466,
inference/text2world.py, inference/video2world.py)."""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.cosmos.cv_tokenizer import (
    CausalContinuousVideoTokenizer,
    VideoTokenizer,
    cv_config_8x8x8,
)
from tclight_tpu.cosmos.offload import HostParams, OffloadPolicy


def _tiny_cv():
    # 3 levels: the mirrored upsample schedule (legacy_mode=False) only
    # places temporal upsamples at reversed levels 1..n_tup, so a 2-level
    # decoder could never undo a temporal downsample
    cfg = cv_config_8x8x8(
        channels=8, channels_mult=(1, 1, 1), num_res_blocks=1,
        attn_resolutions=(8,), resolution=32, patch_size=2,
        spatial_compression=8, temporal_compression=4,
        z_channels=4, embedding_dim=4)
    module = CausalContinuousVideoTokenizer(cfg)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)))
    return module, params


def test_host_params_offload_roundtrip():
    params = {"w": jnp.arange(8.0), "b": jnp.ones((2, 2))}
    hp = HostParams(params, offload=True)
    dev = hp.acquire()
    assert isinstance(dev["w"], jax.Array)
    np.testing.assert_allclose(np.asarray(dev["w"]), np.arange(8.0))
    hp.release()
    # released buffers are deleted; host copy survives -> re-acquire works
    dev2 = hp.acquire()
    np.testing.assert_allclose(np.asarray(dev2["b"]), np.ones((2, 2)))
    hp.release()
    # non-offloaded: release is a no-op, params stay live
    hp2 = HostParams(params, offload=False)
    d = hp2.acquire()
    hp2.release()
    np.testing.assert_allclose(np.asarray(d["w"]), np.arange(8.0))
    assert hp.nbytes == hp2.nbytes > 0


@pytest.mark.slow
def test_cv_tokenizer_chunked_wrapper_matches_per_chunk():
    module, params = _tiny_cv()
    tok = VideoTokenizer(module, params, pixel_chunk_duration=5,
                         temporal_compression_factor=4,
                         max_enc_batch_size=1, max_dec_batch_size=1)
    video = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 10, 16, 16, 3)).astype(np.float32))
    lat = tok.encode(video)
    assert lat.shape == (1, 4, 2, 2, 4)
    assert tok.get_latent_num_frames(10) == 4
    assert tok.get_pixel_num_frames(4) == 10
    # chunk equality: chunk 2 encoded alone == rows 2:4 of the wrapper
    lat1 = module.apply(params, video[:, 5:10],
                        method=CausalContinuousVideoTokenizer.encode)
    np.testing.assert_allclose(np.asarray(lat[:, 2:4]), np.asarray(lat1),
                               rtol=1e-5, atol=1e-5)
    rec = tok.decode(lat)
    assert rec.shape == video.shape
    rec0 = module.apply(params, lat[:, :2],
                        method=CausalContinuousVideoTokenizer.decode)
    np.testing.assert_allclose(np.asarray(rec[:, :5]), np.asarray(rec0),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_cv_tokenizer_mean_std_normalization():
    module, params = _tiny_cv()
    mean, std = 0.3, 2.0
    tok = VideoTokenizer(module, params, pixel_chunk_duration=5,
                         temporal_compression_factor=4,
                         latent_mean=mean, latent_std=std)
    raw = VideoTokenizer(module, params, pixel_chunk_duration=5,
                         temporal_compression_factor=4)
    video = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (1, 5, 16, 16, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tok.encode(video)),
        (np.asarray(raw.encode(video)) - mean) / std, rtol=1e-5, atol=1e-6)
    lat = tok.encode(video)
    np.testing.assert_allclose(np.asarray(tok.decode(lat)),
                               np.asarray(raw.decode(raw.encode(video))),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pipeline_offload_everything_matches_resident():
    """The offloaded pipeline must match the resident one. Not bit-exact:
    numpy-held (resident) params inline as jaxpr literals while
    device_put (offloaded) params hoist as buffer arguments, and XLA
    fuses/reassociates the two programs slightly differently — a float
    ordering change, not a math change (verified: param trees and single
    DiT evals are bit-identical; the delta appears only through the
    CFG-amplified solver scan)."""
    from tclight_tpu.cosmos.dit import DiTConfig, GeneralDIT
    from tclight_tpu.cosmos.pipelines import DiffusionText2WorldPipeline

    cfg = DiTConfig.tiny()
    dit = GeneralDIT(cfg)
    shape = (1, 4, 8, 8, 4)
    ctx = np.random.default_rng(0).standard_normal(
        (1, 6, cfg.context_dim)).astype(np.float32)
    params = dit.init(jax.random.PRNGKey(0), jnp.zeros(shape),
                      jnp.asarray([0.1]), jnp.asarray(ctx))

    def mk(policy):
        return DiffusionText2WorldPipeline(
            dit=dit, dit_params=jax.tree.map(np.asarray, params),
            encode_text=lambda prompt: ctx,
            decode_fn=lambda z: np.asarray(z[..., :3]),
            n_steps=3, latent_shape=shape, offload=policy)

    out_res = mk(OffloadPolicy())("demo prompt")
    out_off = mk(OffloadPolicy.everything())("demo prompt")
    np.testing.assert_allclose(out_off, out_res, rtol=5e-3, atol=2e-3)


@pytest.mark.slow
def test_text2world_cli_smoke(tmp_path):
    import tools.text2world as t2w

    rc = t2w.main([
        "--prompt", "a tiny demo world", "--height", "32", "--width", "32",
        "--num_video_frames", "5", "--num_steps", "2",
        "--video_save_folder", str(tmp_path), "--disable_guardrail",
        "--offload_diffusion_transformer", "--offload_tokenizer",
    ])
    assert rc == 0
    assert (tmp_path / "output.mp4").exists()
    assert (tmp_path / "output.txt").read_text() == "a tiny demo world"


@pytest.mark.slow
def test_video2world_cli_smoke(tmp_path):
    import cv2

    import tools.video2world as v2w

    img = (np.random.default_rng(0).uniform(0, 255, (32, 32, 3))
           .astype(np.uint8))
    src = str(tmp_path / "cond.png")
    cv2.imwrite(src, img)
    rc = v2w.main([
        "--prompt", "pan right", "--input_image_or_video_path", src,
        "--height", "32", "--width", "32", "--num_video_frames", "5",
        "--num_steps", "2", "--video_save_folder", str(tmp_path / "out"),
        "--disable_guardrail",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "output.mp4").exists()


@pytest.mark.slow
def test_joint_image_video_tokenizer_dispatch():
    """T==1 routes to the image VAE, clips route to the chunked video
    tokenizer (pretrained_vae.py:508-606); shared-JIT variant keeps the
    T axis and applies the IMAGE mean/std pair through the shared net
    (pretrained_vae.py:589-620)."""
    from tclight_tpu.cosmos.cv_tokenizer import (
        ImageTokenizer,
        JointImageVideoTokenizer,
    )

    module, params = _tiny_cv()
    rng = np.random.default_rng(2)
    clip = jnp.asarray(rng.uniform(-1, 1, (2, 5, 16, 16, 3)).astype(np.float32))
    frame = clip[:, :1]

    # --- shared-JIT joint: one causal net, separate image/video mean/std
    joint = JointImageVideoTokenizer.shared_jit(
        module, params, image_mean_std=(0.1, 1.5), video_mean_std=(0.3, 2.0),
        pixel_chunk_duration=5, temporal_compression_factor=4)
    # clip path == video_vae directly (video mean/std)
    lat = joint.encode(clip)
    np.testing.assert_array_equal(np.asarray(lat),
                                  np.asarray(joint.video_vae.encode(clip)))
    assert lat.shape == (2, 2, 2, 2, 4)
    # T==1 path: shared net, IMAGE mean/std, T axis kept
    raw1 = module.apply(params, frame,
                        method=CausalContinuousVideoTokenizer.encode)
    np.testing.assert_allclose(np.asarray(joint.encode(frame)),
                               (np.asarray(raw1) - 0.1) / 1.5,
                               rtol=1e-5, atol=1e-6)
    lat1 = joint.encode(frame)
    assert lat1.shape[1] == 1
    rec1 = joint.decode(lat1)
    assert rec1.shape == frame.shape
    np.testing.assert_allclose(
        np.asarray(rec1),
        np.asarray(module.apply(params, lat1 * 1.5 + 0.1,
                                method=CausalContinuousVideoTokenizer.decode)),
        rtol=2e-4, atol=1e-5)   # jitted vs eager apply: fusion-order noise
    # frame accounting dispatches on 1 exactly like the reference
    assert joint.get_latent_num_frames(1) == 1
    assert joint.get_pixel_num_frames(1) == 1
    assert joint.get_latent_num_frames(10) == 4
    assert joint.get_pixel_num_frames(4) == 10
    assert joint.latent_ch == 4
    assert joint.pixel_chunk_duration == 5
    assert joint.latent_chunk_duration == 2
    assert joint.temporal_compression_factor == 4

    # --- squeeze-for-image joint: T axis dropped around a 2D image VAE.
    # Stand-in 2D VAE built from the same net via a T-axis adapter module
    # is overkill here; instead verify the squeeze contract with a spy.
    class Spy2D:
        def __init__(self):
            self.shapes = []

        def encode(self, x):
            self.shapes.append(("enc", x.shape))
            return x[..., :1]

        def decode(self, z):
            self.shapes.append(("dec", z.shape))
            return jnp.tile(z, (1, 1, 1, 3))

    spy = Spy2D()
    joint2 = JointImageVideoTokenizer(image_vae=spy, video_vae=joint.video_vae,
                                      squeeze_for_image=True)
    out = joint2.encode(frame)
    assert spy.shapes[0] == ("enc", (2, 16, 16, 3))   # T squeezed away
    assert out.shape == (2, 1, 16, 16, 1)             # T axis restored
    dec = joint2.decode(out)
    assert spy.shapes[1] == ("dec", (2, 16, 16, 1))
    assert dec.shape == (2, 1, 16, 16, 3)


@pytest.mark.slow
def test_video_tokenizer_per_chunk_mean_std():
    """Per-chunk-position mean/std (reference mean_std.pt is
    (latent_ch, latent_chunk_duration)) must broadcast per chunk, not per
    assembled video (pretrained_vae.py:343-360)."""
    module, params = _tiny_cv()
    rng = np.random.default_rng(3)
    # latent_chunk_duration = 2: distinct stats per chunk position
    mean = jnp.asarray([[[[0.1]]], [[[0.4]]]])        # (2, 1, 1, 1)
    std = jnp.asarray([[[[1.5]]], [[[2.5]]]])
    tok = VideoTokenizer(module, params, pixel_chunk_duration=5,
                         temporal_compression_factor=4,
                         latent_mean=mean, latent_std=std)
    raw = VideoTokenizer(module, params, pixel_chunk_duration=5,
                         temporal_compression_factor=4)
    video = jnp.asarray(rng.uniform(-1, 1, (1, 10, 16, 16, 3)).astype(np.float32))
    got = np.asarray(tok.encode(video))               # (1, 4, h, w, c)
    ref = np.asarray(raw.encode(video))
    m = np.asarray(mean).reshape(2, 1, 1, 1)
    s = np.asarray(std).reshape(2, 1, 1, 1)
    for chunk in range(2):
        sl = slice(2 * chunk, 2 * chunk + 2)
        np.testing.assert_allclose(got[:, sl], (ref[:, sl] - m) / s,
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tok.decode(tok.encode(video))),
                               np.asarray(raw.decode(raw.encode(video))),
                               rtol=1e-4, atol=1e-5)
