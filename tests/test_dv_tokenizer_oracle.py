"""Discrete video tokenizer checkpoint-fidelity parity vs the reference.

Builds the reference `CausalDiscreteVideoTokenizer`
(cosmos1/models/autoregressive/tokenizer/networks.py:28) on CPU,
random-initializes it, converts the state dict with
`convert_dv_tokenizer`, and compares encode indices/codes and decoded
video — the proof that real Cosmos DV tokenizer checkpoints (the
encoder/decoder JIT state dicts, discrete_video.py:305-349) load
losslessly into the Flax rebuild."""

from __future__ import annotations

import numpy as np
import pytest
import torch

from _ref_oracle import ref_import
from _te_stub import install_te_stub

import jax.numpy as jnp

from tclight_tpu.cosmos.convert_dv import convert_dv_tokenizer
from tclight_tpu.cosmos.dv_tokenizer import (
    CausalDiscreteVideoTokenizer,
    DiscreteVideoFSQTokenizer,
    DVTokenizerConfig,
    FSQuantizer,
    patcher3d,
    unpatcher3d,
)

TINY = dict(
    z_channels=8, z_factor=1, embedding_dim=6,
    channels=16, channels_mult=[1, 1, 2], num_res_blocks=1,
    attn_resolutions=[16], dropout=0.0, in_channels=3, out_channels=3,
    resolution=32, patch_size=2, patch_method="haar", num_groups=1,
    legacy_mode=False, spatial_compression=8, temporal_compression=4,
    levels=[8, 8, 8, 5, 5, 5], name="tiny-dv",
)


def _tiny_pair(seed=0):
    install_te_stub()   # provides the cosmos1.utils.log import stub
    ref_nets = ref_import("cosmos1.models.autoregressive.tokenizer.networks")
    torch.manual_seed(seed)
    ref = ref_nets.CausalDiscreteVideoTokenizer(**TINY).eval()
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    cfg = DVTokenizerConfig.tiny()
    params = convert_dv_tokenizer(sd)
    return ref, CausalDiscreteVideoTokenizer(cfg), params


def _video(b=1, t=5, h=32, w=32, seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)


def test_patcher3d_matches_reference():
    ref_patch = ref_import(
        "cosmos1.models.autoregressive.tokenizer.patching")
    x = _video(b=2, t=5, h=8, w=8)
    for method in ("haar", "rearrange"):
        p = ref_patch.Patcher3D(patch_size=2, patch_method=method)
        ref = p(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
        ours = np.asarray(patcher3d(jnp.asarray(x), 2, method))
        np.testing.assert_allclose(
            ours.transpose(0, 4, 1, 2, 3), ref, rtol=1e-5, atol=1e-6)
        u = ref_patch.UnPatcher3D(patch_size=2, patch_method=method)
        ref_rec = u(torch.from_numpy(ref)).numpy()
        ours_rec = np.asarray(unpatcher3d(jnp.asarray(ours), 2, method))
        np.testing.assert_allclose(
            ours_rec.transpose(0, 4, 1, 2, 3), ref_rec, rtol=1e-5,
            atol=1e-6)
        np.testing.assert_allclose(ref_rec.transpose(0, 2, 3, 4, 1), x,
                                   rtol=1e-4, atol=1e-5)


def test_fsq_quantizer_matches_reference():
    ref_q = ref_import(
        "cosmos1.models.autoregressive.tokenizer.quantizers")
    levels = [8, 8, 8, 5, 5, 5]
    ref = ref_q.FSQuantizer(levels)
    ours = FSQuantizer(levels)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, 6, 3, 4, 4)).astype(np.float32) * 2
    idx_t, out_t, _ = ref(torch.from_numpy(z))
    zj = jnp.asarray(z.transpose(0, 2, 3, 4, 1))
    idx_j, out_j, _ = ours(zj)
    np.testing.assert_array_equal(np.asarray(idx_j), idx_t.numpy())
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 4, 1, 2, 3), out_t.numpy(),
        rtol=1e-5, atol=1e-6)
    # index round-trip
    codes = ours.indices_to_codes(idx_j)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(out_j),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_dv_tokenizer_encode_decode_matches_reference():
    ref, module, params = _tiny_pair()
    x = _video()
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    with torch.no_grad():
        idx_t, quant_t, _ = ref.encode(xt)
        rec_t = ref.decode(quant_t).numpy()

    idx_j, quant_j, _ = module.apply(
        params, jnp.asarray(x),
        method=CausalDiscreteVideoTokenizer.encode)
    np.testing.assert_array_equal(np.asarray(idx_j), idx_t.numpy())
    np.testing.assert_allclose(
        np.asarray(quant_j).transpose(0, 4, 1, 2, 3), quant_t.numpy(),
        rtol=2e-4, atol=2e-4)

    rec_j = module.apply(params, quant_j,
                         method=CausalDiscreteVideoTokenizer.decode)
    np.testing.assert_allclose(
        np.asarray(rec_j).transpose(0, 4, 1, 2, 3), rec_t,
        rtol=2e-4, atol=2e-4)
    # latent shape contract: T 5 -> 2, HW 32 -> 4 (patch 2 x downs)
    assert np.asarray(idx_j).shape == (1, 2, 4, 4)
    assert rec_j.shape == (1, 5, 32, 32, 3)


@pytest.mark.slow
def test_chunked_wrapper_matches_per_chunk():
    """discrete_video.py:100-155 semantics: T splits into causal pixel
    chunks, each tokenized independently; the batched wrapper must equal
    chunk-by-chunk calls."""
    _, module, params = _tiny_pair(seed=2)
    tok = DiscreteVideoFSQTokenizer(
        module, params, pixel_chunk_duration=5,
        compression_ratio=(4, 8, 8), max_enc_batch_size=2,
        max_dec_batch_size=1)
    video = jnp.asarray(_video(b=1, t=10, h=16, w=16, seed=3))
    quant, idx = tok.encode(video)
    assert idx.shape == (1, 4, 2, 2)
    # manual per-chunk
    for n, sl in enumerate((slice(0, 5), slice(5, 10))):
        i_ref, q_ref, _ = module.apply(
            params, video[:, sl],
            method=CausalDiscreteVideoTokenizer.encode)
        np.testing.assert_array_equal(
            np.asarray(idx[:, 2 * n:2 * n + 2]), np.asarray(i_ref))
        np.testing.assert_allclose(
            np.asarray(quant[:, 2 * n:2 * n + 2]), np.asarray(q_ref),
            rtol=1e-5, atol=1e-6)
    rec = tok.decode(idx)
    assert rec.shape == (1, 10, 16, 16, 3)
    rec0 = module.apply(params, idx[:, :2],
                        method=CausalDiscreteVideoTokenizer.decode_indices)
    np.testing.assert_allclose(np.asarray(rec[:, :5]), np.asarray(rec0),
                               rtol=1e-5, atol=1e-6)
