import numpy as np
import jax.numpy as jnp
import pytest

from tclight_tpu.models.pixtral import (
    build_tiny_vlm,
    prepare_dialog_tokens,
)
from tclight_tpu.pipeline.iclight import DummyTokenizer


@pytest.mark.slow
def test_vlm_chat_completion_runs():
    vlm = build_tiny_vlm()
    image = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    )
    n_patches = (64 // 16) ** 2
    tok = DummyTokenizer(vocab_size=200)
    ids = prepare_dialog_tokens(tok, n_patches)
    assert (ids == 10).sum() == n_patches
    out = vlm.chat_completion(ids, image, max_gen_len=5, temperature=0.5)
    assert out.shape[1] == 5
    assert ((out >= 0) & (out < vlm.cfg.vocab_size)).all()


def test_vlm_image_changes_output_distribution():
    vlm = build_tiny_vlm()
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    tok = DummyTokenizer(vocab_size=200)
    ids = prepare_dialog_tokens(tok, 16)
    e1 = vlm.embed_vision_language(ids, img1)
    e2 = vlm.embed_vision_language(ids, img2)
    assert np.abs(np.asarray(e1) - np.asarray(e2)).max() > 1e-4
