"""JAX T5 encoder parity vs transformers T5EncoderModel (CPU oracle)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tclight_tpu.models.t5_encoder import T5Config, T5Encoder, convert_t5_encoder


@pytest.mark.parametrize("gated", [False, True])
def test_t5_encoder_parity(gated):
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf = HFT5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, n_layers=2,
                   n_heads=4, gated_ff=gated)
    params = convert_t5_encoder(sd, cfg)
    ours = T5Encoder(cfg)

    ids = np.array([[5, 9, 42, 17, 3, 1, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 1, 0, 0]], np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    # the wrapper zeroes padded positions (t5_text_encoder.py semantics)
    ref = ref * mask[..., None]
    np.testing.assert_allclose(got, ref, atol=2e-4)
