"""Cosmos-1.0-equivalent library modules (SURVEY §2.6).

The reference vendors the full NVIDIA Cosmos inference stack; only the
Pixtral prompt upsampler is on TC-Light's hot path (implemented in
models/ar_transformer.py + models/pixtral.py), but the rest belongs to the
capability surface: a video DiT (dit.py), the EDM diffusion core (edm.py),
dropout-CFG conditioning (conditioner.py), the FSQ discrete video tokenizer
with Haar-wavelet patching (fsq.py), a T5 text-encoder wrapper (t5.py), and
the guardrail runner (guardrails.py).
"""
