"""Dropout-based CFG conditioning framework.

Rebuild of cosmos1/models/diffusion/conditioner.py (`GeneralConditioner`
:137-294, `VideoConditioner`/`VideoExtendConditioner` :306-323,
`BaseVideoCondition` :110-135): each condition field has a dropout rate;
`get_condition_uncondition` produces the (cond, uncond) pair for CFG by
zeroing/dropping the input embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp

__all__ = ["ConditionField", "GeneralConditioner", "VideoCondition"]


@dataclasses.dataclass(frozen=True)
class ConditionField:
    """One conditioning input: an embedder + CFG dropout rate."""

    embed: Callable[[Any], jnp.ndarray]
    dropout_rate: float = 0.0
    null_value: float = 0.0


@dataclasses.dataclass
class VideoCondition:
    """The assembled conditioning tensors fed to the DiT."""

    crossattn_emb: jnp.ndarray | None = None
    extras: dict = dataclasses.field(default_factory=dict)


class GeneralConditioner:
    """fields: {name: ConditionField}. __call__ embeds raw inputs;
    `get_condition_uncondition` returns (cond, uncond) for CFG
    (conditioner.py:217-263)."""

    def __init__(self, fields: Mapping[str, ConditionField]):
        self.fields = dict(fields)

    def __call__(self, inputs: Mapping[str, Any], rng=None,
                 train: bool = False) -> VideoCondition:
        out = VideoCondition()
        for name, field in self.fields.items():
            if name not in inputs:
                continue
            emb = field.embed(inputs[name])
            if train and field.dropout_rate > 0 and rng is not None:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(
                    sub, 1.0 - field.dropout_rate, (emb.shape[0],)
                )
                emb = jnp.where(
                    keep.reshape((-1,) + (1,) * (emb.ndim - 1)),
                    emb, field.null_value,
                )
            if name == "crossattn":
                out.crossattn_emb = emb
            else:
                out.extras[name] = emb
        return out

    def get_condition_uncondition(
        self, inputs: Mapping[str, Any]
    ) -> tuple[VideoCondition, VideoCondition]:
        cond = self(inputs, train=False)
        uncond_inputs = {}
        for name, field in self.fields.items():
            if name not in inputs:
                continue
            # fields with dropout participate in CFG: nulled at inference
            if field.dropout_rate > 0:
                emb = field.embed(inputs[name])
                uncond_inputs[name] = jnp.full_like(emb, field.null_value)
            else:
                uncond_inputs[name] = field.embed(inputs[name])
        uncond = VideoCondition()
        for name, emb in uncond_inputs.items():
            if name == "crossattn":
                uncond.crossattn_emb = emb
            else:
                uncond.extras[name] = emb
        return cond, uncond
