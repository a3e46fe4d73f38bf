"""Multi-chip execution of the TC-Light hot loops.

The reference scales by process dispatch only (one video per GPU,
scripts/relight.sh; SURVEY §2.8). Here a single video scales across a TPU
mesh:

- `build_parallel_denoise_step`: xy-plane denoising with chunk slots
  executed in *rounds* of `data`-axis size — slots within a round run in
  parallel (sharded over 'data'), the VidToMe global token bank advances
  between rounds (a TPU-native redesign of the reference's strictly
  sequential chunk loop: same bank memory, one bank update per round
  instead of per chunk). Tensor parallelism comes from 'model'-axis
  sharded parameters (see parallel/mesh.shard_params); XLA inserts the
  all-gathers/reduce-scatters over ICI.

- `build_sharded_uvt_step` / `build_sharded_exposure_step`: the post-
  optimization training steps with the frame batch sharded over 'data'
  and parameters replicated (gradients psum'd by XLA).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "build_parallel_denoise_step",
    "build_cp_dit_forward",
    "build_sharded_uvt_step",
    "build_sharded_exposure_step",
    "pad_plans_to_rounds",
]


def build_cp_dit_forward(model, mesh: Mesh):
    """Context-parallel GeneralDIT forward: the video's frame axis — and
    through the 3D patchify, the token axis — is sharded over 'data'.

    The reference only carries CP as a Megatron recipe knob
    (cosmos1/models/diffusion/nemo/inference/general.py:252
    `context_parallel_size`, SURVEY §2.8); here it is a real execution
    mode: each device holds T/cp of the video tokens, runs the DiT blocks
    on its shard, and XLA inserts the K/V all-gathers that full self-
    attention over the sharded sequence requires (ring-attention is the
    follow-up if single-device K/V ever exceeds HBM).

    fwd(params, x (B, T, H, W, C), c_noise (B,), context (B, S, Dc))
    -> (B, T, H, W, C_out), sharded like x. T must be divisible by the
    'data' axis size (pad frames to a multiple upstream).
    """
    x_sh = NamedSharding(mesh, P(None, "data"))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(rep, x_sh, rep, rep),
        out_shardings=x_sh,
    )
    def fwd(params, x, c_noise, context):
        return model.apply(params, x, c_noise, context)

    return fwd


def pad_plans_to_rounds(plan_idx, plan_valid, round_size: int):
    """(slots, cs) plans -> (rounds, round_size, cs), padding with invalid
    slots."""
    import numpy as np

    slots = plan_idx.shape[0]
    rounds = -(-slots // round_size)
    pad = rounds * round_size - slots
    if pad:
        plan_idx = np.concatenate(
            [plan_idx, np.zeros((pad,) + plan_idx.shape[1:], plan_idx.dtype)]
        )
        plan_valid = np.concatenate(
            [plan_valid, np.zeros((pad,) + plan_valid.shape[1:], bool)]
        )
    return (
        plan_idx.reshape(rounds, round_size, -1),
        plan_valid.reshape(rounds, round_size, -1),
    )


def build_parallel_denoise_step(unet, chunk_size: int, guidance: float,
                                mesh: Mesh):
    """Jitted xy denoise step over round-grouped chunk plans.

    step(x, concat_conds, (uncond, cond), t, plan_idx (R, rs, cs),
         plan_valid, randfs (R, rs), flips (R, rs)) -> noises (N, h, w, c)
    """
    cs = chunk_size
    rs_sharding = NamedSharding(mesh, P("data"))

    def pred_chunk(params, x_c, cc_c, embeds, t, randf, flip, banks, use_global):
        latent = jnp.concatenate([x_c, x_c], axis=0)
        cc = jnp.concatenate([cc_c, cc_c], axis=0)
        inp = jnp.concatenate([latent, cc], axis=-1).astype(unet.config.dtype)
        uncond, cond = embeds
        ctx = jnp.concatenate(
            [jnp.repeat(uncond, cs, axis=0), jnp.repeat(cond, cs, axis=0)], axis=0
        ).astype(unet.config.dtype)
        eps, banks = unet.apply(
            params, inp, t, ctx, randf=randf, flip=flip, banks=banks,
            use_global=use_global,
        )
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + guidance * (eps_c - eps_u), banks

    def run_round(params, x, cc_all, embeds, t, idx, valid, randfs, flips,
                  banks, use_global):
        # idx: (rs, cs) — shard the round axis over 'data'
        idx = jax.lax.with_sharding_constraint(idx, rs_sharding)
        x_r = x[idx]          # (rs, cs, h, w, c)
        cc_r = cc_all[idx]
        eps, new_banks = jax.vmap(
            pred_chunk, in_axes=(None, 0, 0, None, None, 0, 0, None, None)
        )(params, x_r, cc_r, embeds, t, randfs, flips, banks, use_global)
        # bank advances once per round: take the last slot's bank
        banks = jax.tree.map(lambda b: b[-1], new_banks)
        return eps, banks

    def step(params, x, concat_conds, embeds, t, plan_idx, plan_valid,
             randfs, flips):
        n = x.shape[0]
        noises = jnp.zeros_like(x)

        def scatter(noises, eps, idx, valid):
            flat_idx = jnp.where(valid, idx, n).reshape(-1)
            return noises.at[flat_idx].set(
                eps.reshape((-1,) + eps.shape[2:]), mode="drop"
            )

        eps0, banks = run_round(
            params, x, concat_conds, embeds, t, plan_idx[0], plan_valid[0],
            randfs[0], flips[0], None, False,
        )
        noises = scatter(noises, eps0, plan_idx[0], plan_valid[0])

        if plan_idx.shape[0] > 1:
            def body(carry, inp):
                noises, banks = carry
                idx, valid, randf, flip = inp
                eps, banks = run_round(
                    params, x, concat_conds, embeds, t, idx, valid, randf,
                    flip, banks, True,
                )
                return (scatter(noises, eps, idx, valid), banks), None

            (noises, banks), _ = jax.lax.scan(
                body, (noises, banks),
                (plan_idx[1:], plan_valid[1:], randfs[1:], flips[1:]),
            )
        return noises

    return jax.jit(step)


def build_sharded_uvt_step(mesh: Mesh, cfg, h: int, w: int,
                           warp_radius: int | None = None):
    """One UVT training step with the frame batch sharded over 'data'.

    The loss is pipeline.postopt.uvt_loss — the SAME implementation the
    single-device epoch scan runs; this builder only adds the mesh and the
    optimizer step.

    step(features (P,3), opt_state, frames (N,H,W,3), past_flows, masks,
         tables, idxs (B,), bmask (B,)) -> (features, opt_state, loss)
    """
    from tclight_tpu.pipeline.postopt import uvt_loss

    tx = optax.adam(learning_rate=cfg.feature_lr, eps=1e-15)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(features, opt_state, frames, past_flows, masks, tables, idxs,
             bmask):
        loss, grads = jax.value_and_grad(uvt_loss)(
            features, frames, past_flows, masks, tables, idxs, bmask,
            cfg, warp_radius, h, w, mesh,
        )
        updates, opt_state = tx.update(grads, opt_state, features)
        features = optax.apply_updates(features, updates)
        return features, opt_state, loss

    return step, tx


def build_sharded_exposure_step(mesh: Mesh, cfg, lr_schedule,
                                warp_radius: int | None = None):
    """One exposure-alignment step, frame batch sharded over 'data'; loss
    shared with pipeline.postopt (exposure_loss)."""
    from tclight_tpu.pipeline.postopt import exposure_loss

    tx = optax.adam(learning_rate=lr_schedule)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(exposure, opt_state, frames, past_flows, masks, idxs, bmask):
        loss, grads = jax.value_and_grad(exposure_loss)(
            exposure, frames, past_flows, masks, idxs, bmask, cfg,
            warp_radius, mesh,
        )
        updates, opt_state = tx.update(grads, opt_state, exposure)
        exposure = optax.apply_updates(exposure, updates)
        return exposure, opt_state, loss

    return step, tx
