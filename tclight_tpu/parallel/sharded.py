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

from tclight_tpu.ops.color import SH2RGB
from tclight_tpu.ops.flow import warp_flow
from tclight_tpu.ops.losses import relaxed_ms_ssim, tv_loss

__all__ = [
    "build_parallel_denoise_step",
    "build_sharded_uvt_step",
    "build_sharded_exposure_step",
    "pad_plans_to_rounds",
]


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


def build_sharded_uvt_step(mesh: Mesh, cfg, h: int, w: int):
    """One UVT training step with the frame batch sharded over 'data'.

    step(features (P,3), opt_state, frames (B,H,W,3), pre_frames,
         past_flows, masks, inv_cur (B*H*W,), inv_pre, valid (B,))
    -> (features, opt_state, loss)
    """
    tx = optax.adam(learning_rate=cfg.feature_lr, eps=1e-15)
    batch_sh = NamedSharding(mesh, P("data"))

    def render(features, inv, b):
        rgb = jnp.clip(SH2RGB(features)[inv], 0.0, 1.0)
        return rgb.reshape(b, h, w, 3)

    def loss_fn(features, frames, past_flows, masks, inv_cur, inv_pre, valid):
        b = frames.shape[0]
        images = render(features, inv_cur, b)
        pre_images = render(features, inv_pre, b)
        warped = warp_flow(pre_images, past_flows)
        m = masks[..., None] if masks.ndim == 3 else masks
        flow_per = jnp.mean(jnp.abs(warped * m - images * m), axis=(1, 2, 3))
        vw = valid.astype(jnp.float32)
        loss_flow = jnp.sum(flow_per * vw) / jnp.maximum(jnp.sum(vw), 1.0)
        dssim = 1.0 - relaxed_ms_ssim(
            images, frames, start_level=cfg.ms_ssim_start_level, data_range=1.0,
            size_average=True,
            weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)[: cfg.ms_ssim_levels],
        )
        return (
            (1 - cfg.lambda_flow) * dssim * cfg.lambda_dssim
            + cfg.lambda_flow * loss_flow
            + tv_loss(images, cfg.lambda_tv)
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(features, opt_state, frames, past_flows, masks, inv_cur, inv_pre, valid):
        frames = jax.lax.with_sharding_constraint(frames, batch_sh)
        loss, grads = jax.value_and_grad(loss_fn)(
            features, frames, past_flows, masks, inv_cur, inv_pre, valid
        )
        updates, opt_state = tx.update(grads, opt_state, features)
        features = optax.apply_updates(features, updates)
        return features, opt_state, loss

    return step, tx


def build_sharded_exposure_step(mesh: Mesh, cfg, lr_schedule):
    """One exposure-alignment step, frame batch sharded over 'data'."""
    tx = optax.adam(learning_rate=lr_schedule)
    batch_sh = NamedSharding(mesh, P("data"))

    def apply_exposure(frames, exposure):
        out = jnp.einsum("bhwc,bcd->bhwd", frames, exposure[:, :3, :3])
        return jnp.clip(out + exposure[:, None, None, :3, 3], 0.0, 1.0)

    def loss_fn(exposure, idxs, frames, pre_frames, past_flows, masks, valid):
        images = apply_exposure(frames, exposure[idxs])
        pre_images = apply_exposure(pre_frames, exposure[jnp.maximum(idxs - 1, 0)])
        l1 = jnp.mean(jnp.abs(images - frames))
        dssim = 1.0 - relaxed_ms_ssim(
            images, frames, start_level=cfg.ms_ssim_start_level, data_range=1.0,
            weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)[: cfg.ms_ssim_levels],
        )
        photo = l1 * (1 - cfg.lambda_dssim) + dssim * cfg.lambda_dssim
        warped = warp_flow(pre_images, past_flows)
        m = masks[..., None] if masks.ndim == 3 else masks
        flow_per = jnp.mean(jnp.abs(warped * m - images * m), axis=(1, 2, 3))
        vw = (valid & (idxs > 0)).astype(jnp.float32)
        loss_flow = jnp.sum(flow_per * vw) / jnp.maximum(jnp.sum(vw), 1.0)
        return (1 - cfg.lambda_flow) * photo + cfg.lambda_flow * loss_flow

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(exposure, opt_state, idxs, frames, pre_frames, past_flows, masks, valid):
        frames = jax.lax.with_sharding_constraint(frames, batch_sh)
        loss, grads = jax.value_and_grad(loss_fn)(
            exposure, idxs, frames, pre_frames, past_flows, masks, valid
        )
        updates, opt_state = tx.update(grads, opt_state, exposure)
        exposure = optax.apply_updates(exposure, updates)
        return exposure, opt_state, loss

    return step, tx
