"""Two-stage test-time post-optimization (TC-Light's novelty), jitted.

Stage 1 — exposure alignment (generate.py:354-451): one learnable 3x4
affine color matrix per frame, optimized against (1-λf)·[(1-λd)·L1 +
λd·(1-relaxed-MS-SSIM)] + λf·flow-warped L1, with the Plenoxels log-lerp LR
schedule; the result is baked into the frames (utils/dataloader.py:38-42).

Stage 2 — Unique Video Tensor refinement (generate.py:453-533): the video
is compressed to a palette of flow-linked unique pixels (`unq_inv` from
voxelization); per-track SH-DC colors are initialized by scatter-mean and
optimized with flow + DSSIM + TV losses; the final video is a gather.

TPU design: the reference's shuffled DataLoader epochs become permuted
index arrays scanned by `lax.scan` — each *epoch* is one compiled scan, the
optimizer is optax Adam, and the UVT palette is padded to a static size.
Batches are padded to `batch_size` with masked-out entries so every step
has one shape.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tclight_tpu.ops.color import RGB2SH, SH2RGB
from tclight_tpu.ops import banded_gather as banded
from tclight_tpu.ops.flow import warp_flow
from tclight_tpu.ops.losses import relaxed_ms_ssim
from tclight_tpu.ops.schedules import expon_lr_schedule
from tclight_tpu.ops.warp_kernel import warp_flow_window

__all__ = [
    "PostOptConfig", "run_exposure_align", "run_uvt", "flow_radius",
    "exposure_loss", "uvt_loss", "uvt_gather", "uvt_render",
    "build_uvt_tables", "init_palette", "render_palette",
]


def flow_radius(flows, bucket: int = 4, cap: int = 128) -> int | None:
    """Static warp-kernel radius for a (host) flow array: ceil(max |flow|),
    rounded up to `bucket` (limits recompiles across prompts/videos).

    Returns None when max |flow| exceeds `cap`: the window warp drops taps
    beyond its radius, so rather than silently truncating large motion the
    callers fall back to the exact gather warp (radius=None)."""
    m = float(np.max(np.abs(flows))) if np.size(flows) else 0.0
    r = max(bucket, int(np.ceil(m / bucket)) * bucket)
    if r > cap:
        from tclight_tpu.utils.logging import get_logger

        get_logger().info(
            "max |flow| %.1f px exceeds the %d px window-warp cap; "
            "using the exact gather warp", m, cap)
        return None
    return r


def _warp(frames, flows, radius: int | None):
    """Warp with the TPU window kernel (scatter-free adjoint) when a static
    radius is known; fall back to the gather implementation (whose AD is
    fine on CPU) otherwise."""
    if radius is None:
        return warp_flow(frames, flows)
    from tclight_tpu.utils.device import use_pallas

    backend = "pallas" if use_pallas() else "xla"
    return warp_flow_window(frames, flows, radius, "bicubic", backend)


@dataclasses.dataclass(frozen=True)
class PostOptConfig:
    """Mirrors the reference post_opt config block
    (configs/tclight_default.yaml post_opt)."""

    epochs_exposure: int = 35
    epochs: int = 70
    batch_size: int = 16
    lambda_dssim: float = 0.2
    lambda_flow: float = 0.8
    lambda_tv: float = 0.05
    feature_lr: float = 0.05
    exposure_lr_init: float = 0.01
    exposure_lr_final: float = 0.001
    exposure_lr_delay_steps: int = 0
    exposure_lr_delay_mult: float = 0.0
    ms_ssim_start_level: int = 1
    # number of MS-SSIM pyramid levels; 5 = reference. Lower values permit
    # small test images (the 5-level pyramid needs sides > 160).
    ms_ssim_levels: int = 5


_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _ms_ssim_per_sample(a, b, cfg: PostOptConfig):
    return relaxed_ms_ssim(
        a, b, start_level=cfg.ms_ssim_start_level, data_range=1.0,
        size_average=False, weights=_MS_WEIGHTS[: cfg.ms_ssim_levels],
    )  # (B,)


def _batch_constraint(x, mesh):
    """Shard a per-batch tensor's leading axis over the mesh 'data' axis
    (no-op without a mesh). This is the ONLY multi-chip hook the loss math
    needs: XLA partitions the pixel work and psums the reductions."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*(("data",) + (None,) * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def exposure_loss(exposure, frames, past_flows, masks_bwd, idxs, bmask,
                  cfg: PostOptConfig, warp_radius=None, mesh=None):
    """The stage-1 loss (generate.py:405-430), shared verbatim between the
    single-device epoch scan and the sharded multi-chip step."""
    edited = _batch_constraint(frames[idxs], mesh)
    pre_idx = jnp.maximum(idxs - 1, 0)
    pre_edited = _batch_constraint(frames[pre_idx], mesh)
    images = _apply_exposure(edited, exposure[idxs])
    pre_images = _apply_exposure(pre_edited, exposure[pre_idx])

    # photometric vs the un-transformed edited frames
    l1_per = jnp.mean(jnp.abs(images - edited), axis=(1, 2, 3))
    dssim_per = 1.0 - _ms_ssim_per_sample(images, edited, cfg)
    loss_photo = (
        _masked_mean(l1_per, bmask) * (1 - cfg.lambda_dssim)
        + _masked_mean(dssim_per, bmask) * cfg.lambda_dssim
    )

    # flows/masks may be stored f16 on device (tunnel-compact);
    # promote the batch slice for the loss math
    warped = _warp(pre_images,
                   _batch_constraint(past_flows[idxs], mesh)
                   .astype(jnp.float32), warp_radius)
    m = _batch_constraint(masks_bwd[idxs], mesh).astype(jnp.float32)
    valid = bmask & (idxs > 0)
    flow_per = jnp.mean(jnp.abs(warped * m - images * m), axis=(1, 2, 3))
    loss_flow = _masked_mean(flow_per, valid)
    return (1 - cfg.lambda_flow) * loss_photo + cfg.lambda_flow * loss_flow


def _epoch_batches(n: int, batch_size: int, rng: np.random.Generator):
    """Shuffled, padded batch indices for one epoch: (n_batches, B) + mask."""
    perm = rng.permutation(n)
    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n
    idxs = np.concatenate([perm, np.zeros(pad, np.int64)])
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return (
        idxs.reshape(n_batches, batch_size).astype(np.int32),
        mask.reshape(n_batches, batch_size),
    )


def _masked_mean(x_sum_per_sample, weight):
    w = weight.astype(jnp.float32)
    return jnp.sum(x_sum_per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def _apply_exposure(frames: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    """frames (B,H,W,3) x exposure (B,3,4) -> clamped affine-mapped frames."""
    out = jnp.einsum("bhwc,bcd->bhwd", frames, exposure[:, :3, :3])
    out = out + exposure[:, None, None, :3, 3]
    return jnp.clip(out, 0.0, 1.0)


# Compiled epoch functions cached across calls: a Generator serves many
# prompts/videos per process, and jax.jit's cache keys on the function
# object — rebuilding the closures every call would recompile (~tens of
# seconds on the remote TPU toolchain) for identical shapes.
_EPOCH_FN_CACHE: dict = {}


def _exposure_epoch_builder(cfg: PostOptConfig, warp_radius, mesh,
                            total_iters: int):
    key = ("exposure", cfg, warp_radius, id(mesh) if mesh is not None else None,
           total_iters)
    if key in _EPOCH_FN_CACHE:
        return _EPOCH_FN_CACHE[key]
    lr_fn = expon_lr_schedule(
        cfg.exposure_lr_init, cfg.exposure_lr_final,
        cfg.exposure_lr_delay_steps, cfg.exposure_lr_delay_mult, total_iters,
    )
    tx = optax.adam(learning_rate=lr_fn)

    def loss_fn(exposure, frames, past_flows, masks_bwd, idxs, bmask):
        return exposure_loss(exposure, frames, past_flows, masks_bwd, idxs,
                             bmask, cfg, warp_radius, mesh)

    @jax.jit
    def run_epoch(exposure, opt_state, frames, past_flows, masks_bwd,
                  idxs_all, masks_all):
        def body(carry, inp):
            exposure, opt_state = carry
            idxs, bmask = inp
            loss, grads = jax.value_and_grad(loss_fn)(
                exposure, frames, past_flows, masks_bwd, idxs, bmask)
            updates, opt_state = tx.update(grads, opt_state, exposure)
            exposure = optax.apply_updates(exposure, updates)
            return (exposure, opt_state), loss

        (exposure, opt_state), losses = jax.lax.scan(
            body, (exposure, opt_state), (idxs_all, masks_all)
        )
        return exposure, opt_state, losses

    _EPOCH_FN_CACHE[key] = (tx, run_epoch)
    return tx, run_epoch


def _uvt_epoch_builder(cfg: PostOptConfig, warp_radius, mesh, h: int, w: int,
                       feature_lr: float):
    key = ("uvt", cfg, warp_radius, id(mesh) if mesh is not None else None,
           h, w, feature_lr)
    if key in _EPOCH_FN_CACHE:
        return _EPOCH_FN_CACHE[key]
    tx = optax.adam(learning_rate=feature_lr, eps=1e-15)

    def loss_fn(features, frames, past_flows, masks_bwd, tables, idxs, bmask):
        return uvt_loss(features, frames, past_flows, masks_bwd, tables,
                        idxs, bmask, cfg, warp_radius, h, w, mesh)

    @jax.jit
    def run_epoch(features, opt_state, frames, past_flows, masks_bwd,
                  tables, idxs_all, masks_all):
        def body(carry, inp):
            features, opt_state = carry
            idxs, bmask = inp
            loss, grads = jax.value_and_grad(loss_fn)(
                features, frames, past_flows, masks_bwd, tables,
                idxs, bmask)
            updates, opt_state = tx.update(grads, opt_state, features)
            features = optax.apply_updates(features, updates)
            return (features, opt_state), loss

        (features, opt_state), losses = jax.lax.scan(
            body, (features, opt_state), (idxs_all, masks_all)
        )
        return features, opt_state, losses

    _EPOCH_FN_CACHE[key] = (tx, run_epoch)
    return tx, run_epoch


def run_exposure_align(
    frames: jnp.ndarray,       # (N, H, W, 3) in [0, 1]
    past_flows: jnp.ndarray,   # (N, H, W, 2)
    masks_bwd: jnp.ndarray,    # (N, H, W) or (N, H, W, 1) soft masks
    cfg: PostOptConfig,
    seed: int = 0,
    warp_radius: int | None = None,
    mesh=None,
) -> tuple[jnp.ndarray, jnp.ndarray, np.ndarray, np.ndarray]:
    """Optimize per-frame affine exposure, bake it in. Returns (aligned
    frames, exposure (N,3,4), loss history, per-epoch wall seconds).
    With `mesh`, the frame batch is sharded over the 'data' axis."""
    n = frames.shape[0]
    if masks_bwd.ndim == 3:
        masks_bwd = masks_bwd[..., None]
    exposure0 = jnp.broadcast_to(jnp.eye(3, 4), (n, 3, 4)).astype(jnp.float32)

    total_iters = max(cfg.epochs_exposure * n // cfg.batch_size, 1)
    tx, run_epoch = _exposure_epoch_builder(cfg, warp_radius, mesh, total_iters)

    rng = np.random.default_rng(seed)
    exposure = exposure0
    opt_state = tx.init(exposure)
    frames = jnp.asarray(frames)
    past_flows = jnp.asarray(past_flows)
    masks_bwd_j = jnp.asarray(masks_bwd)
    history = []
    epoch_times: list[float] = []
    # epochs are dispatched back-to-back and synced ONCE: a per-epoch
    # loss fetch costs a tunnel round-trip (axon d2h latency), which at
    # 35/70-epoch budgets was a visible fraction of the epoch wall.
    # Epoch 1 is synced separately so its jit compile stays out of the
    # steady-state per-epoch numbers bench.py extrapolates from.
    t0 = time.perf_counter()
    for e in range(cfg.epochs_exposure):
        idxs_all, masks_all = _epoch_batches(n, cfg.batch_size, rng)
        exposure, opt_state, losses = run_epoch(
            exposure, opt_state, frames, past_flows, masks_bwd_j,
            jnp.asarray(idxs_all), jnp.asarray(masks_all)
        )
        history.append(losses)  # device array; fetched after the loop
        if e == 0:
            np.asarray(losses)  # real host sync (axon block_until_ready
            # can return early, PERF_NOTES)
            epoch_times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
    if cfg.epochs_exposure > 1:
        np.asarray(history[-1])
        steady = (time.perf_counter() - t0) / (cfg.epochs_exposure - 1)
        epoch_times.extend([steady] * (cfg.epochs_exposure - 1))
    aligned = _apply_exposure(frames, exposure)
    hist = (np.concatenate([np.asarray(l) for l in history])
            if history else np.zeros(0))
    return aligned, exposure, hist, np.asarray(epoch_times)


def _int_zero_cotangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def palette_pixel_index(inv_ids: np.ndarray, p_pad: int):
    """Static per-frame track->pixel inverse maps for the gather adjoint.

    Track ids are unique within a frame except for rare warp collisions,
    so the per-frame scatter-add of the gather VJP is (almost) a
    permutation — invertible once host-side.  Returns:
      inv_map (N, p_pad) int32: pixel position of track p in frame f, or
        the sentinel HW (-> a zero row appended to the cotangent);
      ovf_pos/ovf_ids (N, O) int32: duplicate pixels beyond the first
        occurrence + their track ids (O = max collisions over frames,
        usually 0; padded with HW / p_pad sentinels)."""
    n, hw = inv_ids.shape
    inv_map = np.full((n, p_pad), hw, np.int32)
    pos = np.arange(hw, dtype=np.int32)
    ovf_pos, ovf_ids = [], []
    for f in range(n):
        # reversed so the FIRST occurrence wins
        inv_map[f, inv_ids[f, ::-1]] = pos[::-1]
        dup = inv_map[f, inv_ids[f]] != pos
        ovf_pos.append(pos[dup])
        ovf_ids.append(inv_ids[f, dup])
    o = max((len(x) for x in ovf_pos), default=0)
    op = np.full((n, o), hw, np.int32)
    oi = np.full((n, o), p_pad, np.int32)
    for f in range(n):
        op[f, : len(ovf_pos[f])] = ovf_pos[f]
        oi[f, : len(ovf_ids[f])] = ovf_ids[f]
    return inv_map, op, oi


@jax.custom_vjp
def _palette_gather(features, inv_ids, inv_map, ovf_pos, ovf_ids):
    """Gather palette rows: features (P, 3) x inv_ids (B, HW) -> (B, HW, 3),
    with a scatter-free EXACT adjoint.

    XLA's VJP of a gather is a scatter-add that lowers to a per-row loop on
    TPU (~11M rows/s measured on v5e — scalar rate; gathers run ~10x
    faster).  The track ids are FIXED during the UVT optimization and
    unique within each frame (up to rare warp collisions), so the adjoint
    is a gather of the cotangent through the static track->pixel inverse
    maps (`palette_pixel_index`) summed over the batch, plus a tiny
    segment-sum for the collision overflow.  Unlike prefix-difference
    formulations this is exact: near-zero gradients keep their sign, which
    Adam(eps=1e-15) turns into full-size steps."""
    return features[inv_ids]


def _palette_gather_fwd(features, inv_ids, inv_map, ovf_pos, ovf_ids):
    return features[inv_ids], (inv_map, ovf_pos, ovf_ids, features.shape[0],
                               inv_ids.shape)


def _palette_gather_bwd(res, g):
    inv_map, ovf_pos, ovf_ids, p_pad, inv_ids_shape = res
    b, hw, c = g.shape
    gpad = jnp.concatenate([g, jnp.zeros((b, 1, c), g.dtype)], axis=1)
    per_frame = jnp.take_along_axis(gpad, inv_map[..., None], axis=1)
    adj = jnp.sum(per_frame, axis=0)  # (p_pad, 3)
    if ovf_pos.shape[1]:
        vals = jnp.take_along_axis(gpad, ovf_pos[..., None], axis=1)
        adj = adj + jax.ops.segment_sum(
            vals.reshape(-1, c), ovf_ids.reshape(-1),
            num_segments=p_pad + 1)[:p_pad]
    return (adj, np.zeros(inv_ids_shape, dtype=jax.dtypes.float0),
            _int_zero_cotangent(inv_map),
            _int_zero_cotangent(ovf_pos), _int_zero_cotangent(ovf_ids))


_palette_gather.defvjp(_palette_gather_fwd, _palette_gather_bwd)


# fallback for very long videos: the dense (N, P) inverse map above costs
# N*P*4 bytes (e.g. ~6 GB at 300 frames x ~5M tracks), while the sorted
# CSR-style adjoint below costs N*HW and one sorted segment-sum per render
# (~1 s per 11M rows on v5e — slower, but memory-bounded)
_DENSE_MAP_MAX_BYTES = int(5e8)

# Banded-gather fast path (ops/banded_gather.py): when per-frame track ids
# are near-monotone in scanline order (smooth flow, low track turnover),
# both the render gather AND its adjoint run as windowed Pallas gathers at
# ~430M rows/s instead of XLA's ~95M (measured, v5e).  The host planner
# verifies the precondition per video and falls back to the dense/sorted
# paths otherwise (high-turnover real footage mixes track generations
# inside scanline blocks, which breaks the single-window invariant).
# The plans are device-resident (offsets int16 — the dominant term, 512
# entries/block; starts/seg stay int32); the budget below caps plans AND
# plans+frames so the epoch's peak (frames f32 + f16 flows/masks + plans
# + transients) stays inside a 16 GB chip — at 300x1280x720 / 1.78M
# tracks the int16 plans are ~1.7 GB and banded still wins ~6x per epoch
# over the sorted-CSR adjoint.
_BANDED_PLAN_MAX_BYTES = int(3.5e9)
_BANDED_PLAN_PLUS_FRAMES_MAX_BYTES = int(7.5e9)

# single-slot cache of built UVT tables (see build_uvt_tables docstring)
_UVT_TABLE_CACHE: dict = {}


def _int_zero_like(shape):
    return np.zeros(shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _palette_gather_banded(dims, features, fseg, fst, foff, fovf_pos,
                           fovf_ids, bseg, bst, boff, ovf_pos, ovf_ids):
    """features (P, 3) -> (B, HW, 3) via per-frame banded window gathers;
    window-miss entries (`fovf_*`, from the robust planner) are patched
    with a plain XLA gather/scatter so the result is EXACT.  The adjoint
    is a track-major banded gather of the cotangent through the inverse
    position plans (absent tracks are masked entries), plus one
    segment-sum over the merged collision + window-miss overflow."""
    out, _ = _palette_gather_banded_fwd(
        dims, features, fseg, fst, foff, fovf_pos, fovf_ids,
        bseg, bst, boff, ovf_pos, ovf_ids)
    return out


def _banded_interpret() -> bool:
    from tclight_tpu.utils.device import use_pallas

    return not use_pallas()


def _palette_gather_banded_fwd(dims, features, fseg, fst, foff, fovf_pos,
                               fovf_ids, bseg, bst, boff, ovf_pos, ovf_ids):
    hw, p_pad = dims
    b, nb, blk = foff.shape
    # density-scaled geometry, MATCHING the planner's (build_uvt_tables):
    # both derive statically from (value range, outputs per row)
    wf, sf = banded.banded_geometry(p_pad, hw)
    packed = banded.pack_table(features, window=wf, slope=sf)
    if fst.ndim == 3:                           # K-window plans (long video)
        raw = banded._banded_gather_call_multi(
            packed, fseg.reshape(-1, fseg.shape[-1]),
            fst.reshape(-1, fst.shape[-1]), foff.reshape(-1, blk),
            window=wf, slope=sf,
            interpret=_banded_interpret())      # (b*nb, CPAD, blk)
    else:
        raw = banded._banded_gather_call(
            packed, fseg.reshape(-1), fst.reshape(-1),
            foff.reshape(-1, blk), window=wf, slope=sf,
            interpret=_banded_interpret())      # (b*nb, CPAD, blk)
    if fovf_pos.shape[1]:
        # exact patch for window-miss pixels, applied IN THE KERNEL'S
        # (blocks, channel-sublane, lane) layout: scattering into the
        # row-major (b, hw, 3) view cost 76 ms of a 113 ms render (the
        # 3-minor layout pads 3 -> 128 lanes, so the scatter's full-array
        # copies moved ~40x the logical bytes). Padded entries (pos=-1)
        # drop via an out-of-range block row.
        vals = features[jnp.maximum(fovf_ids, 0)].astype(raw.dtype)
        bi = fovf_pos // blk
        lane = fovf_pos % blk
        row = jnp.where(fovf_pos >= 0,
                        jnp.arange(b, dtype=fovf_pos.dtype)[:, None] * nb
                        + bi, b * nb)
        raw = raw.at[row[:, :, None],
                     jnp.arange(3)[None, None, :],
                     lane[:, :, None]].set(vals, mode="drop")
    out = raw[:, :3, :].transpose(0, 2, 1).reshape(b, nb * blk, 3)[:, :hw]
    res = (foff.shape, fseg.shape, fovf_pos.shape,
           bseg, bst, boff, ovf_pos, ovf_ids)
    return out, res


def _palette_gather_banded_bwd(dims, res, g):
    hw, p_pad = dims
    (foff_shape, fseg_shape, fovf_shape,
     bseg, bst, boff, ovf_pos, ovf_ids) = res
    b, nbt, blk = boff.shape
    c = g.shape[-1]
    wb, sb = banded.banded_geometry(hw, p_pad)
    packed_g = banded.pack_frames(g, window=wb, slope=sb)
    base = jnp.arange(b, dtype=jnp.int32) * (banded.frame_tiles(hw) * 128)
    if bst.ndim == 3:                           # K-window adjoint plans
        per = banded.banded_gather_multi(
            packed_g, (bseg + base[:, None, None]).reshape(-1,
                                                           bseg.shape[-1]),
            (bst + base[:, None, None]).reshape(-1, bst.shape[-1]),
            boff.reshape(-1, blk), window=wb, slope=sb,
            interpret=_banded_interpret())
    else:
        per = banded.banded_gather(
            packed_g, (bseg + base[:, None]).reshape(-1),
            (bst + base[:, None]).reshape(-1), boff.reshape(-1, blk),
            window=wb, slope=sb, interpret=_banded_interpret())
    adj = per.reshape(b, nbt * blk, 3).sum(axis=0)[:p_pad]
    if ovf_pos.shape[1]:
        gpad = jnp.concatenate([g, jnp.zeros((b, 1, c), g.dtype)], axis=1)
        vals = jnp.take_along_axis(gpad, ovf_pos[..., None], axis=1)
        adj = adj + jax.ops.segment_sum(
            vals.reshape(-1, c), ovf_ids.reshape(-1),
            num_segments=p_pad + 1)[:p_pad]
    return (adj, _int_zero_like(fseg_shape), _int_zero_like(foff_shape[:2]),
            _int_zero_like(foff_shape), _int_zero_like(fovf_shape),
            _int_zero_like(fovf_shape), _int_zero_cotangent(bseg),
            _int_zero_cotangent(bst), _int_zero_cotangent(boff),
            _int_zero_cotangent(ovf_pos), _int_zero_cotangent(ovf_ids))


_palette_gather_banded.defvjp(_palette_gather_banded_fwd,
                              _palette_gather_banded_bwd)


@jax.custom_vjp
def _palette_gather_sorted(features, inv_ids, perm, ids_sorted):
    """Memory-bounded variant of `_palette_gather`: per-frame pixel order
    presorted by track id host-side; the adjoint is a gather + sorted
    segment-sum per frame under `lax.scan` (exact)."""
    return features[inv_ids]


def _palette_gather_sorted_fwd(features, inv_ids, perm, ids_sorted):
    return features[inv_ids], (perm, ids_sorted, features.shape[0])


def _palette_gather_sorted_bwd(res, g):
    perm, ids_sorted, p_pad = res

    def step(acc, inp):
        gb, pb, ib = inp
        contrib = jax.ops.segment_sum(
            gb[pb], ib, num_segments=p_pad, indices_are_sorted=True
        )
        return acc + contrib, None

    adj, _ = jax.lax.scan(
        step, jnp.zeros((p_pad, g.shape[-1]), g.dtype), (g, perm, ids_sorted)
    )
    return (adj, _int_zero_cotangent(perm), _int_zero_cotangent(perm),
            _int_zero_cotangent(ids_sorted))


_palette_gather_sorted.defvjp(_palette_gather_sorted_fwd,
                              _palette_gather_sorted_bwd)


def init_palette(
    frames: jnp.ndarray, unq_inv: jnp.ndarray, n_unique: int, pad_to: int | None = None
) -> jnp.ndarray:
    """Scatter-mean per-track color -> SH-DC palette (generate.py:477-481).
    Padded rows (>= n_unique) are zeros."""
    n, h, w, c = frames.shape
    p = pad_to or n_unique
    flat = frames.reshape(n * h * w, c)
    sums = jax.ops.segment_sum(flat, unq_inv, num_segments=p)
    counts = jax.ops.segment_sum(jnp.ones((flat.shape[0],)), unq_inv, num_segments=p)
    mean = sums / jnp.maximum(counts, 1.0)[:, None]
    return RGB2SH(mean)


def render_palette(features_dc: jnp.ndarray, unq_inv: jnp.ndarray,
                   shape: tuple) -> jnp.ndarray:
    """Gather per-pixel colors from the palette (generate.py:529-532)."""
    rgb = jnp.clip(SH2RGB(features_dc)[unq_inv], 0.0, 1.0)
    return rgb.reshape(shape)


def kinematic_relabel(inv_np: np.ndarray, p_pad: int) -> np.ndarray:
    """Renumber tracks by mean scanline position so per-frame ids become
    near-monotone again on long videos.

    Track numbering is OURS to choose: the palette is indexed by these
    ids and learned per track, so any consistent permutation is exact.
    `get_flowid` numbers tracks by creation order, which interleaves
    creation generations spatially — by frame ~300 the born-at-the-edge
    strips turn per-frame ids into a ~720 ids/px ramp that no gather
    window covers (PERF_NOTES round 3).  But smooth flow preserves the
    relative scanline order of pixels, so ranking tracks by their MEAN
    flat position (over the frames where they are visible) restores a
    near-monotone id structure in every frame simultaneously; residual
    order violations (occlusions, fast motion) land in the robust
    planner's exact overflow patch.

    Host cost ~n x bincount(hw) + one argsort(p): seconds, cached with
    the tables."""
    n, hw = inv_np.shape
    flat = inv_np.reshape(-1)
    counts = np.bincount(flat, minlength=p_pad)
    pos = np.arange(hw, dtype=np.float64)
    sums = np.zeros(p_pad, np.float64)
    for t in range(n):  # frame-chunked: bounds the bincount temp memory
        sums += np.bincount(inv_np[t], weights=pos, minlength=p_pad)
    mean = sums / np.maximum(counts, 1)
    mean[counts == 0] = np.inf  # palette pad rows rank last
    order = np.argsort(mean, kind="stable").astype(np.int32)
    rank = np.empty(p_pad, np.int32)
    rank[order] = np.arange(p_pad, dtype=np.int32)
    return rank[inv_np]


def _build_banded_tables(plan_fn, bwd_plan_fn, inv_np, n, hw, p_pad,
                         plan_bytes, nwin):
    """Plan both gather directions (single- or K-window robust planner;
    each direction carries its own density geometry — see
    banded.banded_geometry) and assemble the 10-tuple banded tables, or
    None if either direction's full plan rejects the ids."""
    fseg, fst, foff, fop, foi, fok = plan_fn(inv_np)
    if not fok:
        return None
    inv_map_np, ovf_pos_np, ovf_ids_np = palette_pixel_index(inv_np, p_pad)
    pos = np.where(inv_map_np == hw, -1, inv_map_np)
    bseg, bst, boff, bop, boi, bok = bwd_plan_fn(pos)
    if not bok:
        return None
    from tclight_tpu.utils.logging import get_logger

    # bwd window misses: planner rows are TRACKS and values are pixel
    # positions — swap into the (pixel position, track id) collision
    # convention and merge into one segment-sum patch
    bop_pix = np.where(bop >= 0, boi, hw).astype(np.int32)
    bop_trk = np.where(bop >= 0, bop, p_pad).astype(np.int32)
    op_all = np.concatenate([ovf_pos_np, bop_pix], axis=1)
    oi_all = np.concatenate([ovf_ids_np, bop_trk], axis=1)
    get_logger().info(
        "UVT: banded-gather fast path active (%d tracks, %d window(s)/"
        "block, plans %.0f MB, overflow fwd %d + bwd %d cols)",
        p_pad, nwin, plan_bytes / 1e6, fop.shape[1], op_all.shape[1])
    return tuple(jnp.asarray(a) for a in (
        fseg, fst, foff, fop, foi, bseg, bst, boff, op_all, oi_all))


def build_uvt_tables(unq_inv: np.ndarray, n: int, h: int, w: int,
                     p_pad: int, allow_banded: bool | None = None):
    """Static per-frame palette-index tables. Returns (tables, inv_np):
    10-tuple tables -> banded Pallas gather both ways (fast path, used
    when the per-video window precondition holds); 4-tuple -> dense
    inverse-map adjoint; 3-tuple -> sorted CSR adjoint (memory-bounded
    fallback for very long videos).  `allow_banded=None` enables the
    banded path on the TPU backend only (elsewhere the kernel would run
    in Pallas interpret mode — orders of magnitude slower than XLA).

    Results are cached (single slot) on a digest of the ids: a Generator
    serves many prompts per video, and the host-side planning +
    device upload costs ~15-20 s at 30x720x960."""
    if allow_banded is None:
        # respects set_compute_platform: a virtual-CPU mesh inside a
        # process whose default backend is the tunneled TPU (the driver's
        # multichip dryrun after entry() initialized the TPU client) must
        # NOT pick the banded Pallas plans
        from tclight_tpu.utils.device import use_pallas

        allow_banded = use_pallas()
    hw = h * w
    inv_np = np.asarray(unq_inv, np.int32).reshape(n, hw)
    import hashlib

    key = (hashlib.blake2b(inv_np.tobytes(), digest_size=16).hexdigest(),
           n, h, w, p_pad, bool(allow_banded))
    cached = _UVT_TABLE_CACHE.get("slot")
    if cached is not None and cached[0] == key:
        return cached[1], cached[2]
    if allow_banded:
        # int16 offsets (banded._offs_dtype): 2 bytes x 512 entries/block,
        # both gather directions
        plan_bytes = 2 * 512 * n * (banded.row_blocks(hw)
                                    + banded.row_blocks(p_pad))
        if (plan_bytes <= _BANDED_PLAN_MAX_BYTES
                and plan_bytes + 4 * n * hw * 3
                <= _BANDED_PLAN_PLUS_FRAMES_MAX_BYTES):
            # cheap sampled pre-check: long videos accumulate track
            # generations until ~25-30% of a frame's ids live outside
            # any single scanline window (measured at 300x1280x720;
            # window size does not help — the misses are MULTI-BAND or
            # creation-order RAMPS).  Planning a few late frames first
            # picks the cheapest plan that covers the video (K=1, then
            # the K-window planner, then both again on kinematically
            # relabeled ids) without paying the full planner (~2 min
            # host at 300 frames) per rejected candidate.
            # per-direction density geometry (must match the kernel-call
            # sites in _palette_gather_banded_fwd/bwd, which recompute it
            # from the same statics)
            wf, sf = banded.banded_geometry(p_pad, hw)
            fgeo = dict(window=wf, slope=sf)

            def pick_plan(ids):
                sample = ids[:: max(1, n // 4)][:4]
                if banded.plan_banded_gather_rows_robust(
                        sample, **fgeo)[-1]:
                    return (functools.partial(
                        banded.plan_banded_gather_rows_robust, **fgeo), 1)
                for k in (2, 3):
                    if banded.plan_banded_gather_rows_multi(
                            sample, n_windows=k, **fgeo)[-1]:
                        return (functools.partial(
                            banded.plan_banded_gather_rows_multi,
                            n_windows=k, **fgeo), k)
                return None, 0

            used_inv = inv_np
            plan_fn, nwin = pick_plan(inv_np)
            if plan_fn is None:
                relabeled = kinematic_relabel(inv_np, p_pad)
                plan_fn, nwin = pick_plan(relabeled)
                if plan_fn is not None:
                    from tclight_tpu.utils.logging import get_logger

                    get_logger().info(
                        "UVT: kinematic track relabeling restored the "
                        "banded id structure (%d windows/block)", nwin)
                    used_inv = relabeled
            if plan_fn is not None:
                # adjoint plan: rows are TRACKS, values pixel POSITIONS —
                # its density (hw values over p_pad outputs) differs from
                # the fwd direction; same planner kind, own geometry
                wb, sb = banded.banded_geometry(hw, p_pad)
                bgeo = dict(window=wb, slope=sb)
                bwd_plan_fn = (
                    functools.partial(
                        banded.plan_banded_gather_rows_robust, **bgeo)
                    if nwin == 1 else functools.partial(
                        banded.plan_banded_gather_rows_multi,
                        n_windows=nwin, **bgeo))
                tables = _build_banded_tables(plan_fn, bwd_plan_fn,
                                              used_inv, n, hw, p_pad,
                                              plan_bytes, nwin)
            else:
                tables = None
            if tables is not None:
                _UVT_TABLE_CACHE["slot"] = (key, tables, used_inv)
                return tables, used_inv
    dense_map = n * p_pad * 4 <= _DENSE_MAP_MAX_BYTES
    unq_inv_frames = jnp.asarray(inv_np)
    if dense_map:
        inv_map_np, ovf_pos_np, ovf_ids_np = palette_pixel_index(inv_np, p_pad)
        tables_rest = (jnp.asarray(inv_map_np), jnp.asarray(ovf_pos_np),
                       jnp.asarray(ovf_ids_np))
    else:
        perm_np = np.argsort(inv_np, axis=1, kind="stable").astype(np.int32)
        ids_sorted_np = np.take_along_axis(inv_np, perm_np, axis=1)
        tables_rest = (jnp.asarray(perm_np), jnp.asarray(ids_sorted_np))
    # dense/sorted builds are cheap and can be huge (sorted CSR at 300
    # frames ~3 GB) — only the banded branch caches
    return (unq_inv_frames,) + tables_rest, inv_np


def uvt_gather(features, tables, idx, hw: int | None = None):
    """Palette gather with the scatter-free adjoint matching the table
    layout (len 10 = banded Pallas plans, len 4 = dense inverse map,
    len 3 = sorted CSR).  `hw` (static) is required for the banded
    layout only."""
    if len(tables) == 10:
        fseg, fst, foff, fop, foi, bseg, bst, boff, op, oi = tables
        return _palette_gather_banded(
            (hw, features.shape[0]), features, fseg[idx], fst[idx],
            foff[idx], fop[idx], foi[idx], bseg[idx], bst[idx],
            boff[idx], op[idx], oi[idx])
    inv_f = tables[0]
    if len(tables) == 4:
        _, map_f, op_f, oi_f = tables
        return _palette_gather(features, inv_f[idx], map_f[idx],
                               op_f[idx], oi_f[idx])
    _, perm_f, ids_f = tables
    return _palette_gather_sorted(features, inv_f[idx], perm_f[idx],
                                  ids_f[idx])


def uvt_render(features, tables, idx, h: int, w: int):
    rgb = uvt_gather(features, tables, idx, hw=h * w)
    return jnp.clip(SH2RGB(rgb), 0.0, 1.0).reshape(-1, h, w, 3)


def uvt_loss(features, frames, past_flows, masks_bwd, tables, idxs, bmask,
             cfg: PostOptConfig, warp_radius, h: int, w: int, mesh=None):
    """The stage-2 loss (generate.py:499-512), shared verbatim between the
    single-device epoch scan and the sharded multi-chip step."""
    pre_idx = jnp.maximum(idxs - 1, 0)
    # TWO separate renders, NOT the reference's single cat_idxs gather
    # (generate.py:496-505): measured on the flagship (batch 16, 774k
    # tracks) the concatenated 2B render is ~8% SLOWER per epoch (0.449
    # -> 0.486 s, BENCH 2026-08-20) — at these batch sizes the per-call
    # fixed costs are already amortized and XLA schedules the two gathers
    # better than one double-size one. Exact same math either way.
    images = _batch_constraint(uvt_render(features, tables, idxs, h, w), mesh)
    pre_images = _batch_constraint(
        uvt_render(features, tables, pre_idx, h, w), mesh)

    edited = _batch_constraint(frames[idxs], mesh)
    # flows/masks may be stored f16 on device (tunnel-compact);
    # promote the batch slice for the loss math
    warped = _warp(pre_images,
                   _batch_constraint(past_flows[idxs], mesh)
                   .astype(jnp.float32), warp_radius)
    m = _batch_constraint(masks_bwd[idxs], mesh).astype(jnp.float32)
    valid = bmask & (idxs > 0)
    flow_per = jnp.mean(jnp.abs(warped * m - images * m), axis=(1, 2, 3))
    loss_flow = _masked_mean(flow_per, valid)
    dssim_per = 1.0 - _ms_ssim_per_sample(images, edited, cfg)
    loss_photo = _masked_mean(dssim_per, bmask) * cfg.lambda_dssim
    # per-sample TV, masked-mean over the real (unpadded) batch rows —
    # exactly the reference TVLoss (loss_utils.py:324-340) whose torch
    # DataLoader batches are never padded
    c = images.shape[-1]
    h_tv = jnp.sum((images[:, 1:] - images[:, :-1]) ** 2, axis=(1, 2, 3))
    w_tv = jnp.sum((images[:, :, 1:] - images[:, :, :-1]) ** 2, axis=(1, 2, 3))
    tv_per = 2.0 * (h_tv / (c * (h - 1) * w) + w_tv / (c * h * (w - 1)))
    tv = cfg.lambda_tv * _masked_mean(tv_per, bmask)
    return (
        (1 - cfg.lambda_flow) * loss_photo
        + cfg.lambda_flow * loss_flow
        + tv
    )


@functools.partial(jax.jit, static_argnames=("h", "w", "p_pad"))
def _palette_chunk_sums(frames, tables, idx, cot_mask, h, w, p_pad):
    """Per-track color sums for one frame chunk via the palette-gather
    adjoint (memory-bounded scatter-mean init, generate.py:477-481)."""
    feats0 = jnp.zeros((p_pad, 3), jnp.float32)
    _, vjp = jax.vjp(lambda f: uvt_gather(f, tables, idx, hw=h * w), feats0)
    cot = frames[idx].reshape(idx.shape[0], h * w, 3) * cot_mask[:, None, None]
    return vjp(cot)[0]


def run_uvt(
    frames: jnp.ndarray,       # (N, H, W, 3) exposure-aligned edited frames
    past_flows: jnp.ndarray,
    masks_bwd: jnp.ndarray,
    unq_inv: np.ndarray,       # (N*H*W,) int32 track ids
    n_unique: int,
    cfg: PostOptConfig,
    seed: int = 0,
    warp_radius: int | None = None,
    mesh=None,
) -> tuple[jnp.ndarray, np.ndarray, np.ndarray]:
    """Unique-Video-Tensor optimization. Returns (rendered frames, loss
    history, per-epoch wall seconds). With `mesh`, the frame batch is
    sharded over the 'data' axis."""
    if cfg.epochs <= 0:
        return frames, np.zeros(0), np.zeros(0)
    n, h, w, _ = frames.shape
    if masks_bwd.ndim == 3:
        masks_bwd = masks_bwd[..., None]
    # pad palette to a lane-aligned static size
    p_pad = max(128, int(np.ceil(n_unique / 128)) * 128)
    # static track->pixel inverse maps, computed once: the palette adjoint
    # becomes pure gathers (see _palette_gather); for palettes where the
    # dense (N, P) map would not fit, fall back to the sorted CSR adjoint
    tables, inv_np = build_uvt_tables(unq_inv, n, h, w, p_pad,
                                      allow_banded=None if mesh is None
                                      else False)

    def gather_raw(features, tables, idx):
        return uvt_gather(features, tables, idx, hw=h * w)

    def render_fast(features, tables, idx):
        return uvt_render(features, tables, idx, h, w)

    # memory-bounded scatter-mean init (generate.py:477-481): the naive
    # whole-video segment_sum materializes N*H*W-row intermediates and
    # OOMs at 300x1280x720 on 16 GB. The per-track sums are exactly the
    # palette-gather adjoint applied to the frame values, frame-chunked;
    # counts come from a host bincount.
    frames = jnp.asarray(frames)
    counts = jnp.asarray(np.maximum(
        np.bincount(inv_np.reshape(-1), minlength=p_pad), 1.0
    ).astype(np.float32))
    init_bs = min(16, n)
    sums = jnp.zeros((p_pad, 3), jnp.float32)

    for c0 in range(0, n, init_bs):
        sel = np.arange(c0, min(c0 + init_bs, n))
        pad = init_bs - len(sel)
        idx = jnp.asarray(np.concatenate([sel, np.zeros(pad, np.int64)])
                          .astype(np.int32))
        cot_mask = jnp.asarray(
            np.concatenate([np.ones(len(sel)), np.zeros(pad)])
            .astype(np.float32))
        sums = sums + _palette_chunk_sums(frames, tables, idx, cot_mask,
                                          h, w, p_pad)
    features = RGB2SH(sums / counts[:, None])
    feature_lr = cfg.feature_lr * cfg.batch_size / n
    tx, run_epoch = _uvt_epoch_builder(cfg, warp_radius, mesh, h, w,
                                       feature_lr)

    rng = np.random.default_rng(seed)
    opt_state = tx.init(features)
    past_flows_j = jnp.asarray(past_flows)
    masks_j = jnp.asarray(masks_bwd)
    history = []
    epoch_times: list[float] = []
    # back-to-back dispatch, single sync (see run_exposure_align): the
    # per-epoch loss fetch was a tunnel round-trip per epoch
    t0 = time.perf_counter()
    for e in range(cfg.epochs):
        idxs_all, masks_all = _epoch_batches(n, cfg.batch_size, rng)
        features, opt_state, losses = run_epoch(
            features, opt_state, frames, past_flows_j, masks_j,
            tables, jnp.asarray(idxs_all), jnp.asarray(masks_all)
        )
        history.append(losses)
        if e == 0:
            np.asarray(losses)
            epoch_times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
    if cfg.epochs > 1:
        np.asarray(history[-1])
        steady = (time.perf_counter() - t0) / (cfg.epochs - 1)
        epoch_times.extend([steady] * (cfg.epochs - 1))
    history = [np.asarray(l) for l in history]
    # the input frames are dead once the epochs are done (the render uses
    # only features+tables): free them BEFORE allocating the rendered
    # video — at 300x1280x720 both are 3.3 GB f32 and holding the pair
    # left the device too full for even the chunked output fetch
    # (measured RESOURCE_EXHAUSTED on the 16 GB v5e)
    if isinstance(frames, jax.Array):
        try:
            frames.delete()
        except Exception:  # noqa: BLE001 — committed/donated buffers
            pass
    # final render (generate.py:529-532), frame-chunked to bound memory
    outs = []
    for c0 in range(0, n, init_bs):
        idx = jnp.asarray(np.arange(c0, min(c0 + init_bs, n)).astype(np.int32))
        outs.append(render_fast(features, tables, idx))
    rendered = jnp.concatenate(outs, axis=0)
    hist = np.concatenate(history) if history else np.zeros(0)
    return rendered, hist, np.asarray(epoch_times)
