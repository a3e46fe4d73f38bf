"""Banded (windowed) gather: the TPU-native fast path for the UVT palette.

XLA lowers a large row gather (`table[idx]` with millions of arbitrary
indices) at a row-rate of ~95M rows/s on v5e — ~100x below HBM bandwidth
(measured: 117 ms for a 16-frame palette render, docs/PERF_NOTES.md).
But the UVT index structure is special: per frame, pixel track-ids are
NEAR-MONOTONE (tracks are created in scanline order and survive along
flow), so consecutive outputs read from a narrow moving window of the
table. This module exploits that:

    out[b, i] = table[starts[b] + offs[b, i]],   0 <= offs < W (static)

The table is packed as (P/128, 8, 128) — id i at [i // 128, channel,
i % 128] — so a 128-aligned window is ONE CONTIGUOUS DMA and every
128-id tile lands as a single (8, 128) vreg. Each grid step DMAs one
segment covering `group` consecutive blocks (double-buffered across
steps); outputs are selected with Mosaic's `tpu.dynamic_gather` (lane
shuffles within one vreg), tiled over (window-tile x output-tile) pairs —
pure VPU work, exact in f32.

`plan_banded_gather` builds (seg_starts, starts, offs) host-side from an
index array and reports whether the banded precondition holds; callers
fall back to the plain XLA gather otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["plan_banded_gather", "pack_table", "banded_gather",
           "banded_gather_xla", "plan_banded_gather_rows_multi",
           "banded_gather_multi", "banded_gather_xla_multi"]

_CPAD = 8      # sublane-padded channel count of the packed table
_TILE = 128    # ids per packed tile (= vreg lanes)


def _offs_dtype(window: int, n_windows: int = 1):
    """Offsets live in [-1, n_windows*window): int16 whenever that fits.
    The offs array dominates plan memory (512 entries/block vs 1-2 scalars
    for starts/seg), so halving it halves device plan residency AND the
    h2d upload — 3.2 GB of plans at 300x1280x720 ride a tunnel whose
    first-transfer stall scales with volume (PERF_NOTES)."""
    return np.int16 if n_windows * window <= 2**15 else np.int32


def plan_banded_gather(indices: np.ndarray, block: int = 512,
                       window: int = 2048, group: int = 8,
                       max_ovf_frac: float = 0.0, slope: float = 2.0):
    """indices (..., L) int -> (seg_starts (NG,), starts (NB,),
    offs (NB, block), ok).

    Flattens leading dims; pads L up to a block*group multiple repeating
    the last index. `starts` are 128-aligned tile starts (in ids);
    `seg_starts` are per-group segment starts. ok=False when any block's
    aligned span exceeds `window` or any group's segment exceeds the
    static segment length `seg_tiles(window, block, group)` (caller
    should use the XLA fallback).

    With `max_ovf_frac > 0` the plan is ROBUST: each block picks the
    better of (aligned-min, median-centered) window and marks the
    entries it cannot cover as overflow (offs=-1 -> the kernel emits a
    zero row; the caller patches them exactly with a plain XLA
    gather/scatter — see postopt's banded tables).  ok then requires the
    overflow FRACTION (of live entries) to stay under the threshold
    instead of every block spanning a single window.  This is what makes
    the fast path apply to real tracked ids, where `get_flowid`'s
    freshly-created tracks (scanline-ordered per creation frame, but far
    from the frame-0 id range) mix a few far-band entries into otherwise
    near-monotone scanline blocks."""
    idx = np.asarray(indices)
    # int32 whenever ids + window fit: this numpy's int64 elementwise
    # path (np.where in particular) is 10-30x slower, and the planner
    # runs per video on the host
    big = int(idx.max(initial=0)) + window + _TILE >= 2**31
    idx = idx.astype(np.int64 if big else np.int32, copy=False)
    sentinel = np.iinfo(idx.dtype).max // 2
    # plan each leading row (frame) independently: ids are near-monotone
    # WITHIN a frame; a group straddling two frames would span the whole
    # table. Each row pads to a block*group multiple (uniform, so callers
    # reshape (R, row_blocks(L)*block) and slice [:, :L]).
    #
    # Negative indices are MASKED entries: excluded from the window
    # planning, emitted as offs=-1, and produced as 0 rows by the kernel
    # (offs-lo stays negative for every window tile, so `hit` never
    # fires).  Callers use them for absent tracks in the adjoint plan.
    rows = idx.reshape(-1, idx.shape[-1]) if idx.ndim > 1 else idx[None]
    L = rows.shape[1]
    pad = (-L) % (block * group)
    if pad:
        rows = np.concatenate(
            [rows, np.full((rows.shape[0], pad), -1, idx.dtype)], axis=1)
    blocks = rows.reshape(-1, block)
    live = blocks >= 0
    any_live = live.any(axis=1)
    bmax = np.max(blocks, axis=1, where=live, initial=-1)
    bmin = np.min(blocks, axis=1, where=live, initial=sentinel)
    bmin = np.where(any_live, bmin, 0)
    bmax = np.where(any_live, bmax, 0)
    lo = (bmin // _TILE) * _TILE
    if max_ovf_frac > 0.0:
        # robust per-block window: aligned-min vs median-centered, keep
        # whichever covers more live entries; the rest becomes overflow
        # (np.partition = O(n) median, ~10x cheaper than np.median's sort)
        med = np.partition(np.where(live, blocks, bmin[:, None]),
                           block // 2, axis=1)[:, block // 2]
        lo_med = np.maximum((med // _TILE) * _TILE - window // 2, 0)
        cov_min = (live & (blocks >= lo[:, None])
                   & (blocks < lo[:, None] + window)).sum(axis=1)
        cov_med = (live & (blocks >= lo_med[:, None])
                   & (blocks < lo_med[:, None] + window)).sum(axis=1)
        lo = np.where(cov_med > cov_min, lo_med, lo)
        ok = True  # decided at the end from the final overflow fraction
    else:
        span = np.where(any_live, bmax - lo, 0)
        ok = bool((span < window).all())
    # Dead blocks (all entries masked — row-end padding, absent tracks)
    # have no window of their own; give them the previous live block's
    # window start so they don't blow up the per-group segment span.
    nb_row = rows.shape[1] // block
    alive2 = any_live.reshape(-1, nb_row)
    prev = np.where(alive2, np.arange(nb_row)[None, :], -1)
    prev = np.maximum.accumulate(prev, axis=1)
    nxt = np.where(alive2, np.arange(nb_row)[None, :], nb_row)
    nxt = np.minimum.accumulate(nxt[:, ::-1], axis=1)[:, ::-1]
    fill = np.where(prev >= 0, prev, np.minimum(nxt, nb_row - 1))
    lo2 = lo.reshape(-1, nb_row)
    lo = np.take_along_axis(lo2, fill, axis=1).reshape(-1)
    segn_ids = seg_tiles(window, block, group, slope) * _TILE
    if max_ovf_frac > 0.0:
        # groups whose windows span more than one DMA segment (id bands
        # jumping WITHIN a group, e.g. the adjoint plan at track-creation
        # generation boundaries): anchor the segment at the group's
        # median window and demote escaping blocks entirely to overflow
        lo_g = lo.reshape(-1, group)
        viol = (lo_g.max(axis=1) - lo_g.min(axis=1)) + window > segn_ids
        if viol.any():
            anchor = np.partition(lo_g, group // 2, axis=1)[:, group // 2]
            fit = ((lo_g >= anchor[:, None])
                   & (lo_g + window <= anchor[:, None] + segn_ids))
            demote = (viol[:, None] & ~fit).reshape(-1)
            lo = np.where(demote, np.repeat(anchor, group), lo)
        in_win = (live & (blocks >= lo[:, None])
                  & (blocks < lo[:, None] + window))
        offs = np.where(in_win, blocks - lo[:, None], -1)
        ovf_mask = live & ~in_win
        n_live = int(live.sum())
        ok = int(ovf_mask.sum()) <= max_ovf_frac * max(n_live, 1)
    else:
        offs = np.where(live, blocks - lo[:, None], -1)
        ovf_mask = None
    seg = lo.reshape(-1, group)
    seg_starts = seg.min(axis=1)
    seg_span = (seg.max(axis=1) - seg_starts) + window
    ok = bool(ok) and bool((seg_span <= segn_ids).all())
    # downcast only valid plans: when ok=False the offsets can exceed the
    # int16 range and would wrap silently (callers must not use them, but
    # keep them inspectable)
    odt = _offs_dtype(window) if ok else np.int32
    if max_ovf_frac > 0.0:
        return (seg_starts.astype(np.int32), lo.astype(np.int32),
                offs.astype(odt), ok, ovf_mask)
    return (seg_starts.astype(np.int32), lo.astype(np.int32),
            offs.astype(odt), ok)


def row_blocks(length: int, block: int = 512, group: int = 8) -> int:
    """Blocks the planner emits per leading row of a (R, length) index
    array (each row pads to a block*group multiple)."""
    pad = (-length) % (block * group)
    return (length + pad) // block


def seg_tiles(window: int, block: int, group: int, slope: float = 2.0
              ) -> int:
    """Static per-group segment length in 128-id tiles: covers `group`
    block windows whose starts advance at up to `slope` ids per output."""
    ids = int(group * block * slope) + window + _TILE
    return (ids + _TILE - 1) // _TILE


def banded_geometry(value_range: int, outputs_per_row: int,
                    block: int = 512) -> tuple[int, float]:
    """(window, slope) for a gather whose per-row values span
    `value_range` ids over `outputs_per_row` outputs.

    The id DENSITY d = value_range / outputs_per_row drives both statics:
    a monotone block of `block` outputs spans ~block*d ids (the window
    must cover it) and consecutive block windows advance ~d ids per
    output (the per-group DMA segment must keep up — seg_tiles' slope).
    The historical defaults (2048, 2.0) assumed d <= 2; long videos with
    real-footage track turnover measure d ~ 3.5-5.5 (3.55M tracks over
    0.92M pixels at 300x1280x720 with 1%/frame churn), where fixed
    geometry demotes nearly every group and the planner rejects ~50% of
    entries regardless of window size (PERF_NOTES round 5)."""
    d = value_range / max(outputs_per_row, 1)
    if d <= 2.0:
        return 2048, 2.0
    window = 4096 if d <= 5.0 else 8192
    # margin above the measured density; round for a stable static key
    return window, round(d + 0.5, 3)


def pack_table(table, window: int = 2048, block: int = 512,
               group: int = 8, slope: float = 2.0):
    """(P, C<=8) -> (P_pad/128, 8, 128) f32 with a segment-length tail
    margin so every planned segment DMA is in-bounds."""
    p, c = table.shape
    assert c <= _CPAD, c
    nt = (p + _TILE - 1) // _TILE + seg_tiles(window, block, group, slope)
    out = jnp.zeros((nt * _TILE, _CPAD), jnp.float32)
    out = out.at[:p, :c].set(table.astype(jnp.float32))
    return out.reshape(nt, _TILE, _CPAD).transpose(0, 2, 1)


def plan_banded_gather_rows(indices: np.ndarray, block: int = 512,
                            window: int = 2048, group: int = 8):
    """Per-row plans for an (R, L) index array: (seg (R, NG),
    starts (R, NB), offs (R, NB, block), ok)."""
    r, length = indices.shape
    seg, starts, offs, ok = plan_banded_gather(indices, block, window, group)
    nb = row_blocks(length, block, group)
    return (seg.reshape(r, -1), starts.reshape(r, nb),
            offs.reshape(r, nb, block), ok)


def plan_banded_gather_rows_robust(indices: np.ndarray, block: int = 512,
                                   window: int = 2048, group: int = 8,
                                   max_ovf_frac: float = 0.08,
                                   slope: float = 2.0):
    """Robust per-row plans: (seg (R, NG), starts (R, NB),
    offs (R, NB, block), ovf_pos (R, K), ovf_ids (R, K), ok).

    Entries a block's chosen window cannot cover are emitted as overflow:
    `ovf_pos` holds their position within the row (pad -1), `ovf_ids`
    the index value they read (pad 0); the kernel produces zero rows for
    them (offs=-1) and the caller patches exactly.  K = max overflow
    count over rows."""
    r, length = indices.shape
    seg, starts, offs, ok, ovf_mask = plan_banded_gather(
        indices, block, window, group, max_ovf_frac=max_ovf_frac,
        slope=slope)
    nb = row_blocks(length, block, group)
    lpad = nb * block
    ovf = ovf_mask.reshape(r, lpad)[:, :length]
    idx = np.asarray(indices)
    pos_list = [np.nonzero(ovf[i])[0] for i in range(r)]
    k = max((len(p) for p in pos_list), default=0)
    ovf_pos = np.full((r, k), -1, np.int32)
    ovf_ids = np.zeros((r, k), np.int32)
    for i, p in enumerate(pos_list):
        ovf_pos[i, : len(p)] = p
        ovf_ids[i, : len(p)] = idx[i, p]
    return (seg.reshape(r, -1), starts.reshape(r, nb),
            offs.reshape(r, nb, block), ovf_pos, ovf_ids, ok)


def _plan_multi(indices: np.ndarray, block: int, window: int, group: int,
                n_windows: int, max_ovf_frac: float, slope: float = 2.0):
    """K-window planning core: greedy residual passes.

    Long videos accumulate track creation generations until scanline
    blocks mix ids from SEVERAL far-apart bands (measured 28.7% of
    entries outside any single window at 300x1280x720 — and growing the
    window does not help, the misses are multi-band).  Pass k plans the
    best single window per block over the entries the first k-1 passes
    could not cover; covered entries encode their window in the offset
    (`offs = k*window + (id - lo_k)`), so the offs array stays ONE
    (NB, block) int32 — plan memory does not grow with K.  Blocks whose
    pass-k windows would blow the per-group DMA segment are demoted for
    that pass only (their entries stay in the residual for pass k+1).

    Returns (seg_starts (NG, K), starts (NB, K), offs (NB, block),
    ovf_mask, ok)."""
    idx = np.asarray(indices)
    big = int(idx.max(initial=0)) + window + _TILE >= 2**31
    idx = idx.astype(np.int64 if big else np.int32, copy=False)
    sentinel = np.iinfo(idx.dtype).max // 2
    rows = idx.reshape(-1, idx.shape[-1]) if idx.ndim > 1 else idx[None]
    length = rows.shape[1]
    pad = (-length) % (block * group)
    if pad:
        rows = np.concatenate(
            [rows, np.full((rows.shape[0], pad), -1, idx.dtype)], axis=1)
    blocks = rows.reshape(-1, block)
    live = blocks >= 0
    residual = live.copy()
    segn_ids = seg_tiles(window, block, group, slope) * _TILE
    offs = np.full(blocks.shape, -1, np.int32)
    seg_list, lo_list = [], []
    for k in range(n_windows):
        # canonical band order: every pass takes each block's LOWEST
        # still-uncovered ids (aligned-min window).  Neighboring blocks
        # hold the same creation generations in the same order, so their
        # pass-k windows land near each other and per-group DMA segments
        # stay tight — a best-coverage choice here let adjacent blocks
        # pick windows in DIFFERENT bands (~40k ids apart), blowing every
        # group segment and demote-thrashing the plan.
        any_r = residual.any(axis=1)
        bmin = np.where(
            any_r, np.min(blocks, axis=1, where=residual, initial=sentinel),
            0)
        lo = (bmin // _TILE) * _TILE
        lo = np.where(any_r, lo, -1)            # no pass-k window
        # per-group segment: min start when all windows fit one segment,
        # else anchor at the group's live-median start and demote blocks
        # escaping [anchor, anchor + segn - window] back to the residual
        lo_g = lo.reshape(-1, group)
        live_g = lo_g >= 0
        n_live_g = live_g.sum(axis=1)
        lo_s = np.sort(np.where(live_g, lo_g, sentinel), axis=1)
        pick = np.maximum((n_live_g - 1) // 2, 0)
        anchor = np.take_along_axis(lo_s, pick[:, None], axis=1)[:, 0]
        anchor = np.where(n_live_g > 0, anchor, 0)
        seg_min = np.where(
            n_live_g > 0, np.min(np.where(live_g, lo_g, sentinel), axis=1),
            0)
        seg_max = np.max(np.where(live_g, lo_g, -1), axis=1)
        viol = (n_live_g > 0) & ((seg_max - seg_min) + window > segn_ids)
        fit = (live_g & (lo_g >= anchor[:, None])
               & (lo_g + window <= anchor[:, None] + segn_ids))
        demote = np.repeat(viol, group) & ~fit.reshape(-1)
        lo = np.where(demote, -1, lo)
        seg_start = np.where(viol, anchor, seg_min)
        # dead/demoted blocks borrow the segment start (t0 = 0; their
        # entries never encode pass k, so the selects can never hit)
        lo_final = np.where(lo >= 0, lo, np.repeat(seg_start, group))
        in_win = (residual & (lo >= 0)[:, None]
                  & (blocks >= lo_final[:, None])
                  & (blocks < lo_final[:, None] + window))
        offs = np.where(in_win,
                        (k * window + blocks - lo_final[:, None]
                         ).astype(np.int32), offs)
        residual &= ~in_win
        seg_list.append(seg_start.astype(np.int32))
        lo_list.append(lo_final.astype(np.int32))
    ovf_mask = live & residual
    n_live = int(live.sum())
    ok = int(ovf_mask.sum()) <= max_ovf_frac * max(n_live, 1)
    odt = _offs_dtype(window, n_windows) if ok else np.int32
    return (np.stack(seg_list, axis=1), np.stack(lo_list, axis=1),
            offs.astype(odt), ovf_mask, bool(ok))


def plan_banded_gather_rows_multi(indices: np.ndarray, block: int = 512,
                                  window: int = 2048, group: int = 8,
                                  n_windows: int = 3,
                                  max_ovf_frac: float = 0.08,
                                  slope: float = 2.0):
    """K-window per-row plans for an (R, L) index array:
    (seg (R, NG, K), starts (R, NB, K), offs (R, NB, block),
    ovf_pos (R, Kov), ovf_ids (R, Kov), ok).

    offs values live in [0, n_windows*window) — offs // window selects
    the block's window, offs % window the position inside it.  Entries
    no window covers are overflow exactly as in the robust single-window
    planner (kernel emits zero rows; caller patches)."""
    r, length = indices.shape
    seg, starts, offs, ovf_mask, ok = _plan_multi(
        indices, block, window, group, n_windows, max_ovf_frac, slope)
    nb = row_blocks(length, block, group)
    lpad = nb * block
    ovf = ovf_mask.reshape(r, lpad)[:, :length]
    idx = np.asarray(indices)
    pos_list = [np.nonzero(ovf[i])[0] for i in range(r)]
    kov = max((len(p) for p in pos_list), default=0)
    ovf_pos = np.full((r, kov), -1, np.int32)
    ovf_ids = np.zeros((r, kov), np.int32)
    for i, p in enumerate(pos_list):
        ovf_pos[i, : len(p)] = p
        ovf_ids[i, : len(p)] = idx[i, p]
    ng = nb // group
    return (seg.reshape(r, ng, n_windows),
            starts.reshape(r, nb, n_windows),
            offs.reshape(r, nb, block), ovf_pos, ovf_ids, ok)


def frame_tiles(length: int) -> int:
    """Packed 128-id tiles per frame row of `pack_frames`."""
    return (length + _TILE - 1) // _TILE


def pack_frames(x, window: int = 2048, block: int = 512, group: int = 8,
                slope: float = 2.0):
    """(B, L, C<=8) -> (B*frame_tiles(L) + margin, 8, 128) f32: each frame
    packed contiguously at tile base b*frame_tiles(L), plus a tail margin
    so every planned segment DMA stays in-bounds.  Gather plans built
    per-frame address frame b's id i at absolute id b*frame_tiles(L)*128+i
    (add the base to `starts` and `seg_starts`)."""
    b, l, c = x.shape
    assert c <= _CPAD, c
    ntf = frame_tiles(l)
    margin = seg_tiles(window, block, group, slope)
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (0, ntf * _TILE - l), (0, _CPAD - c)))
    flat = xp.reshape(b * ntf, _TILE, _CPAD)
    flat = jnp.concatenate(
        [flat, jnp.zeros((margin, _TILE, _CPAD), jnp.float32)], axis=0)
    return flat.transpose(0, 2, 1)


def _select(wref, t0, offs, window, out=None):
    """Select (8, BL) from packed window tiles wref[t0 + j] (8, 128) at
    offsets offs (1, BL) via vreg-tiled tpu.dynamic_gather. Outputs stay
    channel-sublane / id-lane: transposing to (BL, 8) inside the kernel
    forced an 8-lane-minor store layout that wasted 15/16 of every store
    vreg (measured 2.6x on the whole gather).  `out` threads an
    accumulator across multiple windows (K-window kernel): offsets
    outside [0, window) never hit, so disjoint windows compose."""
    bl = offs.shape[1]
    # plans ship int16 (see _offs_dtype); index math runs int32
    offs8 = jnp.broadcast_to(offs.astype(jnp.int32), (_CPAD, bl))  # (8, BL)
    if out is None:
        out = jnp.zeros((_CPAD, bl), jnp.float32)
    for j in range(window // _TILE):
        src = wref[t0 + j]                               # (8, 128)
        local = offs8 - j * _TILE
        hit = (local >= 0) & (local < _TILE)
        idx = jnp.clip(local, 0, _TILE - 1)
        cols = []
        for m in range(bl // _TILE):
            sl = slice(m * _TILE, (m + 1) * _TILE)
            cols.append(jnp.take_along_axis(
                src, idx[:, sl], axis=1, mode="promise_in_bounds"))
        sel = jnp.concatenate(cols, axis=1)              # (8, BL)
        out = jnp.where(hit, sel, out)
    return out                                           # (8, BL)


def _kernel(seg_ref, starts_ref, offs_ref, table_ref, out_ref, win, sem,
            *, window):
    # One contiguous segment DMA per grid step covers `group` block
    # windows, double-buffered: step g waits on the copy started at step
    # g-1 and immediately issues step g+1's.
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    group = offs_ref.shape[0]
    segn = win.shape[1]
    slot = jax.lax.rem(g, 2)

    def seg_dma(gi, s):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(seg_ref[gi] // _TILE, segn)], win.at[s],
            sem.at[s])

    @pl.when(g == 0)
    def _first():
        seg_dma(0, 0).start()

    @pl.when(g + 1 < ng)
    def _next():
        seg_dma(g + 1, 1 - slot).start()

    seg_dma(g, slot).wait()
    seg0 = seg_ref[g]
    for u in range(group):
        t0 = (starts_ref[g * group + u] - seg0) // _TILE
        out_ref[u] = _select(win.at[slot], t0, offs_ref[u][None], window)  # (8, BL)


def _kernel_multi(seg_ref, starts_ref, offs_ref, table_ref, out_ref, win,
                  sem, *, window, nwin):
    # K-window variant: K contiguous segment DMAs per grid step (one per
    # window slot), double-buffered like the single-window kernel; the
    # select accumulates across the K windows (offs encode the window as
    # offs // window, so each entry hits in exactly one pass).
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    group = offs_ref.shape[0]
    segn = win.shape[2]
    slot = jax.lax.rem(g, 2)

    # seg/starts arrive FLATTENED 1-D: scalar-prefetch (SMEM) pads the
    # minor dim of 2-D arrays to 8, which blew the 1 MB SMEM budget 4x at
    # (nb=222k, K=2) — AOT error "Allocation (size=7.1MB) would exceed
    # memory (size=1MB) space=smem" at 300x1280x720 / 3.55M tracks
    def seg_dma(gi, s, k):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(seg_ref[gi * nwin + k] // _TILE, segn)],
            win.at[s, k], sem.at[s, k])

    @pl.when(g == 0)
    def _first():
        for k in range(nwin):
            seg_dma(0, 0, k).start()

    @pl.when(g + 1 < ng)
    def _next():
        for k in range(nwin):
            seg_dma(g + 1, 1 - slot, k).start()

    for k in range(nwin):
        seg_dma(g, slot, k).wait()
    for u in range(group):
        out = None
        # widen before the window-slot subtraction: plans ship int16 and
        # masked -1 entries sit 1 above int16 min at the dtype boundary
        # (n_windows*window == 2**15) if subtracted in int16
        offs32 = offs_ref[u].astype(jnp.int32)
        for k in range(nwin):
            t0 = (starts_ref[(g * group + u) * nwin + k]
                  - seg_ref[g * nwin + k]) // _TILE
            out = _select(win.at[slot, k], t0,
                          (offs32 - k * window)[None], window, out)
        out_ref[u] = out                                  # (8, BL)


try:  # pallas TPU imports (unavailable on some CPU-only builds)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # noqa: BLE001
    _HAVE_PALLAS = False


@functools.partial(jax.jit, static_argnames=("window", "group",
                                             "interpret", "slope"))
def _banded_gather_call(packed, seg_starts, starts, offs,
                        window: int = 2048, group: int = 8,
                        interpret: bool = False, slope: float = 2.0):
    nb, bl = offs.shape
    assert nb % group == 0, (nb, group)
    segn = seg_tiles(window, bl, group, slope)

    def one_call(seg_c, starts_c, offs_c):
        nb_c = offs_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb_c // group,),
            in_specs=[
                pl.BlockSpec((group, bl), lambda g, seg, starts: (g, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((group, _CPAD, bl),
                                   lambda g, seg, starts: (g, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, segn, _CPAD, _TILE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel, window=window),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb_c, _CPAD, bl), jnp.float32),
            interpret=interpret,
        )(seg_c, starts_c, offs_c, packed)

    bytes_all = (nb + nb // group) * 4
    n_chunks = max(1, -(-bytes_all // _SMEM_PREFETCH_MAX_BYTES))
    rows_per = -(-(nb // group) // n_chunks) * group
    if n_chunks == 1 or rows_per >= nb:
        return one_call(seg_starts, starts, offs)
    outs = []
    for r0 in range(0, nb, rows_per):
        r1 = min(r0 + rows_per, nb)
        outs.append(one_call(seg_starts[r0 // group:r1 // group],
                             starts[r0:r1], offs[r0:r1]))
    return jnp.concatenate(outs, axis=0)


# scalar-prefetch budget per kernel call: SMEM is ~1 MB on v5e; keep the
# flattened seg+starts arrays safely inside it by chunking the row axis
_SMEM_PREFETCH_MAX_BYTES = 600_000


@functools.partial(jax.jit, static_argnames=("window", "group",
                                             "interpret", "slope"))
def _banded_gather_call_multi(packed, seg_starts, starts, offs,
                              window: int = 2048, group: int = 8,
                              interpret: bool = False, slope: float = 2.0):
    nb, bl = offs.shape
    nwin = starts.shape[1]
    assert nb % group == 0, (nb, group)
    assert seg_starts.shape == (nb // group, nwin), (seg_starts.shape,)
    segn = seg_tiles(window, bl, group, slope)

    def one_call(seg_c, starts_c, offs_c):
        nb_c = offs_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb_c // group,),
            in_specs=[
                pl.BlockSpec((group, bl), lambda g, seg, starts: (g, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((group, _CPAD, bl),
                                   lambda g, seg, starts: (g, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, nwin, segn, _CPAD, _TILE), jnp.float32),
                pltpu.SemaphoreType.DMA((2, nwin)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel_multi, window=window, nwin=nwin),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb_c, _CPAD, bl), jnp.float32),
            interpret=interpret,
        )(seg_c.reshape(-1), starts_c.reshape(-1), offs_c, packed)

    # chunk rows so the flattened (1-D) prefetch arrays stay inside SMEM
    bytes_all = (nb + nb // group) * nwin * 4
    n_chunks = max(1, -(-bytes_all // _SMEM_PREFETCH_MAX_BYTES))
    rows_per = -(-(nb // group) // n_chunks) * group
    if n_chunks == 1 or rows_per >= nb:
        return one_call(seg_starts, starts, offs)
    outs = []
    for r0 in range(0, nb, rows_per):
        r1 = min(r0 + rows_per, nb)
        outs.append(one_call(seg_starts[r0 // group:r1 // group],
                             starts[r0:r1], offs[r0:r1]))
    return jnp.concatenate(outs, axis=0)


def banded_gather_multi(packed, seg_starts, starts, offs,
                        channels: int = 3, window: int = 2048,
                        group: int = 8, interpret: bool = False,
                        slope: float = 2.0):
    """K-window gather: packed (NT, 8, 128), seg_starts (NG, K),
    starts (NB, K), offs (NB, BL) with window-encoding offsets
    -> (NB, BL, channels) f32."""
    out = _banded_gather_call_multi(packed, seg_starts, starts, offs,
                                    window, group, interpret, slope)
    return out[:, :channels, :].transpose(0, 2, 1)


def banded_gather_xla_multi(table, starts, offs, window: int = 2048):
    """Reference/fallback for the K-window plan (table row-major (P, C));
    masked entries (offs < 0) produce 0 rows."""
    k = jnp.maximum(offs, 0) // window
    lo = jnp.take_along_axis(starts, k, axis=1)
    idx = jnp.maximum(lo + jnp.maximum(offs, 0) - k * window, 0)
    out = table[idx].astype(jnp.float32)
    return jnp.where((offs >= 0)[..., None], out, 0.0)


def banded_gather_xla(table, starts, offs):
    """Reference/fallback: plain gather through the banded plan
    (table row-major (P, C)); masked entries (offs < 0) produce 0 rows."""
    idx = jnp.maximum(starts[:, None] + offs, 0)
    out = table[idx].astype(jnp.float32)
    return jnp.where((offs >= 0)[..., None], out, 0.0)


def banded_gather(packed, seg_starts, starts, offs, channels: int = 3,
                  window: int = 2048, group: int = 8,
                  interpret: bool = False, slope: float = 2.0):
    """packed (NT, 8, 128) -> (NB, BL, channels) f32 per the plan.

    The kernel stores (NB, 8, BL) channel-sublane blocks (full store-lane
    utilization); the row-major transpose happens here in XLA where it
    fuses with the consumer."""
    out = _banded_gather_call(packed, seg_starts, starts, offs, window,
                              group, interpret, slope)
    return out[:, :channels, :].transpose(0, 2, 1)
