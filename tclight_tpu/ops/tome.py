"""Token merging (VidToMe-equivalent) as first-class functional ops.

TPU-native rebuild of utils/VidToMe/vidtome/merge.py (local
`bipartite_soft_matching_randframe` :20, global `bipartite_soft_matching_2s`
:343) and the merge-chain assembly of patch.py `compute_merge` :14-91 — with
NO monkey-patching: our transformer blocks call these ops explicitly.

Design for XLA (static shapes):
- The dynamic quantities of the reference (random dst frame, merge count
  ``r``, growing unmerged-token prefix) are all *statically shaped* here:
  chunks are padded to a fixed frame count, so every (frames, tokens,
  ratio) combination maps to fixed index-array sizes; the random dst-frame
  choice is a traced scalar that selects *which* indices are gathered, not
  how many.
- Similarity scores ``a @ b^T`` are the hot matmul (MXU); matching uses
  argmax + argsort (XLA sorts); merge/unmerge are take/scatter ops.
- The recursive F->1 local merge of the reference becomes a static list of
  per-level specs (`plan_local_levels`); depth > 1 requires F to be a
  multiple of the target stride (pad the chunk otherwise), keeping every
  level's shape static.

Sequence layout (matching the reference): a joined chunk is
``[unm_pre | frame_0 tokens | frame_1 tokens | ...]``; a merged sequence is
``[unmerged_src | dst]`` with dst = ``[dst frame tokens, previous unmerged]``.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from einops import rearrange

__all__ = [
    "MergeIndices",
    "LocalLevelSpec",
    "plan_local_levels",
    "compute_local_merge",
    "compute_split_merge",
    "tome_merge",
    "tome_unmerge",
    "unmerge_rows",
    "compose_rows",
    "gather_rows",
    "join_frame",
    "split_frame",
    "local_merge_sequence",
    "local_unmerge_rows",
    "local_unmerge_sequence",
    "global_merge",
    "global_unmerge",
    "global_unmerge_rows",
]


def join_frame(x: jnp.ndarray, fsize: int) -> jnp.ndarray:
    """(B*F, N, C) -> (B, F*N, C) (vidtome/utils.py join_frame)."""
    return rearrange(x, "(b f) n c -> b (f n) c", f=fsize)


def split_frame(x: jnp.ndarray, fsize: int) -> jnp.ndarray:
    """(B, F*N, C) -> (B*F, N, C)."""
    return rearrange(x, "b (f n) c -> (b f) n c", f=fsize)


class MergeIndices(NamedTuple):
    """Matching result; all arrays statically shaped.

    a_idx (S,): src token positions in the full sequence.
    b_idx (D,): dst token positions.
    unm_idx (B, S-r): indices into src of tokens kept unmerged.
    src_idx (B, r): indices into src of merged tokens.
    dst_idx (B, r): for each merged src token, its dst slot in [0, D).
    n_total: full sequence length (S + D).
    """

    a_idx: jnp.ndarray
    b_idx: jnp.ndarray
    unm_idx: jnp.ndarray
    src_idx: jnp.ndarray
    dst_idx: jnp.ndarray
    n_total: int


class LocalLevelSpec(NamedTuple):
    """Static spec for one level of the recursive local merge."""

    f: int          # frames entering this level
    tnum: int       # tokens per frame
    unm_pre: int    # accumulated unmerged-token prefix
    stride: int     # effective target stride (min(target_stride, f))
    n_dst_frames: int
    r: int          # merged src tokens
    n_src: int      # src token count
    n_dst: int      # dst token count (incl. unm_pre)


def plan_local_levels(
    f: int, tnum: int, ratio: float, target_stride: int = 4
) -> list[LocalLevelSpec]:
    """Static plan of the recursive local merge chain (patch.py:43-56):
    repeatedly merge F frames down to F//stride dst frames until one frame
    remains. Every level's sizes are compile-time constants."""
    levels: list[LocalLevelSpec] = []
    unm_pre = 0
    cur_f = f
    while cur_f > 1:
        stride = min(target_stride, cur_f)
        if cur_f % stride != 0:
            raise ValueError(
                f"frame count {cur_f} not a multiple of stride {stride}; "
                "pad the chunk to a multiple of the target stride"
            )
        n_dst_frames = cur_f // stride
        n_src = (cur_f - n_dst_frames) * tnum
        n_dst = n_dst_frames * tnum + unm_pre
        r = min(n_src, int(n_src * ratio))
        levels.append(
            LocalLevelSpec(cur_f, tnum, unm_pre, stride, n_dst_frames, r, n_src, n_dst)
        )
        unm_pre += n_src - r
        cur_f = n_dst_frames
    return levels


def _greedy_match(
    metric: jnp.ndarray,
    a_idx: jnp.ndarray,
    b_idx: jnp.ndarray,
    r: int,
    align_batch: bool,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cosine-similarity greedy bipartite matching (merge.py:85-121).

    Returns (unm_idx, src_idx, dst_idx), each (B, ·) (B=1 when aligned,
    broadcast by the callers)."""
    mn = metric * jax.lax.rsqrt(
        jnp.sum(metric.astype(jnp.float32) ** 2, axis=-1, keepdims=True) + 1e-20
    ).astype(metric.dtype)
    if (align_batch and
            metric.shape[0] * a_idx.shape[0] * b_idx.shape[0]
            > _CHUNKED_MATCH_THRESHOLD):
        return _greedy_match_chunked(mn, a_idx, b_idx, r)
    a = mn[:, a_idx]  # (B, S, C)
    b = mn[:, b_idx]  # (B, D, C)
    # hot matmul: (B, S, C) x (B, C, D) on the MXU, fp32 accumulation
    scores = jnp.einsum("bsc,bdc->bsd", a, b, preferred_element_type=jnp.float32)
    d = scores.shape[-1]

    if align_batch:
        # one matching shared across the batch: concatenate dst axis over
        # batch, pick max over all samples (merge.py:95-108)
        s2 = rearrange(scores, "b s d -> s (b d)")
        node_max = jnp.max(s2, axis=-1)
        node_idx = jnp.argmax(s2, axis=-1)
        edge_idx = jnp.argsort(-node_max)  # (S,), descending
        src_idx = edge_idx[:r][None]
        unm_idx = edge_idx[r:][None]
        dst_idx = (node_idx[src_idx[0]] % d)[None]
    else:
        node_max = jnp.max(scores, axis=-1)  # (B, S)
        node_idx = jnp.argmax(scores, axis=-1)
        edge_idx = jnp.argsort(-node_max, axis=-1)
        src_idx = edge_idx[:, :r]
        unm_idx = edge_idx[:, r:]
        dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=-1)
    return unm_idx, src_idx, dst_idx


# scores tensors above this element count never materialize; the max /
# argmax runs online over dst chunks (see _greedy_match_chunked)
_CHUNKED_MATCH_THRESHOLD = 2 ** 28
_MATCH_CHUNK = 2048
# above this score-tensor size the fused Pallas matmul+argmax kernel
# beats the scan (measured crossover on v5e, ops/match_kernel.py).
# Round-5 in-graph slot profile: at the flagship B=2 level-0 shapes
# (2 x 23760 x 24576 = 1.17e9) the kernel is ~10 ms/slot FASTER than the
# chunked scan (602 vs 612 ms bank-slot, tools/profile_slot.py
# 'match-kernel' variant) — the earlier 2e9 gate came from an isolated
# wrapper measurement that carried layout transposes the in-graph
# lowering fuses away
_KERNEL_MATCH_MIN_ELEMS = 1_000_000_000


def _greedy_match_chunked(
    mn: jnp.ndarray, a_idx: jnp.ndarray, b_idx: jnp.ndarray, r: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """align_batch greedy matching with an online max over dst chunks.

    The naive (S, B*D) score matrix is ~18 GB at 960x720 level-0 token
    counts (23760^2 x 8 x f32): XLA lowers it as a rematerializing loop
    fusion off the MXU (~500 ms per block on v5e). Scanning dst chunks
    keeps each (S, chunk) dot a real MXU matmul with O(S*chunk) memory —
    near-identical argmax semantics: node_max (hence src/unm selection)
    matches the dense path exactly; dst_idx ties are resolved in
    chunk-major/batch-minor order (the fold iterates dst chunks outermost),
    whereas the dense `(b d)` rearrange resolves exact-score ties
    batch-major — only tie-broken dst_idx can differ, which occurs with
    probability ~0 for continuous activations."""
    b_n, _, c = mn.shape
    a = mn[:, a_idx]  # (B, S, C)
    bt = mn[:, b_idx]  # (B, D, C)
    s = a.shape[1]
    d = bt.shape[1]
    from tclight_tpu.utils.device import use_pallas

    if use_pallas() and b_n * s * d > _KERNEL_MATCH_MIN_ELEMS:
        # fused matmul+argmax kernel: at large batchxscore sizes the scan
        # below is bound by its (B, S, chunk) f32 score round-trips
        # (B=8, 23760^2, C=320: scan 120 ms vs kernel 76 ms on v5e; at
        # the default pipeline's B=2 shapes both are ~60 ms and the scan
        # stays default). The kernel keeps score tiles in VMEM
        # (ops/match_kernel.py) and matches DENSE tie semantics.
        from tclight_tpu.ops.match_kernel import online_argmax_scores

        node_max, node_idx = online_argmax_scores(a, bt)
        edge_idx = jnp.argsort(-node_max)
        src_idx = edge_idx[:r][None]
        unm_idx = edge_idx[r:][None]
        dst_idx = (node_idx[src_idx[0]] % d)[None]
        return unm_idx, src_idx, dst_idx
    ck = _MATCH_CHUNK
    d_pad = -(-d // ck) * ck
    bt = jnp.pad(bt, ((0, 0), (0, d_pad - d), (0, 0)))
    n_chunks = d_pad // ck
    chunks = bt.reshape(b_n, n_chunks, ck, c).transpose(1, 0, 2, 3)
    chunk_valid = (
        jnp.arange(d_pad).reshape(n_chunks, ck) < d
    )

    def body(carry, inp):
        node_max, node_idx, j = carry
        blk, valid = inp  # (B, ck, C), (ck,)
        # (B, S, ck) per-batch MXU dots, f32 accumulation
        sc = jnp.einsum("bsc,bkc->bsk", a, blk,
                        preferred_element_type=jnp.float32)
        sc = jnp.where(valid[None, None, :], sc, -jnp.inf)
        cmax = jnp.max(sc, axis=-1)          # (B, S)
        cidx = jnp.argmax(sc, axis=-1)       # (B, S) within chunk
        # fold batch: first max wins in b-major order (strict >)
        def fold(carry, inp):
            m, ix = carry
            cm, ci, bi = inp
            better = cm > m
            gidx = bi * d + j * ck + ci
            return (jnp.where(better, cm, m),
                    jnp.where(better, gidx, ix)), None

        (node_max, node_idx), _ = jax.lax.scan(
            fold, (node_max, node_idx),
            (cmax, cidx, jnp.arange(b_n)),
        )
        return (node_max, node_idx, j + 1), None

    init = (jnp.full((s,), -jnp.inf, jnp.float32),
            jnp.zeros((s,), jnp.int32), jnp.int32(0))
    (node_max, node_idx, _), _ = jax.lax.scan(
        body, init, (chunks, chunk_valid)
    )
    edge_idx = jnp.argsort(-node_max)
    src_idx = edge_idx[:r][None]
    unm_idx = edge_idx[r:][None]
    dst_idx = (node_idx[src_idx[0]] % d)[None]
    return unm_idx, src_idx, dst_idx


def compute_local_merge(
    metric: jnp.ndarray,
    spec: LocalLevelSpec,
    randf: jnp.ndarray,
    align_batch: bool = True,
) -> MergeIndices:
    """Build merge indices for one local level. `randf` is a traced scalar
    in [0, spec.stride) choosing the dst frame group — shapes stay static
    because the dst-frame *count* is fixed by the plan."""
    f, tnum, unm_pre = spec.f, spec.tnum, spec.unm_pre
    n_frame_tok = f * tnum
    # stable partition (src frames in order, then dst frames): tokens
    # within a frame are contiguous, so partition the f-length FRAME axis
    # (a trivial sort) and expand — not the f*tnum token axis (a ~43k-int
    # sort per level at 960x720 that XLA runs every step)
    is_dst_f = (jnp.arange(f, dtype=jnp.int32) % spec.stride) == randf
    order_f = jnp.argsort(is_dst_f, stable=True)  # (f,)
    order = (
        order_f[:, None] * tnum + jnp.arange(tnum, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    a_idx = order[: spec.n_src] + unm_pre
    b_frames = order[spec.n_src :] + unm_pre
    # previous unmerged tokens appended to dst (merge.py:66-69)
    b_idx = jnp.concatenate([b_frames, jnp.arange(unm_pre, dtype=order.dtype)])
    unm_idx, src_idx, dst_idx = _greedy_match(
        metric, a_idx, b_idx, spec.r, align_batch
    )
    return MergeIndices(a_idx, b_idx, unm_idx, src_idx, dst_idx, n_frame_tok + unm_pre)


def compute_split_merge(
    metric: jnp.ndarray,
    src_len: int,
    ratio: float,
    align_batch: bool = True,
) -> MergeIndices:
    """[src | dst] split matching (merge.py bipartite_soft_matching_2s:343):
    first `src_len` tokens are src, the rest dst."""
    n = metric.shape[1]
    r = min(src_len, int(src_len * ratio))
    a_idx = jnp.arange(src_len, dtype=jnp.int32)
    b_idx = jnp.arange(src_len, n, dtype=jnp.int32)
    unm_idx, src_idx, dst_idx = _greedy_match(metric, a_idx, b_idx, r, align_batch)
    return MergeIndices(a_idx, b_idx, unm_idx, src_idx, dst_idx, n)


def _bcast_batch(idx: jnp.ndarray, b: int) -> jnp.ndarray:
    return jnp.broadcast_to(idx, (b,) + idx.shape[1:])


def tome_merge(x: jnp.ndarray, mi: MergeIndices, mode: str = "replace") -> jnp.ndarray:
    """Merge tokens: (B, N, C) -> (B, n_unm + n_dst, C) = [unm | dst].

    "replace": merged src tokens are dropped (dst wins) — the TC-Light
    default. "mean": dst slots become the mean of themselves + all srcs
    merged into them (torch scatter_reduce 'mean', include_self)."""
    b = x.shape[0]
    if mode == "replace":
        # one composed gather: unm positions = a_idx[unm_idx], so the
        # (B, S, C) src intermediate (41 MB/slot at 960x720 level 0)
        # never materializes
        comp = jnp.concatenate(
            [mi.a_idx[mi.unm_idx], jnp.broadcast_to(
                mi.b_idx[None], (mi.unm_idx.shape[0],) + mi.b_idx.shape)],
            axis=1,
        )  # (Bi, n_unm + D)
        return jnp.take_along_axis(
            x, _bcast_batch(comp, b)[..., None], axis=1)
    src = x[:, mi.a_idx]
    dst = x[:, mi.b_idx]
    unm = jnp.take_along_axis(src, _bcast_batch(mi.unm_idx, b)[..., None], axis=1)
    src_sel = jnp.take_along_axis(src, _bcast_batch(mi.src_idx, b)[..., None], axis=1)
    d_idx = _bcast_batch(mi.dst_idx, b)

    def _mean_one(dst_i, src_i, didx_i):
        sums = jnp.zeros_like(dst_i).at[didx_i].add(src_i)
        counts = (
            jnp.zeros(dst_i.shape[0], dtype=src_i.dtype)
            .at[didx_i]
            .add(1.0)
        )
        return (dst_i + sums) / (1.0 + counts)[:, None]

    dst = jax.vmap(_mean_one)(dst, src_sel, d_idx)
    return jnp.concatenate([unm, dst], axis=1)


def unmerge_rows(mi: MergeIndices) -> jnp.ndarray:
    """Int32 row map g (Bi, n_total) inverting `tome_merge` ("replace"):
    unmerged[p] = merged[g[p]]. The three write sets (dst, unmerged src,
    merged src) partition [0, n_total), so scattering SOURCE ROW NUMBERS
    (4 bytes/row instead of 2*C) and gathering once replaces three
    full-width (n_total, C) scatters; maps of chained merges compose with
    `compose_rows` into a single final gather."""
    n_unm = mi.unm_idx.shape[-1]
    unm_pos = mi.a_idx[mi.unm_idx]                 # (Bi, n_unm)
    src_pos = mi.a_idx[mi.src_idx]                 # (Bi, r)
    d_rows = n_unm + jnp.arange(mi.b_idx.shape[0], dtype=jnp.int32)

    def _rowmap_one(unm_pos_i, src_pos_i, dst_idx_i):
        g = jnp.zeros((mi.n_total,), jnp.int32)
        g = g.at[mi.b_idx].set(d_rows)
        g = g.at[unm_pos_i].set(jnp.arange(n_unm, dtype=jnp.int32))
        g = g.at[src_pos_i].set(n_unm + dst_idx_i)
        return g

    return jax.vmap(_rowmap_one)(unm_pos, src_pos, mi.dst_idx)  # (Bi, N)


def compose_rows(outer: jnp.ndarray, inner: jnp.ndarray) -> jnp.ndarray:
    """Compose row maps: result[b, q] = outer[b, inner[b, q]] (batch dims
    broadcast, so align_batch Bi=1 maps mix with per-batch ones)."""
    bb = max(outer.shape[0], inner.shape[0])
    outer = jnp.broadcast_to(outer, (bb,) + outer.shape[1:])
    inner = jnp.broadcast_to(inner, (bb,) + inner.shape[1:])
    return jnp.take_along_axis(outer, inner, axis=1)


def gather_rows(y: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Apply a row map: (B, M, C), (Bi, N) -> (B, N, C)."""
    return jnp.take_along_axis(
        y, _bcast_batch(rows, y.shape[0])[..., None], axis=1)


def tome_unmerge(y: jnp.ndarray, mi: MergeIndices) -> jnp.ndarray:
    """Invert `tome_merge`: (B, n_unm + n_dst, C) -> (B, N, C). Restored
    merged-src tokens copy their dst token's value (merge.py:137-158)."""
    return gather_rows(y, unmerge_rows(mi))


def local_merge_sequence(
    x: jnp.ndarray,
    metric: jnp.ndarray,
    levels: Sequence[LocalLevelSpec],
    randf: jnp.ndarray,
    align_batch: bool = True,
    mode: str = "replace",
) -> tuple[jnp.ndarray, list[MergeIndices]]:
    """Apply the full local merge chain to a joined sequence (B, F*T, C).

    `metric` is the tensor used for similarity (the reference uses the
    pre-attention hidden states themselves). The same `randf` scalar drives
    every level (all reference blocks share generator state per forward).
    Returns merged tokens + per-level indices for unmerging."""
    infos: list[MergeIndices] = []
    for spec in levels:
        mi = compute_local_merge(metric, spec, randf % spec.stride, align_batch)
        x = tome_merge(x, mi, mode)
        metric = tome_merge(metric, mi, mode)
        infos.append(mi)
    return x, infos


def local_unmerge_rows(infos: Sequence[MergeIndices]) -> jnp.ndarray:
    """Composed row map for the whole local chain: one int32 map from
    original positions to rows of the final merged sequence."""
    rows = unmerge_rows(infos[0])
    for mi in infos[1:]:
        rows = compose_rows(unmerge_rows(mi), rows)
    return rows


def local_unmerge_sequence(
    y: jnp.ndarray, infos: Sequence[MergeIndices]
) -> jnp.ndarray:
    return gather_rows(y, local_unmerge_rows(infos))


def global_merge(
    local_tokens: jnp.ndarray,
    global_tokens: jnp.ndarray,
    metric_local: jnp.ndarray,
    metric_global: jnp.ndarray,
    ratio: float,
    flip: jnp.ndarray,
    align_batch: bool = True,
    mode: str = "replace",
) -> tuple[jnp.ndarray, MergeIndices, jnp.ndarray]:
    """Merge local tokens against the persistent global token bank
    (patch.py:59-82). `flip` (traced bool) randomly picks which side is src
    — local and global banks have equal (padded) length, so both branches
    share one static shape. Returns (merged, indices, flip)."""
    assert local_tokens.shape == global_tokens.shape, (
        "global bank must match local merged length (pad chunks to equal size)"
    )
    src_len = local_tokens.shape[1]
    flip_b = flip[..., None, None] if flip.ndim == 0 else flip

    def _order(a, b):
        return jnp.where(flip_b, jnp.concatenate([b, a], 1), jnp.concatenate([a, b], 1))

    tokens = _order(local_tokens, global_tokens)
    metric = _order(metric_local, metric_global)
    mi = compute_split_merge(metric, src_len, ratio, align_batch)
    merged = tome_merge(tokens, mi, mode)
    return merged, mi, flip


def global_unmerge_rows(
    mi: MergeIndices, flip: jnp.ndarray, src_len: int
) -> jnp.ndarray:
    """Row map restoring the *local* half of a global merge: src half when
    local was src (flip=False), dst half otherwise — selected on the int32
    map so only local-half rows are ever gathered."""
    rows = unmerge_rows(mi)  # (Bi, 2*src_len)
    flip_r = flip if flip.ndim == 0 else flip[..., None]
    return jnp.where(flip_r, rows[:, src_len:], rows[:, :src_len])


def global_unmerge(
    y: jnp.ndarray, mi: MergeIndices, flip: jnp.ndarray, src_len: int
) -> jnp.ndarray:
    """Invert `global_merge`, returning the restored *local* chunk
    (merge.py unmerge_chunk semantics)."""
    return gather_rows(y, global_unmerge_rows(mi, flip, src_len))
