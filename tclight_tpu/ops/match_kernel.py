"""Fused matmul + online argmax Pallas kernel for ToMe matching.

The greedy bipartite matching (ops/tome.py, reference
utils/VidToMe/vidtome/merge.py:85-121) needs, for every src token, the
max cosine score and its argmax over ALL (batch, dst) pairs. XLA cannot
fuse a row-argmax into a matmul: the (B, S, D) f32 score tensor round-
trips HBM (~1.5 GB per 2048-dst chunk at the 960x720 level-0 token
counts), and the chunked `lax.scan` matcher measured 126 ms per matching
regardless of chunk size — pure bandwidth. This kernel keeps each
(block_s, block_d) score tile in VMEM, carrying a running (max, argmax)
pair per src row across dst tiles, exactly like flash attention carries
its online softmax but tracking indices instead of normalizers.

Tie semantics match the DENSE path (merge.py's `s (b d)` argmax): the
grid iterates batch-major then dst-ascending, and a strictly-greater
running update keeps the first occurrence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["online_argmax_scores", "online_argmax_scores_xla"]

def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(a_ref, b_ref, max_ref, idx_ref, m_run, i_run, *, d_total,
            block_d, n_b, n_d):
    """Grid (n_s, B, n_d): dst tiles iterate fastest, then batch; scratch
    (m_run, i_run) carries the running (max, global argmax) per src row.
    a (1, bs, C), b (1, bd, C); outputs (1, bs, 1) written on the last
    (batch, dst) program of each src tile."""
    b_i = pl.program_id(1)
    d_i = pl.program_id(2)

    @pl.when(jnp.logical_and(b_i == 0, d_i == 0))
    def _():
        m_run[:] = jnp.full_like(m_run, -jnp.inf)
        i_run[:] = jnp.zeros_like(i_run)

    bs = a_ref.shape[1]
    sc = jax.lax.dot_general(
        a_ref[0], b_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bs, bd)
    col = jax.lax.broadcasted_iota(jnp.int32, (bs, block_d), 1)
    sc = jnp.where(col + d_i * block_d < d_total, sc, -jnp.inf)

    tile_max = jnp.max(sc, axis=1, keepdims=True)              # (bs, 1)
    # first-occurrence argmax via masked min over the column iota
    tile_arg = jnp.min(
        jnp.where(sc == tile_max, col, 2**30), axis=1, keepdims=True
    )
    gidx = b_i * d_total + d_i * block_d + tile_arg            # (bs, 1)

    better = tile_max > m_run[:]
    m_run[:] = jnp.where(better, tile_max, m_run[:])
    i_run[:] = jnp.where(better, gidx, i_run[:])

    @pl.when(jnp.logical_and(b_i == n_b - 1, d_i == n_d - 1))
    def _():
        max_ref[0] = m_run[:]
        idx_ref[0] = i_run[:]


def online_argmax_scores(
    a: jnp.ndarray,
    bt: jnp.ndarray,
    block_s: int = 512,
    block_d: int = 1024,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """a (B, S, C) x bt (B, D, C) -> (node_max (S,) f32, node_idx (S,) i32).

    node_max[s] = max over (b, d) of a[b, s] . bt[b, d]; node_idx is the
    b-major global index b * D + d of the (first) maximizer — the
    align-batch matching of merge.py:95-108 without materializing the
    (B, S, D) score tensor."""
    b, s, c = a.shape
    d = bt.shape[1]
    block_s = min(block_s, _ceil_to(s, 8))
    block_d = min(block_d, _ceil_to(d, 128))
    s_pad = _ceil_to(s, block_s)
    d_pad = _ceil_to(d, block_d)
    a = jnp.pad(a, ((0, 0), (0, s_pad - s), (0, 0)))
    bt = jnp.pad(bt, ((0, 0), (0, d_pad - d), (0, 0)))
    n_s, n_d = s_pad // block_s, d_pad // block_d

    node_max, node_idx = pl.pallas_call(
        functools.partial(_kernel, d_total=d, block_d=block_d, n_b=b,
                          n_d=n_d),
        grid=(n_s, b, n_d),
        in_specs=[
            pl.BlockSpec((1, block_s, c), lambda i, j, k: (j, i, 0)),
            pl.BlockSpec((1, block_d, c), lambda i, j, k: (j, k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_s, 1), lambda i, j, k: (i, 0, 0)),
            pl.BlockSpec((1, block_s, 1), lambda i, j, k: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_s, block_s, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_s, block_s, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_s, 1), jnp.float32),
            pltpu.VMEM((block_s, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(a, bt)
    return node_max.reshape(-1)[:s], node_idx.reshape(-1)[:s]


def online_argmax_scores_xla(
    a: jnp.ndarray, bt: jnp.ndarray, chunk: int = 2048
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference/fallback with identical semantics (dense when small)."""
    b, s, c = a.shape
    d = bt.shape[1]
    scores = jnp.einsum("bsc,bdc->bsd", a, bt,
                        preferred_element_type=jnp.float32)
    s2 = jnp.swapaxes(scores, 0, 1).reshape(s, b * d)
    return jnp.max(s2, axis=-1), jnp.argmax(s2, axis=-1).astype(jnp.int32)
