"""Fused multi-head attention for TPU.

Replaces the reference's xformers / torch-SDPA attention backends
(utils/VidToMe/generate_utils.py enables xformers; diffusers' Attention and
cosmos1's TransformerEngine DotProductAttention are the other backends) with:

- a Pallas flash-attention kernel (`_flash_attention_pallas`) tiled for the
  MXU (128-lane blocks, online softmax, O(N) memory), used on TPU;
- a chunked `lax.scan` online-softmax fallback (`_flash_attention_xla`) with
  identical math for CPU tests and odd shapes.

Layout: (B, S, H, D) — batch, sequence, heads, head_dim. Inference-only
(no custom VJP yet): the TC-Light UNet path never backpropagates through
attention; the post-optimization stages do not touch the UNet.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dot_product_attention", "flash_attention"]


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    """Lowering gate that respects utils.device.set_compute_platform (the
    process default backend can be the tunneled TPU while a virtual-CPU
    mesh is the actual compute target, e.g. the driver's dryrun)."""
    from tclight_tpu.utils.device import use_pallas

    return use_pallas()


# exp(x) = exp2(x * log2(e)): folding log2(e) into the logit scale lets the
# kernels run the online softmax entirely in log2 space with exp2, saving
# exp's internal multiply over every (block_q, block_k) tile
_LOG2E = 1.4426950408889634


def _softmax_mask_p(p, kv_idx, kv_len, block_k):
    """Zero the padded-KV columns of an exp'd probability tile with one
    row-broadcast multiply. Padded K rows are zeros, so their logits are
    exactly 0 — a valid extra upper bound for the online max — and zeroing
    p removes them from l and acc exactly. This replaces the full-tile
    iota + compare + select (3 VPU ops over (bq, bk)) the kernels used to
    run on EVERY kv block with one multiply."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) \
        + kv_idx * block_k
    return p * (col < kv_len).astype(p.dtype)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Plain XLA attention (fine for short KV, e.g. cross-attn over 77
    text tokens). q: (B, Sq, H, D), k/v: (B, Skv, H, D). `mask` is a
    boolean array broadcastable to (B, H, Sq, Skv); False keys are
    excluded from the softmax."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# ---------------------------------------------------------------- XLA fallback


def _flash_attention_xla(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float, kv_chunk: int = 1024
) -> jnp.ndarray:
    """Online-softmax attention over KV chunks: O(Sq * kv_chunk) memory."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    n_chunks = -(-skv // kv_chunk)
    pad = n_chunks * kv_chunk - skv
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kc = k.reshape(b, n_chunks, kv_chunk, h, d)
    vc = v.reshape(b, n_chunks, kv_chunk, h, d)
    valid = (
        jnp.arange(n_chunks * kv_chunk).reshape(n_chunks, kv_chunk) < skv
    )

    qf = q.astype(jnp.float32)

    def step(carry, inp):
        m_prev, l_prev, acc = carry
        k_i, v_i, valid_i = inp
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", qf, k_i.astype(jnp.float32)) * scale
        )
        logits = jnp.where(valid_i[None, None, None, :], logits, -jnp.inf)
        m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(logits - m_cur[..., None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_i.astype(jnp.float32)
        )
        return (m_cur, l_cur, acc), None

    m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    acc0 = jnp.zeros((b, h, sq, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        step,
        (m0, l0, acc0),
        (kc.swapaxes(0, 1), vc.swapaxes(0, 1), valid),
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.swapaxes(1, 2).astype(q.dtype)  # (B, Sq, H, D)


# ---------------------------------------------------------------- Pallas TPU


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale, kv_len, block_k):
    """Grid (B*H, n_q, n_kv): the kv axis iterates fastest, so scratch
    (m, l, acc) accumulates the online softmax across KV blocks while
    Pallas double-buffers the K/V block DMAs. Shapes per program:
    q (1, bq, d), k/v (1, bk, d), o (1, bq, d)."""
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # keep matmul operands in the input dtype (bf16 in the SD1.5 path):
    # bf16 x bf16 -> f32 runs the MXU at 2x f32 throughput; accumulation
    # and the online softmax stay in f32 — in log2 space (see _LOG2E).
    q = q_ref[0]
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    logits = (scale * _LOG2E) * jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk), log2 space

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_cur)
    p = jnp.exp2(logits - m_cur)
    if kv_len % block_k:  # static: padded KV columns exist (last block only)
        p = _softmax_mask_p(p, kv_idx, kv_len, block_k)
    l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_cur
    l_ref[:] = l_cur

    @pl.when(kv_idx == n_kv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _flash_kernel_qk_int8(q_ref, k_ref, v_ref, sq_ref, sk_ref, o_ref,
                          m_ref, l_ref, acc_ref, *, scale, kv_len, block_k):
    """Flash attention with the QK^T contraction in int8 on the MXU
    (v5e int8 peak is 2x bf16; QK is ~half the attention FLOPs). Q
    arrives quantized with one scale per (head, q-block) — a scalar per
    program, SageAttention's block granularity — and K with per-token
    scales packed as a (8, block_k) row-vector tile, so neither needs an
    in-kernel relayout; logits = scale * sq * sk_j * <q8_i, k8_j>
    accumulate in int32. The softmax and the PV matmul are unchanged
    from `_flash_kernel`."""
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    v_blk = v_ref[0]
    dots = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bq, bk) int32
    logits = dots.astype(jnp.float32) * (
        (scale * _LOG2E * sq_ref[0, 0, 0]) * sk_ref[0, 0:1, :])

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_cur)
    p = jnp.exp2(logits - m_cur)
    if kv_len % block_k:  # padded smoothed-K rows are zeros -> logits 0
        p = _softmax_mask_p(p, kv_idx, kv_len, block_k)
    l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_cur
    l_ref[:] = l_cur

    @pl.when(kv_idx == n_kv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _flash_kernel_int8_full(q_ref, k_ref, v_ref, sq_ref, sk_ref, sv_ref,
                            o_ref, m_ref, l_ref, acc_ref,
                            *, scale, kv_len, block_k):
    """`_flash_kernel_qk_int8` with the PV matmul ALSO in int8:
    V arrives quantized per (head, channel) — the per-channel scale
    factors out of the KV-token sum, so the int32 dot dequantizes with
    one (1, d) row-vector multiply — and p is quantized per (query row,
    kv block) against its own block max (p <= 1 by construction; the
    row max keeps ~7 bits of relative precision in every block).
    l (the softmax denominator) still accumulates the EXACT f32 p."""
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dots = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bq, bk) int32
    logits = dots.astype(jnp.float32) * (
        (scale * _LOG2E * sq_ref[0, 0, 0]) * sk_ref[0, 0:1, :])

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_cur)
    p = jnp.exp2(logits - m_cur)
    if kv_len % block_k:  # padded smoothed-K rows are zeros -> logits 0
        p = _softmax_mask_p(p, kv_idx, kv_len, block_k)
    l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    sp = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-30)
    p8 = jnp.round(p * (127.0 / sp)).astype(jnp.int8)
    pv = jax.lax.dot_general(
        p8, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bq, d_pad) int32, exact
    # sv (like sq/sk) is amax/127, i.e. v ~= v8 * sv; p ~= p8 * sp/127
    acc_ref[:] = acc_ref[:] * alpha + pv.astype(jnp.float32) * (
        (sp / 127.0) * sv_ref[0, 0:1, :])
    m_ref[:] = m_cur
    l_ref[:] = l_cur

    @pl.when(kv_idx == n_kv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _quantize_rows(x: jnp.ndarray):
    """Symmetric per-row int8 quantization over the last axis:
    returns (int8 values, f32 scales with the last axis dropped)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-6) / 127.0
    q8 = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
    return q8, s[..., 0]


def _quantize_blocks(x: jnp.ndarray, block: int):
    """Symmetric int8 quantization of (N, S, D) with one scale per
    S-block of `block` rows: returns (int8 values, (N, S/block) scales)."""
    n, s, d = x.shape
    xf = x.astype(jnp.float32).reshape(n, s // block, block, d)
    amax = jnp.max(jnp.abs(xf), axis=(2, 3), keepdims=True)
    sc = jnp.maximum(amax, 1e-6) / 127.0
    q8 = jnp.round(xf / sc).astype(jnp.int8).reshape(n, s, d)
    return q8, sc[:, :, 0, 0]


def _quantize_channels(x: jnp.ndarray):
    """Symmetric per-CHANNEL int8 quantization of (N, S, D) over the S
    axis: returns (int8 values, (N, D) scales). Per-channel scales
    factor out of a P@V token sum, which per-token scales cannot."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-6) / 127.0
    q8 = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
    return q8, s[:, 0, :]


def _flash_attention_int8_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 1024,
    block_k: int = 1024,
    pv_int8: bool = False,
) -> jnp.ndarray:
    """XLA emulation of the int8 kernels' MATH: identical K smoothing,
    per-(head, q-block) Q scales, per-token K scales, int32 QK
    accumulation, and (with `pv_int8`) per-channel V + per-(row,
    kv-block) P quantization — but a dense softmax instead of the
    streaming flash accumulation (fp-ordering noise only). Used off-TPU
    so the CPU golden regression can gate the int8 variants' numerics
    without Pallas interpret mode (minutes per call even at toy
    shapes)."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    bh = b * h
    qt = q.transpose(0, 2, 1, 3).reshape(bh, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(bh, skv, d)
    vt = v.transpose(0, 2, 1, 3).reshape(bh, skv, d)
    km = jnp.mean(kt, axis=1, keepdims=True)
    bq = min(block_q, _ceil_to(sq, 128))
    sq_pad = _ceil_to(sq, bq)
    qp = jnp.pad(qt, ((0, 0), (0, sq_pad - sq), (0, 0)))
    q8, sqs = _quantize_blocks(qp, bq)
    k8, sks = _quantize_rows(kt - km)
    dots = jax.lax.dot_general(
        q8, k8, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    sq_full = jnp.repeat(sqs, bq, axis=1)[:, :sq, None]
    logits = dots.astype(jnp.float32)[:, :sq] * (scale * sq_full) \
        * sks[:, None, :]
    if pv_int8:
        bk = min(block_k, _ceil_to(skv, 128))
        skv_pad = _ceil_to(skv, bk)
        pf = jax.nn.softmax(logits, axis=-1)
        pf = jnp.pad(pf, ((0, 0), (0, 0), (0, skv_pad - skv)))
        pb = pf.reshape(bh, sq, skv_pad // bk, bk)
        sp = jnp.maximum(jnp.max(pb, axis=-1, keepdims=True), 1e-30)
        p8 = jnp.round(pb * (127.0 / sp))
        p_deq = (p8 * (sp / 127.0)).reshape(bh, sq, skv_pad)[:, :, :skv]
        v8, svs = _quantize_channels(vt)
        v_deq = v8.astype(jnp.float32) * svs[:, None, :]
        out = jax.lax.dot_general(
            p_deq, v_deq, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    else:
        p = jax.nn.softmax(logits, axis=-1).astype(vt.dtype)
        out = jax.lax.dot_general(
            p, vt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3).astype(q.dtype)


def _flash_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 1024,
    block_k: int = 1024,
    qk_int8: bool = False,
    pv_int8: bool = False,
) -> jnp.ndarray:
    b, sq, h, d = q.shape
    skv = k.shape[1]
    d_pad = _ceil_to(d, 128)
    # 1024x1024 blocks measured 42% faster than 256x512 at the level-0
    # ToMe shape (35640 tokens, d_pad 128) on v5e: fewer grid steps and
    # longer MXU runs per KV block; clamp for short sequences
    block_q = min(block_q, _ceil_to(sq, 128))
    block_k = min(block_k, _ceil_to(skv, 128))
    sq_pad = _ceil_to(sq, block_q)
    skv_pad = _ceil_to(skv, block_k)

    def prep(x, s_pad):
        x = jnp.pad(
            x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0), (0, d_pad - d))
        )
        return x.transpose(0, 2, 1, 3).reshape(b * h, s_pad, d_pad)

    vp = prep(v, skv_pad)
    common = dict(
        # off-TPU the kernel runs in Pallas interpret mode: orders of
        # magnitude slower, but it lets the CPU golden regression gate
        # the int8 variant's numerics (the auto backend never picks
        # pallas off-TPU; only explicit backend= requests land here)
        interpret=not _on_tpu(),
        grid=(b * h, sq_pad // block_q, skv_pad // block_k),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j, kk: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        # v5e has 128 MB VMEM; the 16 MB default scope rejects block
        # configs beyond 1024x2048 that measure faster at ToMe shapes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )
    qkv_spec = [
        pl.BlockSpec((1, block_q, d_pad), lambda i, j, kk: (i, j, 0)),
        pl.BlockSpec((1, block_k, d_pad), lambda i, j, kk: (i, kk, 0)),
        pl.BlockSpec((1, block_k, d_pad), lambda i, j, kk: (i, kk, 0)),
    ]
    if not qk_int8:
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel, scale=scale, kv_len=skv, block_k=block_k
            ),
            in_specs=qkv_spec,
            **common,
        )(prep(q, sq_pad), prep(k, skv_pad), vp)
    else:
        # K smoothing (SageAttention): subtracting the per-(b,h) token-mean
        # from K shifts every logit in a query row by the same constant
        # (q_i . km), so the softmax is EXACTLY unchanged while the int8
        # grid spends its 8 bits on the informative part of K
        km = jnp.mean(k, axis=1, keepdims=True)
        # Q: one scale per (head, q-block) — a scalar per kernel program;
        # K: per-token row scales (K ordering drives the softmax)
        q8, sqs = _quantize_blocks(prep(q, sq_pad), block_q)  # (bh, n_q)
        kp8 = prep(k - km, skv_pad)
        k8, sks = _quantize_rows(kp8)                         # (bh, skv_pad)

        n_q, n_kv = sq_pad // block_q, skv_pad // block_k
        # scale operands packed into legal (8, 128)-tile layouts: sq as a
        # broadcast (8, 128) tile per q-block (kernel reads [0,0,0]), sk
        # as a broadcast (8, block_k) row-vector tile per kv-block
        # (kernel reads [0, 0:1, :]) — no in-kernel relayouts
        sq_t = jnp.broadcast_to(
            sqs[:, :, None, None], (b * h, n_q, 8, 128)
        ).reshape(b * h, n_q * 8, 128)
        sk_t = jnp.broadcast_to(
            sks.reshape(b * h, n_kv, 1, block_k), (b * h, n_kv, 8, block_k)
        ).reshape(b * h, n_kv * 8, block_k)

        scale_specs = [
            pl.BlockSpec((1, 8, 128), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, 8, block_k), lambda i, j, kk: (i, kk, 0)),
        ]
        if pv_int8:
            # V per-(head, channel) int8 + a broadcast (8, d_pad) scale
            # tile per head (kernel reads [0, 0:1, :])
            v8, svs = _quantize_channels(vp)
            sv_t = jnp.broadcast_to(
                svs[:, None, :], (b * h, 8, d_pad))
            out = pl.pallas_call(
                functools.partial(
                    _flash_kernel_int8_full, scale=scale, kv_len=skv,
                    block_k=block_k,
                ),
                in_specs=qkv_spec + scale_specs + [
                    pl.BlockSpec((1, 8, d_pad), lambda i, j, kk: (i, 0, 0)),
                ],
                **common,
            )(q8, k8, v8, sq_t, sk_t, sv_t)
        else:
            out = pl.pallas_call(
                functools.partial(
                    _flash_kernel_qk_int8, scale=scale, kv_len=skv,
                    block_k=block_k,
                ),
                in_specs=qkv_spec + scale_specs,
                **common,
            )(q8, k8, vp, sq_t, sk_t)
    out = out.reshape(b, h, sq_pad, d_pad)[:, :, :sq, :d]
    return out.transpose(0, 2, 1, 3)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    backend: str | None = None,
) -> jnp.ndarray:
    """Memory-efficient attention. q: (B, Sq, H, D); k/v: (B, Skv, H, D).

    backend: None = auto (Pallas on TPU, scan fallback elsewhere),
    'pallas', 'pallas_int8' (QK contraction int8 on the MXU — ~exact
    softmax via K smoothing, quantization error ~1e-2 relative; TPU
    default since the 2026-08-20 metric-neutrality eval),
    'pallas_int8pv' (QK AND PV int8 — eval-gated), 'xla', or 'naive'."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if backend is None:
        from tclight_tpu.utils.device import use_pallas

        backend = "pallas" if use_pallas() else "xla"
    if backend == "pallas":
        return _flash_attention_pallas(q, k, v, scale)
    if backend in ("pallas_int8", "pallas_int8pv"):
        pv = backend.endswith("pv")
        if not _on_tpu():
            # same quantization math, XLA lowering: lets the CPU golden
            # regression gate the variant (interpret mode is minutes/call)
            return _flash_attention_int8_xla(q, k, v, scale, pv_int8=pv)
        return _flash_attention_pallas(q, k, v, scale, qk_int8=True,
                                       pv_int8=pv)
    if backend == "xla":
        return _flash_attention_xla(q, k, v, scale)
    return dot_product_attention(q, k, v, scale)
