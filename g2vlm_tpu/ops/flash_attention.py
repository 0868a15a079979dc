"""Pallas TPU flash attention with segment-metadata masking.

Replaces flash-attn varlen + compiled flex-attention from the reference
(qwen2vl.py:336-344, 399-408, 643-652) with one tiled online-softmax kernel
whose mask rule is evaluated blockwise from per-token TokenInfo metadata
(ops/masks.py) — causal, per-document, and full/noise-split semantics in a
single kernel.

Tiling: grid (num_heads, S_q/BQ, S_kv/BK), KV innermost; fp32 running
max/sum/accumulator live in VMEM scratch across the KV dimension; q/k/v
blocks are pipelined from HBM by the Mosaic pipeliner. GQA maps each q head
to its KV head in the index maps — no materialized KV repeat.

Forward-only: training uses the differentiable chunked XLA path
(ops/attention.py); inference and eval run this kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masks import TokenInfo

NEG_INF = -1e30


def _mask_rule(dq, fq, nq, pq, dk, fk, nk, pk):
    """(BQ,1) q fields vs (1,BK) kv fields -> (BQ,BK) bool. Same rule as
    masks.make_segment_mask."""
    same_doc = (dq == dk) & (dq >= 0) & (dk >= 0)
    causal = pk <= pq
    full = (fq == fk) & (fq >= 0)
    not_hidden_noise = ~((nk >= 0) & (nq != nk))
    return same_doc & (causal | full) & not_hidden_noise


def _flash_kernel(
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    qm_ref,  # (BQ, 4) int32 metadata: doc, fn, noise, pos
    km_ref,  # (BK, 4)
    o_ref,  # (1, BQ, D)
    m_scr,  # (BQ, 128) fp32 running max (lane-broadcast)
    l_scr,  # (BQ, 128) fp32 running sum
    acc_scr,  # (BQ, D) fp32
    *,
    scale: float,
    n_kv_blocks: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, BK)

    qm = qm_ref[:]  # (BQ, 4)
    km = km_ref[:]  # (BK, 4)
    mask = _mask_rule(
        qm[:, 0:1], qm[:, 1:2], qm[:, 2:3], qm[:, 3:4],
        km[:, 0].reshape(1, -1), km[:, 1].reshape(1, -1),
        km[:, 2].reshape(1, -1), km[:, 3].reshape(1, -1),
    )
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[:, :1]  # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (BQ, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    p = jnp.where(mask, p, 0.0)
    alpha = jnp.exp(m_prev - m_new)  # (BQ, 1)

    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_kv_blocks - 1)
    def _():
        l = l_scr[:, :1]
        out = acc_scr[:] / jnp.maximum(l, 1e-30)
        o_ref[0] = out.astype(o_ref.dtype)


def _pack_meta(info: TokenInfo) -> jax.Array:
    return jnp.stack(
        [info.doc_id, info.fn_id, info.noise_id, info.pos], axis=1
    ).astype(jnp.int32)


def flash_segment_attention(
    q: jax.Array,  # (S_q, H, D)
    k: jax.Array,  # (S_kv, KVH, D)
    v: jax.Array,
    q_info: TokenInfo,
    kv_info: TokenInfo,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
) -> jax.Array:
    s_q, h, d = q.shape
    s_kv, kvh, _ = k.shape
    g = h // kvh
    if scale is None:
        scale = d ** -0.5

    block_q = min(block_q, s_q)
    block_kv = min(block_kv, s_kv)

    # pad sequence dims to block multiples (padding masked via doc_id=-1)
    def pad_to(x, n, axis, value=0):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, n - x.shape[axis])
        return jnp.pad(x, pad, constant_values=value) if n > x.shape[axis] else x

    sq_p = -(-s_q // block_q) * block_q
    skv_p = -(-s_kv // block_kv) * block_kv
    # head-major layout for TPU tiling: last two dims are (seq, head_dim)
    qp = pad_to(jnp.swapaxes(q, 0, 1), sq_p, 1)  # (H, S_q, D)
    kp = pad_to(jnp.swapaxes(k, 0, 1), skv_p, 1)  # (KVH, S_kv, D)
    vp = pad_to(jnp.swapaxes(v, 0, 1), skv_p, 1)
    qm = _pack_meta(q_info)
    km = _pack_meta(kv_info)
    # pad query meta doc=-2 (never matches), kv meta doc=-1
    qm = pad_to(qm, sq_p, 0, value=-2)
    km = pad_to(km, skv_p, 0, value=-1)

    n_q = sq_p // block_q
    n_kv = skv_p // block_kv

    kernel = functools.partial(_flash_kernel, scale=scale, n_kv_blocks=n_kv)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, sq_p, d), v.dtype),
        grid=(h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda hh, i, j: (hh, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_kv, d), lambda hh, i, j, g=g: (hh // g, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_kv, d), lambda hh, i, j, g=g: (hh // g, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_q, 4), lambda hh, i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_kv, 4), lambda hh, i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda hh, i, j: (hh, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, qm, km)

    return jnp.swapaxes(out, 0, 1)[:s_q]
