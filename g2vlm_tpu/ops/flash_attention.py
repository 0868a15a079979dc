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

Differentiable: flash_segment_attention carries a custom VJP whose backward
is two more Pallas kernels (dq; and per-q-head dk/dv reduced over GQA groups
outside). Training can therefore run the Pallas path end-to-end; the chunked
XLA formulation (ops/attention.py) remains the portable default.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masks import TokenInfo

NEG_INF = -1e30
_LOG2E = 1.4426950408889634  # log2(e): exp(x) == exp2(x * _LOG2E)
# Shiftless static softmax: weights saturate at 2^_SAT. Row sums stay
# < 2^_SAT * S_kv << 2^127 (fp32 max), so no per-row shift is needed at
# all — softmax normalization cancels any constant. Exact for |logits|
# <= _SAT log2 units (~69 nats; qk-normed decoder ~11 nats, un-normed
# ViTs ~tens); beyond that weights clamp instead of overflowing to NaN.
_SAT = 100.0

# per-(q-block, kv-block) visibility classification, computed host/XLA-side
# from block min/max of the token metadata and prefetched into SMEM. The
# kernels skip SKIP tiles entirely (no MXU/VPU work) and drop the ~10-op/
# element mask rule on FULL tiles — at the 32-view recon prefill ~97% of
# tiles are FULL, for training packs most cross-document tiles are SKIP.
BLOCK_SKIP, BLOCK_PARTIAL, BLOCK_FULL = 0, 1, 2


def _block_codes(qm, km_t, block_q, block_kv):
    """(Sq,4) q meta + (4,Skv) kv meta -> (n_q, n_kv) int32 tile codes.

    Conservative: FULL only when every pair in the tile is provably visible,
    SKIP only when provably invisible (disjoint doc-id ranges); PARTIAL
    otherwise falls back to the in-kernel mask rule."""
    n_q = qm.shape[0] // block_q
    n_kv = km_t.shape[1] // block_kv

    def qstats(col):
        xb = qm[:, col].reshape(n_q, block_q)
        return xb.min(1)[:, None], xb.max(1)[:, None]  # (n_q, 1)

    def kstats(row):
        xb = km_t[row].reshape(n_kv, block_kv)
        return xb.min(1)[None, :], xb.max(1)[None, :]  # (1, n_kv)

    dq_lo, dq_hi = qstats(0)
    fq_lo, fq_hi = qstats(1)
    nq_lo, nq_hi = qstats(2)
    pq_lo, _ = qstats(3)
    dk_lo, dk_hi = kstats(0)
    fk_lo, fk_hi = kstats(1)
    nk_lo, nk_hi = kstats(2)
    _, pk_hi = kstats(3)

    same_doc_all = (
        (dq_lo == dq_hi) & (dk_lo == dk_hi) & (dq_lo == dk_lo) & (dq_lo >= 0)
    )
    full_all = (
        (fq_lo == fq_hi) & (fk_lo == fk_hi) & (fq_lo == fk_lo) & (fq_lo >= 0)
    )
    causal_all = pk_hi <= pq_lo
    noise_ok_all = (nk_hi < 0) | (
        (nq_lo == nq_hi) & (nk_lo == nk_hi) & (nq_lo == nk_lo)
    )
    full = same_doc_all & (full_all | causal_all) & noise_ok_all
    # provably invisible: doc-id ranges disjoint (or all padding), or the
    # tile lies strictly above the causal diagonal with no full-attention
    # spans on either side (fn < 0 everywhere)
    overlap = (dq_hi >= dk_lo) & (dk_hi >= dq_lo) & (dq_hi >= 0) & (dk_hi >= 0)
    _, pq_hi = qstats(3)
    pk_lo, _ = kstats(3)
    causal_none = pk_lo > pq_hi
    full_none = (fq_hi < 0) | (fk_hi < 0)
    visible_none = (~overlap) | (causal_none & full_none)
    codes = jnp.where(
        full, BLOCK_FULL, jnp.where(visible_none, BLOCK_SKIP, BLOCK_PARTIAL)
    )
    return codes.astype(jnp.int32)


def _mask_rule(dq, fq, nq, pq, dk, fk, nk, pk):
    """(BQ,1) q fields vs (1,BK) kv fields -> (BQ,BK) bool. Same rule as
    masks.make_segment_mask."""
    same_doc = (dq == dk) & (dq >= 0) & (dk >= 0)
    causal = pk <= pq
    full = (fq == fk) & (fq >= 0)
    not_hidden_noise = ~((nk >= 0) & (nq != nk))
    return same_doc & (causal | full) & not_hidden_noise


def _tile_mask(qm_ref, km_ref):
    qm = qm_ref[:]  # (BQ, 4)
    km = km_ref[:]  # (4, BK)
    return _mask_rule(
        qm[:, 0:1], qm[:, 1:2], qm[:, 2:3], qm[:, 3:4],
        km[0:1, :], km[1:2, :], km[2:3, :], km[3:4, :],
    )


def _online_softmax_update(s, mask, v, m_scr, l_scr, acc_scr,
                           static_max=False):
    """One kv-tile contribution to the running (m, l, acc) statistics.
    mask=None on BLOCK_FULL tiles skips all masking VPU work.

    static_max: SHIFTLESS exponentiation — softmax is shift-invariant and
    fp32's exponent range covers the whole admissible logit domain (see
    _SAT), so no per-row shift is subtracted at all: no running max, no
    alpha rescales of l/acc, no max-reduce -> exp serialization, and one
    fewer VPU pass (the broadcast subtract) per score tile."""
    if static_max:
        # s is pre-scaled by scale*log2(e) (folded into q outside the
        # kernel), so exp2 with no per-element multiplies at all
        # (bf16 exp2 measured no faster — Mosaic does not pack bf16
        # transcendentals). The single min saturates pathological logits
        # at 2^_SAT instead of overflowing exp2 -> inf -> NaN.
        p = jnp.exp2(jnp.minimum(s, _SAT))
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        l_scr[:, :1] += jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] += jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return
    m_prev = m_scr[:, :1]  # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (BQ, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    if mask is not None:
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


def _flash_kernel(
    codes_ref,  # (n_q, n_kv) int32 in SMEM (scalar prefetch)
    q_ref,  # (G, BQ, D) — ALL q heads of one GQA group packed per step, so
            # each kv block is fetched once per group instead of once per
            # q head (6x less KV HBM traffic at Qwen2-VL's 12:2 ratio)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    qm_ref,  # (BQ, 4) int32 metadata: doc, fn, noise, pos
    km_ref,  # (4, BK) — TRANSPOSED so each field is a lane row; slicing
             # (BK, 4) columns into (1, BK) rows would be a sublane->lane
             # relayout that makes Mosaic spill ~130MB of registers
    o_ref,  # (G, BQ, D)
    m_scr,  # (G*BQ, 128) fp32 running max / static bound (lane-broadcast)
    l_scr,  # (G*BQ, 128) fp32 running sum
    acc_scr,  # (G*BQ, D) fp32
    *,
    scale: float,
    n_kv_blocks: int,
    static_max: bool,
):
    i = pl.program_id(1)
    j = pl.program_id(2)
    code = codes_ref[i, j]
    g, bq, d = q_ref.shape

    @pl.when(j == 0)
    def _():
        if not static_max:
            # shiftless static path never reads m_scr (see
            # _online_softmax_update); only the online form needs it
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def scores():
        s = jax.lax.dot_general(
            q_ref[...].reshape(g * bq, d),
            k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G*BQ, BK)
        # static_max: q pre-scaled outside the kernel -> no per-element scale
        return s if static_max else s * scale

    @pl.when(code == BLOCK_FULL)
    def _():
        # (sub-chunking the kv block into independent dot->exp2->dot chains
        # was tried for MXU/VPU overlap and REGRESSED 14.3 -> 12.1 fps —
        # Mosaic schedules the whole-tile form better; keep it)
        _online_softmax_update(
            scores(), None, v_ref[0], m_scr, l_scr, acc_scr,
            static_max=static_max,
        )

    @pl.when(code == BLOCK_PARTIAL)
    def _():
        # token mask is head-independent: tile across the packed heads
        mask = jnp.tile(_tile_mask(qm_ref, km_ref), (g, 1))
        s = jnp.where(mask, scores(), NEG_INF)
        _online_softmax_update(
            s, mask, v_ref[0], m_scr, l_scr, acc_scr, static_max=static_max
        )

    @pl.when(j == n_kv_blocks - 1)
    def _():
        l = l_scr[:, :1]
        out = acc_scr[:] / jnp.maximum(l, 1e-30)
        o_ref[...] = out.reshape(g, bq, d).astype(o_ref.dtype)



def _flash_kernel_lse(
    codes_ref, q_ref, k_ref, v_ref, qm_ref, km_ref, o_ref, lse_ref,
    m_scr, l_scr, acc_scr, *, scale: float, n_kv_blocks: int,
    static_max: bool,
):
    """Forward that also emits the per-row logsumexp (for the backward)."""
    _flash_kernel(
        codes_ref, q_ref, k_ref, v_ref, qm_ref, km_ref, o_ref,
        m_scr, l_scr, acc_scr, scale=scale, n_kv_blocks=n_kv_blocks,
        static_max=static_max,
    )
    j = pl.program_id(2)

    @pl.when(j == n_kv_blocks - 1)
    def _():
        g, bq = lse_ref.shape[0], lse_ref.shape[1]
        l = l_scr[:, :1]
        if static_max:
            # shiftless: l already equals sum(exp(logits)) in natural units
            m = jnp.zeros_like(l)
        else:
            m = m_scr[:, :1]
        # fully-masked rows: lse = NEG_INF so backward p = exp(-inf) = 0
        lse = jnp.where(
            l > 0.0, m + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF
        )
        lse_ref[...] = jnp.broadcast_to(lse, (g * bq, 128)).reshape(
            g, bq, 128
        )


def _flash_kernel_pipe(
    codes_ref, q_ref, k_ref, v_ref, qm_ref, km_ref, o_ref, *rest,
    n_kv_blocks: int, with_lse: bool,
):
    """2-stage software-pipelined SHIFTLESS forward.

    The plain kernel's per-tile chain QK(MXU) -> exp2(VPU) -> PV(MXU) is a
    serial dependency, so the MXU idles during the exp2 pass (measured
    33.6 ms/layer vs the 19.6 ms MXU roofline at the 25k-token prefill).
    Here the grid runs n_kv+1 steps: step j STAGES tile j's (pre-masked)
    scores and V block into a ping-pong VMEM scratch and FLUSHES tile
    j-1's exp2/sum/PV from the other slot. The staged QK dot has no data
    dependence on the flush, so Mosaic can overlap MXU and VPU work.
    Masking (PARTIAL tiles) happens at stage time — masked scores become
    NEG_INF, so the flush is uniform exp2/accumulate with zero mask work.
    Static-max/shiftless only: the online-softmax form carries a running
    max whose alpha-rescale makes flushes order-dependent."""
    if with_lse:
        lse_ref, s_scr, v_scr, l_scr, acc_scr = rest
    else:
        s_scr, v_scr, l_scr, acc_scr = rest
    i = pl.program_id(1)
    j = pl.program_id(2)
    g, bq, d = q_ref.shape
    jc = jnp.minimum(j, n_kv_blocks - 1)
    code = codes_ref[i, jc]
    slot = jax.lax.rem(j, 2)  # fill slot; the pending tile is the other one
    flush_slot = jax.lax.rem(j + 1, 2)

    @pl.when(j == 0)
    def _():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        # nothing pending yet: NEG_INF scores flush to p = 0. v must be
        # zeroed too — 0 * VMEM garbage could be 0 * NaN
        s_scr[pl.ds(1, 1)] = jnp.full(
            (1,) + s_scr.shape[1:], NEG_INF, s_scr.dtype
        )
        v_scr[pl.ds(1, 1)] = jnp.zeros(
            (1,) + v_scr.shape[1:], v_scr.dtype
        )

    # ---- fill stage (unconditional straight-line: the MXU QK dot of tile
    # j has no data dependence on the flush of tile j-1 below — ping-pong
    # slots, so the scheduler is free to interleave them) ----
    s = jax.lax.dot_general(
        q_ref[...].reshape(g * bq, d), k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G*BQ, BK); q pre-scaled by scale*log2(e) outside (static path)
    s_scr[pl.ds(slot, 1)] = s[None]
    v_scr[pl.ds(slot, 1)] = v_ref[...]

    # invisible tiles (and the epilogue step's clamped re-fill) flush to 0;
    # PARTIAL tiles mask in place — both rare, predicated off the hot path
    dead = (code == BLOCK_SKIP) | (j >= n_kv_blocks)

    @pl.when(dead)
    def _():
        s_scr[pl.ds(slot, 1)] = jnp.full(
            (1,) + s_scr.shape[1:], NEG_INF, s_scr.dtype
        )

    @pl.when(jnp.logical_not(dead) & (code == BLOCK_PARTIAL))
    def _():
        mask = jnp.tile(_tile_mask(qm_ref, km_ref), (g, 1))
        s_scr[pl.ds(slot, 1)] = jnp.where(
            mask, s_scr[pl.ds(slot, 1)][0], NEG_INF
        )[None]

    # ---- flush stage (unconditional): tile j-1's exp2/sum/PV ----
    sp_ = s_scr[pl.ds(flush_slot, 1)][0]  # (G*BQ, BK) fp32
    p = jnp.exp2(jnp.minimum(sp_, _SAT))
    l_scr[:, :1] += jnp.sum(p, axis=1, keepdims=True)
    vv = v_scr[pl.ds(flush_slot, 1)][0]  # (BK, D)
    acc_scr[:] += jax.lax.dot_general(
        p.astype(vv.dtype), vv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_kv_blocks)
    def _():
        l = l_scr[:, :1]
        out = acc_scr[:] / jnp.maximum(l, 1e-30)
        o_ref[...] = out.reshape(g, bq, d).astype(o_ref.dtype)
        if with_lse:
            # shiftless: l is sum(exp(logits)) in natural units (m = 0)
            lse = jnp.where(
                l > 0.0, jnp.log(jnp.maximum(l, 1e-30)), NEG_INF
            )
            lse_ref[...] = jnp.broadcast_to(lse, (g * bq, 128)).reshape(
                g, bq, 128
            )


def _recompute_p(q, k, qm, km, lse, scale, masked=True, g=1):
    """(R,D),(BK,D), km (4,BK) -> masked softmax probs (R,BK), fp32.
    R may pack g heads (rows head-major); the token mask tiles across g."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if not masked:
        return jnp.exp(s - lse)
    mask = _mask_rule(
        qm[:, 0:1], qm[:, 1:2], qm[:, 2:3], qm[:, 3:4],
        km[0:1, :], km[1:2, :], km[2:3, :], km[3:4, :],
    )
    if g > 1:
        mask = jnp.tile(mask, (g, 1))
    p = jnp.exp(jnp.where(mask, s, NEG_INF) - lse)
    return jnp.where(mask, p, 0.0)


def _flash_bwd_dq_kernel(
    codes_ref, q_ref, k_ref, v_ref, qm_ref, km_ref, do_ref, lse_ref,
    delta_ref, dq_ref, dq_scr, *, scale: float, n_kv_blocks: int,
):
    """grid (kvh, n_q, n_kv): accumulate dq over kv blocks, all G q heads of
    the group packed per step.

    dS = P * (dO @ V^T - delta); dQ = dS @ K * scale."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    code = codes_ref[i, j]
    g, bq, d = q_ref.shape

    @pl.when(j == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    def tile(masked):
        q = q_ref[...].reshape(g * bq, d)
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[...].reshape(g * bq, d)
        lse = lse_ref[...].reshape(g * bq, 128)[:, :1]
        delta = delta_ref[...].reshape(g * bq, 128)[:, :1]
        p = _recompute_p(
            q, k, qm_ref[:], km_ref[:], lse, scale, masked, g=g
        )
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(code == BLOCK_FULL)
    def _():
        tile(False)

    @pl.when(code == BLOCK_PARTIAL)
    def _():
        tile(True)

    @pl.when(j == n_kv_blocks - 1)
    def _():
        dq_ref[...] = dq_scr[:].reshape(g, bq, d).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    codes_ref, q_ref, k_ref, v_ref, qm_ref, km_ref, do_ref, lse_ref,
    delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale: float, n_q_blocks: int,
):
    """grid (kvh, n_kv, n_q): dk/dv per KV head directly — contracting over
    the packed (G*BQ) rows sums the GQA group in-kernel, so no external
    per-q-head temporaries or reduction are needed.

    dV = P^T @ dO; dK = dS^T @ Q * scale."""
    i = pl.program_id(2)
    code = codes_ref[i, pl.program_id(1)]
    g, bq, d = q_ref.shape

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    def tile(masked):
        q = q_ref[...].reshape(g * bq, d)
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[...].reshape(g * bq, d)
        lse = lse_ref[...].reshape(g * bq, 128)[:, :1]
        delta = delta_ref[...].reshape(g * bq, 128)[:, :1]
        p = _recompute_p(
            q, k, qm_ref[:], km_ref[:], lse, scale, masked, g=g
        )  # (G*BQ, BK)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)  # (G*BQ, BK)
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(code == BLOCK_FULL)
    def _():
        tile(False)

    @pl.when(code == BLOCK_PARTIAL)
    def _():
        tile(True)

    @pl.when(i == n_q_blocks - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_kernel_int8(
    codes_ref,  # (n_q, n_kv) int32 SMEM (scalar prefetch)
    q_ref,  # (G, BQ, D) int8 — per-token symmetric quantization
    k_ref,  # (1, BK, D) int8 — per-token symmetric quantization
    v_ref,  # (1, BK, D) bf16
    ks_ref,  # (1, 1, BK) fp32 per-token k dequant scales
    qs_ref,  # (1, 1, G*BQ, 1) fp32 per-token q dequant scales
             # (pre-folded with softmax scale * log2(e))
    qm_ref, km_ref,
    o_ref,
    l_scr, acc_scr,
    *,
    n_kv_blocks: int,
):
    """int8 QK^T forward (SageAttention-style, inference only): the QK dot
    runs on the v5e MXU at 2x the bf16 rate (measured 23.6 -> 20.2 ms/layer
    at the 25k-token prefill, scripts/micro_segment_dissect.py). Scores
    dequantize with one row-broadcast and one column-broadcast multiply
    fused into the exp2 pass; shiftless static-max softmax as in
    _flash_kernel. PV stays bf16. Both q and k use per-token symmetric
    scales (finest granularity the dequant-after-GEMM trick allows); the
    quantizer optionally pre-rotates the head dim with a Hadamard matrix
    (exact: (qH)(kH)^T == qk^T) to spread outliers before rounding
    (parity gate: scripts/parity_tpu_bf16.py, scripts/ab_int8.py)."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    code = codes_ref[i, j]
    g, bq, d = q_ref.shape

    @pl.when(j == 0)
    def _():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def update(mask):
        s32 = jax.lax.dot_general(
            q_ref[...].reshape(g * bq, d),
            k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (G*BQ, BK)
        s = s32.astype(jnp.float32) * qs_ref[0, 0] * ks_ref[0]
        p = jnp.exp2(jnp.minimum(s, _SAT))
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        l_scr[:, :1] += jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] += jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(code == BLOCK_FULL)
    def _():
        update(None)

    @pl.when(code == BLOCK_PARTIAL)
    def _():
        update(jnp.tile(_tile_mask(qm_ref, km_ref), (g, 1)))

    @pl.when(j == n_kv_blocks - 1)
    def _():
        l = l_scr[:, :1]
        out = acc_scr[:] / jnp.maximum(l, 1e-30)
        o_ref[...] = out.reshape(g, bq, d).astype(o_ref.dtype)


def _hadamard(d: int) -> np.ndarray:
    """Normalized Sylvester-Hadamard matrix (d a power of two)."""
    h = np.array([[1.0]], np.float32)
    while h.shape[0] < d:
        h = np.block([[h, h], [h, -h]])
    return h * (d ** -0.5)


def _int8_use_hadamard() -> bool:
    import os

    return os.environ.get("G2VLM_ATTN_INT8_HAD", "1") == "1"


def _int8_use_kmean() -> bool:
    import os

    return os.environ.get("G2VLM_ATTN_INT8_KMEAN", "1") == "1"


def _flash_int8(qp, kp, vp, qm, km, scale, block_q, block_kv, interpret):
    """Quantize + launch the int8-QK forward. NOT differentiable by design
    (jnp.round on the int8 path has no VJP): training must use _flash.

    Quantization: per-token symmetric scales for BOTH q and k (the r3
    per-head q scale let one outlier token inflate the rounding step for a
    whole head). When the head dim is a power of two, q/k are first rotated
    by a normalized Hadamard matrix — exact in real arithmetic since
    (qH)(kH)^T = qk^T, and it spreads per-channel outliers across the head
    dim so the per-token max (and hence the rounding step) shrinks
    (QuaRot/SageAttention-style; G2VLM_ATTN_INT8_HAD=0 opts out)."""
    h, sq_p, d = qp.shape
    kvh, skv_p, _ = kp.shape
    g = h // kvh
    n_q = sq_p // block_q
    n_kv = skv_p // block_kv
    codes = _block_codes(qm, km, block_q, block_kv)

    qf = qp.astype(jnp.float32)
    kf = kp.astype(jnp.float32)
    if _int8_use_kmean():
        # SageAttention-style K smoothing: subtract the per-(kvh, channel)
        # mean of the REAL keys (padding rows carry doc=-1 meta) before
        # quantization. Exactly softmax-invariant: every score in q-row i
        # shifts by the same -q_i.mean across all kv columns, so the
        # normalized probabilities are unchanged. Accuracy win: keys share a
        # large common-mode component across tokens; removing it shrinks the
        # per-token |k| max and hence the int8 rounding step relative to the
        # informative (token-varying) signal.
        real = (km[0] >= 0).astype(jnp.float32)  # (Skv,)
        denom = jnp.maximum(jnp.sum(real), 1.0)
        kmean = jnp.sum(kf * real[None, :, None], axis=1, keepdims=True) / denom
        kf = kf - kmean
    if d & (d - 1) == 0 and _int8_use_hadamard():
        had = jnp.asarray(_hadamard(d))
        qf = qf @ had
        kf = kf @ had
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), axis=2), 1e-6) / 127.0  # (H,Sq)
    q8 = jnp.round(qf / qscale[..., None]).astype(jnp.int8)
    # kernel-facing layout: the (g, block_q) scale tile of grid step (hh, i)
    # as a ready-made (g*block_q, 1) column
    qs_col = (
        (qscale * (scale * _LOG2E))
        .reshape(kvh, g, n_q, block_q)
        .transpose(0, 2, 1, 3)
        .reshape(kvh, n_q, g * block_q, 1)
        .astype(jnp.float32)
    )
    kscale = jnp.maximum(jnp.max(jnp.abs(kf), axis=2), 1e-6) / 127.0
    k8 = jnp.round(kf / kscale[..., None]).astype(jnp.int8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kvh, n_q, n_kv),
        in_specs=[
            _q_spec(block_q, d, g),
            _kv_spec(block_kv, d),
            _kv_spec(block_kv, d),
            pl.BlockSpec(
                # (KVH, 1, Skv) with a middle singleton: Mosaic requires the
                # sublane block dim to divide 8 or equal the array dim
                (1, 1, block_kv), lambda hh, i, j, *_: (hh, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, g * block_q, 1), lambda hh, i, j, *_: (hh, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *_meta_specs(block_q, block_kv),
        ],
        out_specs=_q_spec(block_q, d, g),
        scratch_shapes=[
            pltpu.VMEM((g * block_q, 128), jnp.float32),
            pltpu.VMEM((g * block_q, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_flash_kernel_int8, n_kv_blocks=n_kv),
        out_shape=jax.ShapeDtypeStruct((h, sq_p, d), vp.dtype),
        grid_spec=grid_spec,
        compiler_params=_SEMANTICS,
        interpret=interpret,
    )(codes, q8, k8, vp, kscale[:, None].astype(jnp.float32), qs_col, qm, km)


def _pack_meta(info: TokenInfo) -> jax.Array:
    return jnp.stack(
        [info.doc_id, info.fn_id, info.noise_id, info.pos], axis=1
    ).astype(jnp.int32)


def _q_spec(block_q, d, g):
    # packs the g q heads of one GQA group per grid step (grid dim 0 = kvh)
    return pl.BlockSpec(
        (g, block_q, d), lambda hh, i, j, *_: (hh, i, 0),
        memory_space=pltpu.VMEM,
    )


def _kv_spec(block_kv, d):
    return pl.BlockSpec(
        (1, block_kv, d), lambda hh, i, j, *_: (hh, j, 0),
        memory_space=pltpu.VMEM,
    )


def _row_spec(block_q, g):
    # (H, S_q, 128) lane-broadcast per-row statistics (lse / delta)
    return pl.BlockSpec(
        (g, block_q, 128), lambda hh, i, j, *_: (hh, i, 0),
        memory_space=pltpu.VMEM,
    )


def _meta_specs(block_q, block_kv):
    return [
        pl.BlockSpec(
            (block_q, 4), lambda hh, i, j, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (4, block_kv), lambda hh, i, j, *_: (0, j), memory_space=pltpu.VMEM
        ),
    ]


_SEMANTICS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel", "arbitrary"),
    # GQA packing makes the scores tile (G*BQ, BK) fp32 (~19MB at 6x512x1536)
    # exceed the default 16MB scoped-vmem stack; v5e has 128MB VMEM total.
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _fwd_pallas(qp, kp, vp, qm, km, scale, block_q, block_kv, interpret,
                with_lse, static_max):
    h, sq_p, d = qp.shape
    kvh, skv_p, _ = kp.shape
    n_q = sq_p // block_q
    n_kv = skv_p // block_kv
    g = h // kvh
    codes = _block_codes(qm, km, block_q, block_kv)
    if static_max:
        # fold scale*log2(e) into q (fused into the pad pass by XLA): the
        # kernel then computes exp2 scores with zero per-element multiplies.
        # Residuals for the backward keep the ORIGINAL q (custom_vjp saves
        # the wrapper args, not this scaled copy).
        qp = (qp.astype(jnp.float32) * (scale * _LOG2E)).astype(qp.dtype)
    # measured on v5e at the 25k-token prefill: 55.8 ms vs 52.0 ms plain —
    # Mosaic serializes the predicated flush/fill regions instead of
    # overlapping the staged QK dot with the previous tile's exp2 pass, so
    # the extra VMEM round-trip only costs. Kept (tested, default off) for
    # hardware where the scheduler can interleave; see BENCH_NOTES.
    pipeline = static_max and os.environ.get("G2VLM_ATTN_PIPE", "0") == "1"
    if pipeline:
        kernel = functools.partial(
            _flash_kernel_pipe, n_kv_blocks=n_kv, with_lse=with_lse,
        )
        if with_lse:
            out_shape = [
                jax.ShapeDtypeStruct((h, sq_p, d), vp.dtype),
                jax.ShapeDtypeStruct((h, sq_p, 128), jnp.float32),
            ]
            out_specs = [_q_spec(block_q, d, g), _row_spec(block_q, g)]
        else:
            out_shape = jax.ShapeDtypeStruct((h, sq_p, d), vp.dtype)
            out_specs = _q_spec(block_q, d, g)
        kv_clamped = pl.BlockSpec(
            (1, block_kv, d),
            lambda hh, i, j, *_: (hh, jnp.minimum(j, n_kv - 1), 0),
            memory_space=pltpu.VMEM,
        )
        km_clamped = pl.BlockSpec(
            (4, block_kv),
            lambda hh, i, j, *_: (0, jnp.minimum(j, n_kv - 1)),
            memory_space=pltpu.VMEM,
        )
        qm_spec, _ = _meta_specs(block_q, block_kv)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kvh, n_q, n_kv + 1),
            in_specs=[
                _q_spec(block_q, d, g),
                kv_clamped,
                kv_clamped,
                qm_spec,
                km_clamped,
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((2, g * block_q, block_kv), jnp.float32),
                pltpu.VMEM((2, block_kv, d), vp.dtype),
                pltpu.VMEM((g * block_q, 128), jnp.float32),
                pltpu.VMEM((g * block_q, d), jnp.float32),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            compiler_params=_SEMANTICS,
            interpret=interpret,
        )(codes, qp, kp, vp, qm, km)
    if with_lse:
        kernel = functools.partial(
            _flash_kernel_lse, scale=scale, n_kv_blocks=n_kv,
            static_max=static_max,
        )
        out_shape = [
            jax.ShapeDtypeStruct((h, sq_p, d), vp.dtype),
            jax.ShapeDtypeStruct((h, sq_p, 128), jnp.float32),
        ]
        out_specs = [_q_spec(block_q, d, g), _row_spec(block_q, g)]
    else:
        kernel = functools.partial(
            _flash_kernel, scale=scale, n_kv_blocks=n_kv,
            static_max=static_max,
        )
        out_shape = jax.ShapeDtypeStruct((h, sq_p, d), vp.dtype)
        out_specs = _q_spec(block_q, d, g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kvh, n_q, n_kv),
        in_specs=[
            _q_spec(block_q, d, g),
            _kv_spec(block_kv, d),
            _kv_spec(block_kv, d),
            *_meta_specs(block_q, block_kv),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((g * block_q, 128), jnp.float32),
            pltpu.VMEM((g * block_q, 128), jnp.float32),
            pltpu.VMEM((g * block_q, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        compiler_params=_SEMANTICS,
        interpret=interpret,
    )(codes, qp, kp, vp, qm, km)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash(qp, kp, vp, qm, km, scale, block_q, block_kv, interpret,
           static_max):
    """Padded head-major flash attention: (H,Sq,D),(KVH,Skv,D) -> (H,Sq,D)."""
    return _fwd_pallas(
        qp, kp, vp, qm, km, scale, block_q, block_kv, interpret, False,
        static_max,
    )


def _flash_fwd(qp, kp, vp, qm, km, scale, block_q, block_kv, interpret,
               static_max):
    out, lse = _fwd_pallas(
        qp, kp, vp, qm, km, scale, block_q, block_kv, interpret, True,
        static_max,
    )
    return out, (qp, kp, vp, qm, km, out, lse)


def _flash_bwd(scale, block_q, block_kv, interpret, static_max, res, do):
    qp, kp, vp, qm, km, out, lse = res
    h, sq_p, d = qp.shape
    kvh, skv_p, _ = kp.shape
    g = h // kvh
    n_q = sq_p // block_q
    n_kv = skv_p // block_kv

    # delta_i = sum_d dO_i O_i, lane-broadcast like lse
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    delta = jnp.broadcast_to(delta, (h, sq_p, 128))

    codes = _block_codes(qm, km, block_q, block_kv)
    args = (codes, qp, kp, vp, qm, km, do, lse, delta)
    in_specs = [
        _q_spec(block_q, d, g),
        _kv_spec(block_kv, d),
        _kv_spec(block_kv, d),
        *_meta_specs(block_q, block_kv),
        _q_spec(block_q, d, g),  # do
        _row_spec(block_q, g),  # lse
        _row_spec(block_q, g),  # delta
    ]

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, n_kv_blocks=n_kv
        ),
        out_shape=jax.ShapeDtypeStruct((h, sq_p, d), qp.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kvh, n_q, n_kv),
            in_specs=in_specs,
            out_specs=_q_spec(block_q, d, g),
            scratch_shapes=[pltpu.VMEM((g * block_q, d), jnp.float32)],
        ),
        compiler_params=_SEMANTICS,
        interpret=interpret,
    )(*args)

    # dk/dv per KV head (grid iterates q blocks innermost); the packed
    # (G*BQ) contraction sums the GQA group in-kernel
    kv_out_spec = pl.BlockSpec(
        (1, block_kv, d), lambda hh, j, i, *_: (hh, j, 0),
        memory_space=pltpu.VMEM,
    )
    dkv_in_specs = [
        pl.BlockSpec(
            (g, block_q, d), lambda hh, j, i, *_: (hh, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, block_kv, d), lambda hh, j, i, *_: (hh, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, block_kv, d), lambda hh, j, i, *_: (hh, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (block_q, 4), lambda hh, j, i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (4, block_kv), lambda hh, j, i, *_: (0, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (g, block_q, d), lambda hh, j, i, *_: (hh, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (g, block_q, 128), lambda hh, j, i, *_: (hh, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (g, block_q, 128), lambda hh, j, i, *_: (hh, i, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, n_q_blocks=n_q
        ),
        out_shape=[
            jax.ShapeDtypeStruct((kvh, skv_p, d), kp.dtype),
            jax.ShapeDtypeStruct((kvh, skv_p, d), vp.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kvh, n_kv, n_q),
            in_specs=dkv_in_specs,
            out_specs=[kv_out_spec, kv_out_spec],
            scratch_shapes=[
                pltpu.VMEM((block_kv, d), jnp.float32),
                pltpu.VMEM((block_kv, d), jnp.float32),
            ],
        ),
        compiler_params=_SEMANTICS,
        interpret=interpret,
    )(*args)

    f0 = jax.dtypes.float0
    return (
        dq, dk, dv,
        np.zeros(qm.shape, dtype=f0), np.zeros(km.shape, dtype=f0),
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_segment_attention(
    q: jax.Array,  # (S_q, H, D)
    k: jax.Array,  # (S_kv, KVH, D)
    v: jax.Array,
    q_info: TokenInfo,
    kv_info: TokenInfo,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 1024,
    interpret: bool = False,
    static_max: Optional[bool] = None,
    int8_qk: bool = False,
) -> jax.Array:
    """Defaults (512, 1024) from v5e sweeps at the 32-view prefill shape
    (25088 tokens): 33.6 ms vs 147 ms blockwise-XLA (4.4x) with GQA packing
    + block visibility codes.

    static_max (default on, G2VLM_STATIC_MAX=0 opts out): SHIFTLESS exp2
    softmax — no per-row shift at all (softmax normalization cancels any
    constant, and fp32's exponent range covers the admissible logit domain;
    see _SAT). Drops the per-tile max reduce, the l/acc alpha rescales, the
    max->exp serialization, and the broadcast-subtract VPU pass. Exact for
    |logits| <= ~69 nats — qk-normed models sit at ~11; beyond that weights
    saturate at 2^100 instead of overflowing to NaN."""
    s_q, h, d = q.shape
    s_kv, kvh, _ = k.shape
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
    km = _pack_meta(kv_info).T  # (4, S_kv): fields in lanes (see kernel note)
    # pad query meta doc=-2 (never matches), kv meta doc=-1
    qm = pad_to(qm, sq_p, 0, value=-2)
    km = pad_to(km, skv_p, 1, value=-1)

    if static_max is None:
        import os

        static_max = os.environ.get("G2VLM_STATIC_MAX", "1") == "1"
    if int8_qk and static_max:
        # inference-only int8 QK^T (no VJP: jnp.round in the quantizer is
        # non-differentiable, so a grad trace fails loudly instead of
        # silently training through quantization noise)
        out = _flash_int8(
            qp, kp, vp, qm, km, scale, block_q, block_kv, interpret
        )
    else:
        out = _flash(
            qp, kp, vp, qm, km, scale, block_q, block_kv, interpret,
            static_max,
        )
    return jnp.swapaxes(out, 0, 1)[:s_q]


# ---------------------------------------------------------------------------
# Batched bidirectional flash attention (vision encoders / Pi3 heads).
#
# The segment kernel above iterates a global (n_q, n_kv) tile grid; for
# per-view attention (dinov2/dinov3/qwen-vit frames, Pi3 head blocks) ~97%
# of tiles are cross-view SKIPs whose K/V blocks the pipeliner still DMAs —
# fetch-bound. Here the grid is (B, H, n_q, n_kv) WITHIN each view, so no
# dead tiles exist. Keys padded past `s_real` are masked with an iota
# compare (queries in padding produce garbage rows that the caller slices
# off). Reference behavior: per-view flash_attn_varlen windows
# (dinov2_model.py:49, modeling_qwen2_vl.py:400) / SDPA (pi3 attention.py).
# ---------------------------------------------------------------------------


def _rows_update(s, v, m_scr, l_scr, acc_scr, r0, bq):
    """Online-softmax update on scratch rows [r0, r0+bq)."""
    sl = slice(r0, r0 + bq)
    m_prev = m_scr[sl, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[sl, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[sl, :] = acc_scr[sl, :] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[sl, :] = jnp.broadcast_to(m_new, (bq, m_scr.shape[1]))
    l_scr[sl, :] = jnp.broadcast_to(l_new, (bq, l_scr.shape[1]))


def _batched_flash_kernel(
    q_ref,  # (1, HB, BQ, D) — HB heads per grid step: at one-block-per-view
            # sizes the grid is per-step-overhead-bound, so heads amortize it
    k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, scale: float, n_kv_blocks: int, s_real: int, block_kv: int,
    static_max: bool,
):
    j = pl.program_id(3)
    _, hb, bq, d = q_ref.shape

    if s_real % block_kv:
        # only the final kv block contains padding keys
        col = j * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_kv), 1
        )
        key_ok = col < s_real
    else:
        key_ok = None

    if static_max:
        # whole view in one kv block (n_kv_blocks == 1, enforced by the
        # wrapper): SHIFTLESS exp2 softmax (q' carries scale*log2e) — no
        # running max / alpha rescale, and no per-tile q/k norm passes;
        # see _SAT for the range argument
        for hh in range(hb):
            q = q_ref[0, hh]
            k = k_ref[0, hh]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if key_ok is not None:
                s = jnp.where(key_ok, s, NEG_INF)
            p = jnp.exp2(jnp.minimum(s, _SAT))
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, hh],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, hh] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    for hh in range(hb):  # static unroll
        s = jax.lax.dot_general(
            q_ref[0, hh],
            k_ref[0, hh],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK)
        if key_ok is not None:
            s = jnp.where(key_ok, s, NEG_INF)
        _rows_update(s, v_ref[0, hh], m_scr, l_scr, acc_scr, hh * bq, bq)

    @pl.when(j == n_kv_blocks - 1)
    def _():
        for hh in range(hb):
            sl = slice(hh * bq, (hh + 1) * bq)
            l = l_scr[sl, :1]
            out = acc_scr[sl, :] / jnp.maximum(l, 1e-30)
            o_ref[0, hh] = out.astype(o_ref.dtype)


def _batched_flash_kernel_lse(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale: float, n_kv_blocks: int, s_real: int, block_kv: int,
):
    _batched_flash_kernel(
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
        scale=scale, n_kv_blocks=n_kv_blocks, s_real=s_real,
        block_kv=block_kv, static_max=False,
    )
    j = pl.program_id(3)
    _, hb, bq, _ = q_ref.shape

    @pl.when(j == n_kv_blocks - 1)
    def _():
        for hh in range(hb):
            sl = slice(hh * bq, (hh + 1) * bq)
            m = m_scr[sl, :1]
            l = l_scr[sl, :1]
            lse = jnp.where(
                l > 0.0, m + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF
            )
            lse_ref[0, hh] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _batched_p(q, k, lse, scale, j, s_real, block_kv):
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if s_real % block_kv:
        col = j * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_kv), 1
        )
        s = jnp.where(col < s_real, s, NEG_INF)
    return jnp.exp(s - lse)


def _batched_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, scale: float, n_kv_blocks: int, s_real: int, block_kv: int,
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    p = _batched_p(
        q_ref[0, 0], k_ref[0, 0], lse_ref[0, 0][:, :1], scale, j, s_real,
        block_kv,
    )
    dp = jax.lax.dot_general(
        do_ref[0, 0], v_ref[0, 0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, :1])
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(j == n_kv_blocks - 1)
    def _():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _batched_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale: float, n_q_blocks: int, s_real: int, block_kv: int,
):
    i = pl.program_id(3)
    j = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    p = _batched_p(
        q, k_ref[0, 0], lse_ref[0, 0][:, :1], scale, j, s_real, block_kv
    )
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[0, 0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, :1])
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(i == n_q_blocks - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _batched_specs(block_q, block_kv, d):
    spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_kv, d), lambda bb, hh, i, j: (bb, hh, j, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, 1, block_q, 128), lambda bb, hh, i, j: (bb, hh, i, 0),
        memory_space=pltpu.VMEM,
    )
    return spec, kv_spec, row_spec


_BATCHED_SEMANTICS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    # hb>4 head packing exceeds the 16MB default scoped-vmem stack
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _batched_fwd(qp, kp, vp, scale, block_q, block_kv, s_real, interpret,
                 with_lse, hb=None):
    b, h, s_pad, d = qp.shape
    n_q = s_pad // block_q
    n_kv = kp.shape[2] // block_kv
    if hb is None:
        hb = next(x for x in (4, 2, 1) if h % x == 0)  # heads per grid step

    def hspec(bq, last):
        return pl.BlockSpec(
            (1, hb, bq, last), lambda bb, hh, i, j: (bb, hh, i, 0),
            memory_space=pltpu.VMEM,
        )

    kv_spec = pl.BlockSpec(
        (1, hb, block_kv, d), lambda bb, hh, i, j: (bb, hh, j, 0),
        memory_space=pltpu.VMEM,
    )
    kw = dict(
        scale=scale, n_kv_blocks=n_kv, s_real=s_real, block_kv=block_kv
    )
    if with_lse:
        kernel = functools.partial(_batched_flash_kernel_lse, **kw)
        out_shape = [
            jax.ShapeDtypeStruct((b, h, s_pad, d), vp.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, 128), jnp.float32),
        ]
        out_specs = [hspec(block_q, d), hspec(block_q, 128)]
    else:
        # no-grad forward with one kv block per view: static-bound exp2
        # softmax (the training fwd keeps the online form for its lse)
        static = n_kv == 1
        if static:
            qp = (qp.astype(jnp.float32) * (scale * _LOG2E)).astype(qp.dtype)
        kernel = functools.partial(
            _batched_flash_kernel, static_max=static, **kw
        )
        out_shape = jax.ShapeDtypeStruct((b, h, s_pad, d), vp.dtype)
        out_specs = hspec(block_q, d)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b, h // hb, n_q, n_kv),
        in_specs=[hspec(block_q, d), kv_spec, kv_spec],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((hb * block_q, 128), jnp.float32),
            pltpu.VMEM((hb * block_q, 128), jnp.float32),
            pltpu.VMEM((hb * block_q, d), jnp.float32),
        ],
        compiler_params=_BATCHED_SEMANTICS,
        interpret=interpret,
    )(qp, kp, vp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _batched(qp, kp, vp, scale, block_q, block_kv, s_real, interpret):
    return _batched_fwd(
        qp, kp, vp, scale, block_q, block_kv, s_real, interpret, False
    )


def _batched_vjp_fwd(qp, kp, vp, scale, block_q, block_kv, s_real, interpret):
    out, lse = _batched_fwd(
        qp, kp, vp, scale, block_q, block_kv, s_real, interpret, True
    )
    return out, (qp, kp, vp, out, lse)


def _batched_vjp_bwd(scale, block_q, block_kv, s_real, interpret, res, do):
    qp, kp, vp, out, lse = res
    b, h, s_pad, d = qp.shape
    m_pad = kp.shape[2]
    n_q = s_pad // block_q
    n_kv = m_pad // block_kv
    spec, kv_spec, row_spec = _batched_specs(block_q, block_kv, d)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    delta = jnp.broadcast_to(delta, (b, h, s_pad, 128))
    args = (qp, kp, vp, do, lse, delta)
    in_specs = [spec, kv_spec, kv_spec, spec, row_spec, row_spec]
    kw = dict(scale=scale, s_real=s_real, block_kv=block_kv)

    dq = pl.pallas_call(
        functools.partial(_batched_bwd_dq_kernel, n_kv_blocks=n_kv, **kw),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), qp.dtype),
        grid=(b, h, n_q, n_kv),
        in_specs=in_specs,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=_BATCHED_SEMANTICS,
        interpret=interpret,
    )(*args)

    dkv_in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d), lambda bb, hh, j, i: (bb, hh, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_kv, d), lambda bb, hh, j, i: (bb, hh, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_kv, d), lambda bb, hh, j, i: (bb, hh, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_q, d), lambda bb, hh, j, i: (bb, hh, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_q, 128), lambda bb, hh, j, i: (bb, hh, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_q, 128), lambda bb, hh, j, i: (bb, hh, i, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    kv_out = pl.BlockSpec(
        (1, 1, block_kv, d), lambda bb, hh, j, i: (bb, hh, j, 0),
        memory_space=pltpu.VMEM,
    )
    dk, dv = pl.pallas_call(
        functools.partial(_batched_bwd_dkv_kernel, n_q_blocks=n_q, **kw),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, m_pad, d), kp.dtype),
            jax.ShapeDtypeStruct((b, h, m_pad, d), vp.dtype),
        ],
        grid=(b, h, n_kv, n_q),
        in_specs=dkv_in_specs,
        out_specs=[kv_out, kv_out],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=_BATCHED_SEMANTICS,
        interpret=interpret,
    )(*args)
    return dq, dk, dv


_batched.defvjp(_batched_vjp_fwd, _batched_vjp_bwd)


def flash_batched_attention(
    q: jax.Array,  # (B, S, H, D)
    k: jax.Array,  # (B, M, H, D) — M may differ (cross attention)
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
    interpret: bool = False,
    valid_kv: Optional[int] = None,  # mask keys >= valid_kv (< M): callers
    # that pre-pad their sequences to tile multiples (pi3 heads run whole
    # decoders at 8-multiple rows to kill relayout copies) still get exact
    # masking of the pad keys
) -> jax.Array:
    """Full bidirectional (cross-)attention within each batch element, with
    a custom-VJP Pallas backward (encoders train through it). Keys past M
    are iota-masked; padded query rows are sliced off (their cotangents are
    zero under autodiff, so the backward stays exact).

    Default blocks cover a whole 518px view (782 tokens -> one 784 tile):
    encoder sequences are short, so the win is a small grid (B*H steps),
    not online-softmax streaming — tiny blocks leave the kernel bound on
    per-step grid overhead."""
    b, s_real, h, d = q.shape
    m_real = k.shape[1] if valid_kv is None else valid_kv
    if scale is None:
        scale = d ** -0.5
    # blocks: cap at the (8-rounded) sequence lengths
    block_q = min(block_q, -(-s_real // 8) * 8)
    block_kv = min(block_kv, -(-k.shape[1] // 8) * 8)

    def prep(x, block):
        real = x.shape[1]
        pad = -(-real // block) * block - real
        x = jnp.swapaxes(x, 1, 2)  # (B, H, S, D)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    out = _batched(
        prep(q, block_q), prep(k, block_kv), prep(v, block_kv),
        scale, block_q, block_kv, m_real, interpret,
    )
    return jnp.swapaxes(out, 1, 2)[:, :s_real]
