"""Segment-masked attention over packed sequences.

This is the single attention entry point serving every regime the reference
implements with four different backends (flex-attention, SDPA nested masks,
flash-attn varlen causal, flash-attn varlen non-causal over merged KV —
see reference qwen2vl.py:290-416, 445-664). The mask rule lives in per-token
metadata (ops/masks.py); the same function is used at train and inference time.

Backends:
  * dense    — materializes logits; for short sequences & tests.
  * chunked  — online-softmax blockwise XLA attention (flash-style, fp32
               accumulators); memory-safe for 30k-token geo prefills and
               differentiable everywhere (CPU/TPU).
  * pallas   — hand-tiled TPU flash kernel (ops/flash_attention.py), used
               automatically on TPU for large sequences.

Layout: packed (no batch dim) — q: (S_q, H, D); k, v: (S_kv, KVH, D) with GQA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .masks import TokenInfo, make_segment_mask

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def dense_attention(
    q: jax.Array,  # (..., S_q, H, D)
    k: jax.Array,  # (..., S_kv, H, D)
    v: jax.Array,
    mask: Optional[jax.Array] = None,  # broadcastable to (..., H, S_q, S_kv)
    scale: Optional[float] = None,
) -> jax.Array:
    """Plain batched MHA with optional boolean mask; fp32 softmax."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "...hqk,...khd->...qhd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def _expand_gqa(q: jax.Array, kvh: int):
    sq, h, d = q.shape
    g = h // kvh
    return q.reshape(sq, kvh, g, d)


def _segment_attention_dense(q, k, v, q_info, kv_info, scale):
    kvh = k.shape[1]
    mask = make_segment_mask(q_info, kv_info)  # (S_q, S_kv)
    qg = _expand_gqa(q, kvh)  # (Sq, KVH, G, D)
    logits = jnp.einsum(
        "qngd,knd->qngk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(mask[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    # Zero rows with no visible kv (padding queries).
    any_visible = jnp.any(mask, axis=-1)[:, None, None, None]
    probs = jnp.where(any_visible, probs, 0.0)
    out = jnp.einsum(
        "qngk,knd->qngd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(q.shape).astype(v.dtype)


def _segment_attention_chunked(q, k, v, q_info, kv_info, scale, kv_chunk):
    """Online-softmax blockwise attention (flash-style in pure XLA).

    Head-major (H, S, D) layout keeps every matmul MXU-shaped: logits are
    (H, S_q, T) with T=kv_chunk lanes; KV heads are expanded per chunk only
    (cheap broadcast, never materialized at full length)."""
    s_q, h, d = q.shape
    s_kv, kvh, _ = k.shape
    g = h // kvh
    n_chunks = -(-s_kv // kv_chunk)
    pad = n_chunks * kv_chunk - s_kv
    if pad:
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        kv_info = TokenInfo(
            jnp.pad(kv_info.doc_id, (0, pad), constant_values=-1),
            jnp.pad(kv_info.fn_id, (0, pad), constant_values=-1),
            jnp.pad(kv_info.noise_id, (0, pad), constant_values=-1),
            jnp.pad(kv_info.pos, (0, pad)),
        )
    qh = jnp.swapaxes(q, 0, 1)  # (H, S_q, D)

    kc = k.reshape(n_chunks, kv_chunk, kvh, d)
    vc = v.reshape(n_chunks, kv_chunk, kvh, d)
    infoc = jax.tree.map(lambda f: f.reshape(n_chunks, kv_chunk), kv_info)

    # Materialized-logits dtype: bf16 score tiles would halve the dominant
    # HBM traffic of the XLA flash formulation (softmax statistics stay
    # fp32), but the tunneled axon compiler stalls on that pattern — opt in
    # with G2VLM_BF16_LOGITS=1 on real TPU hosts.
    import os

    use_bf16 = os.environ.get("G2VLM_BF16_LOGITS", "0") == "1"
    logits_dtype = (
        jnp.bfloat16 if (use_bf16 and q.dtype != jnp.float32) else jnp.float32
    )

    def body(carry, xs):
        m, l, acc = carry  # (H, S_q), (H, S_q), (H, S_q, D)
        kb, vb, ib = xs
        # expand GQA heads for this chunk only: (T, KVH, D) -> (H, T, D)
        kb = jnp.repeat(jnp.swapaxes(kb, 0, 1), g, axis=0)
        vb = jnp.repeat(jnp.swapaxes(vb, 0, 1), g, axis=0)
        logits = jnp.einsum(
            "hqd,htd->hqt", qh, kb, preferred_element_type=logits_dtype
        )
        logits = logits.astype(jnp.float32) * scale
        mask = make_segment_mask(q_info, TokenInfo(*ib))  # (S_q, T)
        logits = jnp.where(mask[None], logits, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        p = jnp.where(mask[None], p, 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "hqt,htd->hqd", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((h, s_q), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, s_q), jnp.float32)
    acc0 = jnp.zeros((h, s_q, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), (kc, vc, tuple(infoc)))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return jnp.swapaxes(out, 0, 1).astype(v.dtype)


# dryrun/test hook: run the Pallas kernel via pallas_call(interpret=True)
# so the kernel logic executes under virtual CPU meshes (Mosaic is TPU-only)
FORCE_PALLAS_INTERPRET = False


def _pin_replicated_under_mesh(x: jax.Array) -> jax.Array:
    """with_sharding_constraint(x, P()) when an ambient mesh is active,
    identity otherwise. Used only on the interpret-Pallas debug path."""
    try:
        from jax.sharding import PartitionSpec
        from jax._src.mesh import thread_resources

        if not thread_resources.env.physical_mesh.empty:
            return jax.lax.with_sharding_constraint(x, PartitionSpec())
    except (ImportError, AttributeError):
        pass
    return x


def segment_attention(
    q: jax.Array,  # (S_q, num_heads, head_dim)
    k: jax.Array,  # (S_kv, num_kv_heads, head_dim)
    v: jax.Array,
    q_info: TokenInfo,
    kv_info: TokenInfo,
    scale: Optional[float] = None,
    impl: str = "auto",
    kv_chunk: int = 2048,
) -> jax.Array:
    """Packed segment-masked GQA attention. Returns (S_q, num_heads, head_dim)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "pallas_int8" and (
        jax.default_backend() != "tpu"
        or q.shape[0] * k.shape[0] < 4096 * 4096
    ):
        # int8 QK pays off on large prefill tiles; small phases (text spans,
        # decode-adjacent calls) and non-TPU backends take the normal rules
        impl = "auto"
    if impl == "auto":
        import os

        on_tpu = jax.default_backend() == "tpu"
        # The Pallas kernel is ~1.9x the blockwise-XLA path at 25k-token
        # prefill shape (fixed after the KV-metadata relayout spill — see
        # flash_attention.py). G2VLM_ATTN=chunked opts out.
        pallas_ok = os.environ.get("G2VLM_ATTN", "pallas") == "pallas"
        if on_tpu and pallas_ok and q.shape[0] * k.shape[0] >= 4096 * 4096:
            impl = "pallas"
        elif q.shape[0] * k.shape[0] <= 2048 * 2048:
            impl = "dense"
        else:
            impl = "chunked"
    if impl in ("pallas", "pallas_int8"):
        try:
            from .flash_attention import flash_segment_attention

            if FORCE_PALLAS_INTERPRET:
                # interpret=True lowers the kernel body to plain HLO, whose
                # internals the SPMD partitioner then tries to shard — it
                # invents head-dim splits that bleed into enclosing loop
                # params as "involuntary full rematerialization" warnings
                # (MULTICHIP_r04 tail). Pin the emulated island replicated;
                # the real Mosaic custom call is opaque and needs no pin.
                q, k, v = (_pin_replicated_under_mesh(x) for x in (q, k, v))
            out = flash_segment_attention(
                q, k, v, q_info, kv_info, scale=scale,
                interpret=FORCE_PALLAS_INTERPRET,
                # int8 QK^T (inference only — non-differentiable by design;
                # the auto rule never selects it, callers opt in)
                int8_qk=(impl == "pallas_int8"),
            )
            if FORCE_PALLAS_INTERPRET:
                out = _pin_replicated_under_mesh(out)
            return out
        except ImportError:
            impl = "chunked"
    if impl == "dense":
        return _segment_attention_dense(q, k, v, q_info, kv_info, scale)
    if impl == "chunked":
        return _segment_attention_chunked(q, k, v, q_info, kv_info, scale, kv_chunk)
    raise ValueError(f"unknown attention impl: {impl}")
