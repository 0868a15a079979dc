"""Mixture-of-Transformers Qwen2-VL decoder, TPU-native.

Behavioral spec: reference modeling/g2vlm/qwen2vl.py (PackedAttentionMoT
:419-664, Qwen2VLMoTDecoderLayer :751-910, Qwen2VLModel :1022-1337,
Qwen2VLForCausalLM :1340-1595), with dense / MoE-FFN layer variants.

Design (not a port):
  * ONE forward. The reference forks forward_train (compiled flex-attention
    over a block mask) vs forward_inference (flash-attn varlen + scatter-
    rebuilt KV cache) per class. Here a single function runs packed tokens +
    per-token TokenInfo metadata through segment-masked attention; prefill,
    packed training, and 1-token decode differ only in their inputs.
  * Expert routing without gather/scatter. The reference fancy-indexes tokens
    into per-expert Linears (qwen2vl.py:454-472) — dynamic shapes that XLA
    can't tile. We compute both experts' projections and select with
    jnp.where on an is_geo mask (static shapes, fully fused); an `expert_mode`
    switch short-circuits to a single expert when a call is single-modality
    (e.g. text decode touches only "und" weights).
  * KV cache is caller-owned and preallocated; this module just returns the
    new K/V for the processed tokens.

Dtype policy: matmuls in compute_dtype (bf16 on TPU), RMSNorms + RoPE + the
qk-norms in fp32 — mirroring the reference's autocast behavior
(qwen2vl.py:600-619).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LLMConfig
from ..ops.attention import segment_attention
from ..ops.masks import TokenInfo
from ..ops.norms import rms_norm
from ..ops.rope import mrope_cos_sin

# expert_mode values
UND_ONLY = "und"      # all tokens use the base ("und") expert
GEO_ONLY = "geo"      # all tokens use the geometry expert
MIXED = "mixed"       # route per-token by is_geo (dual compute + select)
GEO_MAIN = "geo_main" # geo expert everywhere + und fixup at und_fixup_idx
                      # rows — 1x FLOPs for geo-dominant prefills (recon:
                      # ~25k dino tokens vs ~10^2 text tokens)
SPLIT = "split"       # physical layout [und | geo] with a static boundary
                      # (packer sorted_layout): contiguous single-expert
                      # slices — 1x FLOPs for mixed training batches. Pass
                      # the boundary via decoder_forward(geo_start=...).


class LayerKV(NamedTuple):
    k: jax.Array  # (S, KVH, HD)
    v: jax.Array


def _lin(x, p, dtype):
    y = x.astype(dtype) @ p["w"].astype(dtype)
    if "b" in p:
        y = y + p["b"].astype(dtype)
    return y


def _attention(q, k, v, q_info, kv_info, attn_impl, sp):
    """Attention dispatch: ordinary segment attention, or sequence-parallel
    over a mesh axis when `sp=(mesh, axis_name)` is set (shard_map sharding
    the packed token axis; KV all-gathered per layer — parallel/sequence.py).
    The reference has no sequence parallelism (SURVEY §2.3); this is TPU
    headroom for >32-view contexts."""
    if sp is not None:
        from ..parallel.sequence import sequence_parallel_attention

        mesh, axis = sp
        n = mesh.shape[axis]
        if q.shape[0] % n == 0 and k.shape[0] % n == 0:
            return sequence_parallel_attention(
                q, k, v, q_info, kv_info, mesh, axis, impl=attn_impl
            )
    return segment_attention(q, k, v, q_info, kv_info, impl=attn_impl)


def _select(is_geo, geo, und):
    return jnp.where(is_geo[:, None], geo, und)


def _mrope_fold(nh: int, hd: int):
    """rotate_half as a signed permutation: rot(y)[i] = sgn[i] * y[idx_h[i]]
    per head. The direct rotate (lane slices + concat) plus the fp32 qk-norm
    cost ~12.8 ms per MoT layer at the 32-view prefill as separate XLA
    passes; as a permutation it rides the MXU (see _rot_half)."""
    half = hd // 2
    idx_h = np.concatenate([np.arange(half, hd), np.arange(half)])
    sgn_h = np.concatenate(
        [-np.ones(half, np.float32), np.ones(half, np.float32)]
    )
    col = np.concatenate([h * hd + idx_h for h in range(nh)])
    sgn = np.tile(sgn_h, nh)
    return col, sgn, idx_h


def _rot_half_mat(hd: int) -> np.ndarray:
    """(hd, hd) signed-permutation matrix P with y @ P == rotate_half(y)."""
    half = hd // 2
    p = np.zeros((hd, hd), np.float32)
    p[np.arange(half, hd), np.arange(half)] = -1.0
    p[np.arange(half), np.arange(half, hd)] = 1.0
    return p


def _rot_half(y, nh: int, hd: int):
    """rotate_half over flat projection output y (S, nh*hd) via a tiny
    per-head (hd, hd) permutation matmul. Replaces the r3 'folded projection
    columns' (an extra (d, nh*hd) block widening the q/k GEMMs): the
    permutation costs ~nh*hd^2 MACs/token instead of d*nh*hd — ~12x fewer
    FLOPs at the MoT shapes — and is bitwise identical (P entries are
    exactly +-1; bf16 rounding is sign-symmetric). Still shuffle-free: the
    rotation rides the MXU, not the VPU lane network."""
    s = y.shape[0]
    p = jnp.asarray(_rot_half_mat(hd), y.dtype)
    r = jnp.einsum("snd,de->sne", y.reshape(s, nh, hd), p)
    return r.reshape(s, nh * hd)


def _norm_rope(q, q_rot, gamma, cos, sin, eps, nh, hd, dt):
    """Fused (optional per-head fp32 RMS qk-norm) + mRoPE over raw
    projection outputs q and rot(q) (from the folded columns).

    rotate_half commutes with RMS normalization up to a gamma permutation
    (permutation preserves the row rms; the sign rides the weights), so
    rope(norm(q)) == norm(q)*cos + norm_permγ(q_rot)*sin with ONE shared
    rsqrt — a single fused elementwise chain instead of rotate concats.
    gamma: (hd,) fp32, or a per-row-selected (S, 1, hd); None = no norm.
    q, q_rot: (S, nh*hd). Returns (S, nh, hd) in dt."""
    s = q.shape[0]
    qf = q.reshape(s, nh, hd).astype(jnp.float32)
    qrf = q_rot.reshape(s, nh, hd).astype(jnp.float32)
    c = cos[:, None, :]
    sn = sin[:, None, :]
    if gamma is None:
        out = qf * c + qrf * sn
    else:
        _, _, idx_h = _mrope_fold(nh, hd)
        r = jax.lax.rsqrt(jnp.mean(qf * qf, axis=-1, keepdims=True) + eps)
        g = gamma if gamma.ndim > 1 else gamma[None, None, :]
        gp = g[..., idx_h]
        out = (qf * g * r) * c + (qrf * gp * r) * sn
    return out.astype(dt)


def _expert_lin(x_und, x_geo, p_und, p_geo, is_geo, mode, dtype):
    if mode == UND_ONLY:
        return _lin(x_und, p_und, dtype)
    if mode == GEO_ONLY:
        return _lin(x_geo, p_geo, dtype)
    return _select(is_geo, _lin(x_geo, p_geo, dtype), _lin(x_und, p_und, dtype))


def _mlp(x, p, dtype):
    """SwiGLU MLP (reference Qwen2MLP, modeling_qwen2_vl.py:508-521).
    (gate|up GEMM fusion measured neutral on v5e — XLA already schedules
    the separate GEMMs well; kept separate for simplicity.)"""
    g = _lin(x, p["gate"], dtype)
    u = _lin(x, p["up"], dtype)
    return _lin(jax.nn.silu(g) * u, p["down"], dtype)


def _geo_main_layer(
    lp, x, und_idx, cos, sin, q_info, kv_info, past_kv, cfg, dt, attn_impl,
    sp=None,
):
    """MoT layer computing the geo expert for ALL rows and re-doing the few
    und rows (gather -> und expert -> scatter). Exactly equivalent to MIXED
    when und_idx covers all non-geo rows; und_idx may be padded with 0s as
    long as row 0 is an und token (duplicate scatters write equal values)."""
    nh, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    s = x.shape[0]
    eps = cfg.rms_norm_eps

    residual = x
    h_geo = rms_norm(x, lp["ln_attn_geo"], eps)
    qx = _lin(h_geo, lp["q_geo"], dt)
    kx = _lin(h_geo, lp["k_geo"], dt)
    v = _lin(h_geo, lp["v_geo"], dt)
    x_u = x[und_idx]
    h_u = rms_norm(x_u, lp["ln_attn"], eps)
    qux = _lin(h_u, lp["q"], dt)
    kux = _lin(h_u, lp["k"], dt)
    vu = _lin(h_u, lp["v"], dt)

    # scatter the und rows first, rotate once on the merged tensors
    qx = qx.at[und_idx].set(qux)
    kx = kx.at[und_idx].set(kux)
    v = v.at[und_idx].set(vu).reshape(s, kvh, hd).astype(dt)
    qr = _rot_half(qx, nh, hd)
    kr = _rot_half(kx, kvh, hd)

    gq = lp["q_norm_geo"] if cfg.qk_norm else None
    gk = lp["k_norm_geo"] if cfg.qk_norm else None
    q = _norm_rope(qx, qr, gq, cos, sin, eps, nh, hd, dt)
    k = _norm_rope(kx, kr, gk, cos, sin, eps, kvh, hd, dt)
    if cfg.qk_norm:
        # re-do the few und rows with the und-expert gammas
        cu, su = cos[und_idx], sin[und_idx]
        q = q.at[und_idx].set(
            _norm_rope(qux, qr[und_idx], lp["q_norm"], cu, su, eps,
                       nh, hd, dt)
        )
        k = k.at[und_idx].set(
            _norm_rope(kux, kr[und_idx], lp["k_norm"], cu, su, eps,
                       kvh, hd, dt)
        )
    new_kv = LayerKV(k, v)

    if past_kv is not None:
        k_all = jnp.concatenate([past_kv.k.astype(dt), k], axis=0)
        v_all = jnp.concatenate([past_kv.v.astype(dt), v], axis=0)
    else:
        k_all, v_all = k, v
    if kv_info is None:
        kv_info = q_info

    attn = _attention(q, k_all, v_all, q_info, kv_info, attn_impl, sp)
    attn = attn.reshape(s, nh * hd)
    out = _lin(attn, lp["o_geo"], dt) * lp["ls1"].astype(dt)
    out = out.at[und_idx].set(_lin(attn[und_idx], lp["o"], dt))
    x = residual + out

    residual = x
    m = _mlp(rms_norm(x, lp["ln_mlp_geo"], eps), lp["mlp_geo"], dt)
    m = m * lp["ls2"].astype(dt)
    x_u = x[und_idx]
    mu = _mlp(rms_norm(x_u, lp["ln_mlp"], eps), lp["mlp"], dt)
    m = m.at[und_idx].set(mu)
    return residual + m, new_kv


def _split_layer(
    lp, x, geo_start, cos, sin, q_info, kv_info, past_kv, cfg, dt, attn_impl,
    sp=None,
):
    """MoT layer over a [und | geo] sorted physical layout with a static
    boundary: every expert matmul runs on a contiguous slice — 1x FLOPs for
    mixed training batches (the MIXED mode dual-computes both experts).
    Attention order-independence comes from the TokenInfo metadata (pos
    carries the logical order)."""
    nh, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    s = x.shape[0]
    eps = cfg.rms_norm_eps
    b = geo_start

    def both(f_u, f_g):
        return jnp.concatenate([f_u, f_g], axis=0)

    residual = x
    x_u, x_g = x[:b], x[b:]
    h_u = rms_norm(x_u, lp["ln_attn"], eps)
    h_g = rms_norm(x_g, lp["ln_attn_geo"], eps)
    qx = both(_lin(h_u, lp["q"], dt), _lin(h_g, lp["q_geo"], dt))
    kx = both(_lin(h_u, lp["k"], dt), _lin(h_g, lp["k_geo"], dt))
    v = both(_lin(h_u, lp["v"], dt), _lin(h_g, lp["v_geo"], dt))
    v = v.reshape(s, kvh, hd).astype(dt)

    def nr(xq, g_u, g_g, nheads):
        xr = _rot_half(xq, nheads, hd)
        if not cfg.qk_norm:
            return _norm_rope(xq, xr, None, cos, sin, eps, nheads, hd, dt)
        return jnp.concatenate(
            [
                _norm_rope(xq[:b], xr[:b], g_u, cos[:b], sin[:b],
                           eps, nheads, hd, dt),
                _norm_rope(xq[b:], xr[b:], g_g, cos[b:], sin[b:],
                           eps, nheads, hd, dt),
            ],
            axis=0,
        )

    q = nr(qx, lp["q_norm"], lp["q_norm_geo"], nh)
    k = nr(kx, lp["k_norm"], lp["k_norm_geo"], kvh)
    new_kv = LayerKV(k, v)

    if past_kv is not None:
        k_all = jnp.concatenate([past_kv.k.astype(dt), k], axis=0)
        v_all = jnp.concatenate([past_kv.v.astype(dt), v], axis=0)
    else:
        k_all, v_all = k, v
    if kv_info is None:
        kv_info = q_info

    attn = _attention(q, k_all, v_all, q_info, kv_info, attn_impl, sp)
    attn = attn.reshape(s, nh * hd)
    out = both(
        _lin(attn[:b], lp["o"], dt),
        _lin(attn[b:], lp["o_geo"], dt) * lp["ls1"].astype(dt),
    )
    x = residual + out

    residual = x
    m_u = _mlp(rms_norm(x[:b], lp["ln_mlp"], eps), lp["mlp"], dt)
    m_g = _mlp(rms_norm(x[b:], lp["ln_mlp_geo"], eps), lp["mlp_geo"], dt)
    m = both(m_u, m_g * lp["ls2"].astype(dt))
    return residual + m, new_kv


def mot_layer_forward(
    lp: Dict,
    x: jax.Array,  # (S, D)
    is_geo: jax.Array,  # (S,) bool
    cos: jax.Array,  # (S, head_dim) fp32
    sin: jax.Array,
    q_info: TokenInfo,
    kv_info: Optional[TokenInfo],
    past_kv: Optional[LayerKV],
    cfg: LLMConfig,
    expert_mode: str,
    compute_dtype,
    attn_impl: str = "auto",
    und_fixup_idx: Optional[jax.Array] = None,
    geo_start: Optional[int] = None,
    sp=None,
) -> Tuple[jax.Array, LayerKV]:
    """One MoT decoder layer over packed tokens. Returns (hidden, new_kv).

    `past_kv` (if given) is the cache prefix: attention runs over
    [past_kv ; new kv] with kv_info covering the concatenation.
    `sp=(mesh, axis_name)` runs attention sequence-parallel (see _attention).
    """
    nh, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    s = x.shape[0]
    variant = cfg.layer_module  # "mot" | "dense" | "moe"
    has_expert_attn = variant == "mot"
    dt = compute_dtype

    if expert_mode == GEO_MAIN:
        assert variant == "mot" and und_fixup_idx is not None
        return _geo_main_layer(
            lp, x, und_fixup_idx, cos, sin, q_info, kv_info, past_kv, cfg, dt,
            attn_impl, sp=sp,
        )
    if expert_mode == SPLIT:
        assert variant == "mot" and geo_start is not None
        return _split_layer(
            lp, x, geo_start, cos, sin, q_info, kv_info, past_kv, cfg, dt,
            attn_impl, sp=sp,
        )

    residual = x

    # --- attention block ---
    h_und = h_geo = None
    if expert_mode != GEO_ONLY or not has_expert_attn:
        h_und = rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
    if has_expert_attn and expert_mode != UND_ONLY:
        h_geo = rms_norm(x, lp["ln_attn_geo"], cfg.rms_norm_eps)

    eps = cfg.rms_norm_eps
    if has_expert_attn:
        qx = _expert_lin(
            h_und, h_geo, lp["q"], lp["q_geo"], is_geo, expert_mode, dt,
        )
        kx = _expert_lin(
            h_und, h_geo, lp["k"], lp["k_geo"], is_geo, expert_mode, dt,
        )
        v = _expert_lin(h_und, h_geo, lp["v"], lp["v_geo"], is_geo, expert_mode, dt)
    else:
        qx = _lin(h_und, lp["q"], dt)
        kx = _lin(h_und, lp["k"], dt)
        v = _lin(h_und, lp["v"], dt)

    # Per-head RMS qk-norm (fp32, per expert — reference qwen2vl.py:600-606)
    # fused with mRoPE via the permutation-matmul rotation (_norm_rope).
    if not cfg.qk_norm:
        gq = gk = None
    elif not has_expert_attn or expert_mode == UND_ONLY:
        gq, gk = lp["q_norm"], lp["k_norm"]
    elif expert_mode == GEO_ONLY:
        gq, gk = lp["q_norm_geo"], lp["k_norm_geo"]
    else:
        gm = is_geo[:, None, None]
        gq = jnp.where(gm, lp["q_norm_geo"][None, None], lp["q_norm"][None, None])
        gk = jnp.where(gm, lp["k_norm_geo"][None, None], lp["k_norm"][None, None])
    q = _norm_rope(qx, _rot_half(qx, nh, hd), gq, cos, sin, eps, nh, hd, dt)
    k = _norm_rope(kx, _rot_half(kx, kvh, hd), gk, cos, sin, eps, kvh, hd, dt)
    v = v.reshape(s, kvh, hd).astype(dt)
    new_kv = LayerKV(k, v)

    if past_kv is not None:
        k_all = jnp.concatenate([past_kv.k.astype(dt), k], axis=0)
        v_all = jnp.concatenate([past_kv.v.astype(dt), v], axis=0)
    else:
        k_all, v_all = k, v
    if kv_info is None:
        kv_info = q_info

    attn = _attention(q, k_all, v_all, q_info, kv_info, attn_impl, sp)
    attn = attn.reshape(s, nh * hd)

    if has_expert_attn:
        attn_out = _expert_lin(
            attn, attn, lp["o"], lp["o_geo"], is_geo, expert_mode, dt
        )
    else:
        attn_out = _lin(attn, lp["o"], dt)

    # LayerScale on geo rows only (reference qwen2vl.py:812-813, 883-886).
    if variant == "mot":
        scaled = attn_out * lp["ls1"].astype(dt)
        if expert_mode == GEO_ONLY:
            attn_out = scaled
        elif expert_mode == MIXED:
            attn_out = _select(is_geo, scaled, attn_out)

    x = residual + attn_out

    # --- MLP block ---
    residual = x
    has_expert_mlp = variant in ("mot", "moe")
    if variant == "mot":
        m_und = m_geo = None
        if expert_mode != GEO_ONLY:
            m_und = _mlp(rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps), lp["mlp"], dt)
        if expert_mode != UND_ONLY:
            m_geo = _mlp(
                rms_norm(x, lp["ln_mlp_geo"], cfg.rms_norm_eps), lp["mlp_geo"], dt
            )
        if expert_mode == UND_ONLY:
            mlp_out = m_und
        elif expert_mode == GEO_ONLY:
            mlp_out = m_geo * lp["ls2"].astype(dt)
        else:
            mlp_out = _select(is_geo, m_geo * lp["ls2"].astype(dt), m_und)
    elif variant == "moe":
        h = rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
        if expert_mode == UND_ONLY:
            mlp_out = _mlp(h, lp["mlp"], dt)
        elif expert_mode == GEO_ONLY:
            mlp_out = _mlp(h, lp["mlp_geo"], dt)
        else:
            mlp_out = _select(
                is_geo, _mlp(h, lp["mlp_geo"], dt), _mlp(h, lp["mlp"], dt)
            )
    else:
        mlp_out = _mlp(rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps), lp["mlp"], dt)

    return residual + mlp_out, new_kv


def decoder_forward(
    params: Dict,
    x: jax.Array,  # (S, D) embedded packed sequence
    is_geo: jax.Array,  # (S,) bool
    position_ids: jax.Array,  # (3, S)
    q_info: TokenInfo,
    kv_info: Optional[TokenInfo],
    past_kv: Optional[Dict],  # {"k": (L, T, KVH, HD), "v": ...} or None
    cfg: LLMConfig,
    expert_mode: str = MIXED,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
    final_norm: bool = True,
    und_fixup_idx: Optional[jax.Array] = None,
    geo_start: Optional[int] = None,
    remat: bool = False,
    collect_hidden: bool = False,
    collect_kv: bool = True,
    remat_group: int = 1,
    remat_inner: bool = True,
    sp=None,
) -> Tuple[jax.Array, Dict]:
    """Run all layers. Returns (hidden (S, D) after final norm, aux dict with
    new_kv stacked {"k": (L, S, KVH, HD), "v": ...} and, when collect_hidden,
    "hidden_states" (L, S, D) — the reference's output_hidden_states /
    intermediate_layers capability (qwen2vl.py:1236-1249)).

    sp=(mesh, axis_name) enables sequence-parallel attention: the packed
    token axis is shard_map-sharded over `axis_name` and KV is all-gathered
    per layer (parallel/sequence.py) — context-parallel scaling the
    reference lacks.
    """
    cos, sin = mrope_cos_sin(
        position_ids, cfg.head_dim, cfg.rope_theta, cfg.mrope_section
    )

    def _pin_replicated(x):
        """Pin a rope table replicated (per dp shard). Without this, the
        partitioner puts the fsdp sharding on the tables' batch dim at the
        layer-scan boundary and then "involuntarily rematerializes" them to
        the in-loop consumer sharding every iteration (spmd_partitioner.cc
        warning in MULTICHIP_r04's interpret-Pallas dryrun tail). Applied
        INSIDE the scan body — a pin outside the loop does not bind the
        while-loop param sharding. (S, hd) fp32 is tiny — replication is the
        right layout. No-op without an active mesh."""
        try:
            from jax.sharding import PartitionSpec
            from jax._src.mesh import thread_resources

            if not thread_resources.env.physical_mesh.empty:
                return jax.lax.with_sharding_constraint(x, PartitionSpec())
        except (ImportError, AttributeError):
            pass  # jax internals moved: skip the pin (purely a perf hint)
        return x

    layers = params["layers"]

    def body(carry, xs):
        h = carry
        if sp is None:
            # Same involuntary-remat pin for the hidden-state carry: under
            # the interpret-lowered kernel the partitioner assigns the loop
            # param a degenerate batch-dim sharding ({8,1,1} on a size-1
            # axis) and full-remats it to the consumer sharding every layer.
            # Activations are replicated-per-dp-shard by design in the
            # non-SP path (TP shards weights, not the inter-layer carry),
            # so the pin states the intended layout. Skipped under SP where
            # the carry is sequence-sharded by shard_map.
            h = _pin_replicated(h)
        lp, pkv = xs
        h, new_kv = mot_layer_forward(
            lp,
            h,
            is_geo,
            _pin_replicated(cos),
            _pin_replicated(sin),
            q_info,
            kv_info,
            pkv,
            cfg,
            expert_mode,
            compute_dtype,
            attn_impl,
            und_fixup_idx=und_fixup_idx,
            geo_start=geo_start,
            sp=sp,
        )
        if not collect_kv:
            # training discards the cache: emitting it stacks (L,S,KVH,HD)
            # k/v (~1G at the 36864 pack) through the scan for nothing
            new_kv = None
        if sp is None:
            # pin the OUTPUT too: the while-loop param's sharding is derived
            # from the body root, so an input-only pin doesn't bind it
            h = _pin_replicated(h)
        return h, ((new_kv, h) if collect_hidden else new_kv)

    if past_kv is None:
        step = lambda c, lp: body(c, (lp, None))
        grouped = (
            remat and remat_group > 1
            and not collect_hidden and not collect_kv
        )
        if remat and (remat_inner or not grouped):
            # trade recompute for activation memory across the 28-layer scan
            # (the reference's apply_activation_checkpointing equivalent,
            # train/fsdp_utils.py:533-547). With remat_inner=False under a
            # group checkpoint, the GROUP recompute pass saves each layer's
            # internals for its bwd instead of recomputing per layer — one
            # less fwd pass per step (executed FLOPs ~4x fwd -> ~3.3x) at
            # the cost of holding one group's layer internals live in bwd.
            step = jax.checkpoint(step, prevent_cse=False)
        if grouped:
            # sqrt-remat: checkpoint GROUPS of layers so the scan-bwd saves
            # one (S, D) carry per group instead of per layer (3.17G -> /G
            # at the 36864 pack); the nested per-layer checkpoint keeps the
            # in-group recompute peak at one layer's internals. Costs one
            # extra fwd recompute of each group during bwd (~+fwd/4 time).
            n_layers = jax.tree.leaves(layers)[0].shape[0]
            assert n_layers % remat_group == 0, (n_layers, remat_group)
            glayers = jax.tree.map(
                lambda a: a.reshape(
                    n_layers // remat_group, remat_group, *a.shape[1:]
                ),
                layers,
            )

            def gstep(c, glp):
                h2, _ = jax.lax.scan(step, c, glp)
                return h2, None

            gstep = jax.checkpoint(gstep, prevent_cse=False)
            h, ys = jax.lax.scan(gstep, x.astype(compute_dtype), glayers)
        else:
            h, ys = jax.lax.scan(step, x.astype(compute_dtype), layers)
    else:
        step = body
        if remat:
            step = jax.checkpoint(step, prevent_cse=False)
        h, ys = jax.lax.scan(
            step, x.astype(compute_dtype), (layers, LayerKV(past_kv["k"], past_kv["v"]))
        )
    if collect_hidden:
        kvs, hidden_layers = ys
    else:
        kvs, hidden_layers = ys, None

    if final_norm:
        if cfg.use_moe:
            if expert_mode == UND_ONLY:
                h = rms_norm(h, params["norm"], cfg.rms_norm_eps)
            elif expert_mode == GEO_ONLY:
                h = rms_norm(h, params["norm_geo"], cfg.rms_norm_eps)
            elif expert_mode == GEO_MAIN:
                hu = rms_norm(h[und_fixup_idx], params["norm"], cfg.rms_norm_eps)
                h = rms_norm(h, params["norm_geo"], cfg.rms_norm_eps)
                h = h.at[und_fixup_idx].set(hu)
            elif expert_mode == SPLIT:
                h = jnp.concatenate(
                    [
                        rms_norm(h[:geo_start], params["norm"], cfg.rms_norm_eps),
                        rms_norm(h[geo_start:], params["norm_geo"], cfg.rms_norm_eps),
                    ],
                    axis=0,
                )
            else:
                h = jnp.where(
                    is_geo[:, None],
                    rms_norm(h, params["norm_geo"], cfg.rms_norm_eps),
                    rms_norm(h, params["norm"], cfg.rms_norm_eps),
                )
        else:
            h = rms_norm(h, params["norm"], cfg.rms_norm_eps)
    aux = {} if kvs is None else {"k": kvs.k, "v": kvs.v}
    if hidden_layers is not None:
        aux["hidden_states"] = hidden_layers
    return h, aux


def embed_tokens(params: Dict, token_ids: jax.Array) -> jax.Array:
    return params["embed"][token_ids]


def lm_head(params: Dict, hidden: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
    # run the GEMM at promote_types(hidden, w) with fp32 MXU accumulation.
    # In the production bf16/bf16 case the (D, V) weight stays in its stored
    # dtype — materializing the 152k-vocab matrix (and its bwd transpose) in
    # fp32 costs ~1.9GB of HBM temps at training time for identical
    # accumulation numerics. An fp32-hidden caller instead pays the weight
    # upcast and gets true fp32 numerics (no silent input downcast).
    w = params["lm_head"]
    ct = jnp.promote_types(hidden.dtype, w.dtype)
    return jax.lax.dot_general(
        hidden.astype(ct), w.astype(ct),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=compute_dtype,
    )


# ---------------------------------------------------------------------------
# init / torch weight mapping
# ---------------------------------------------------------------------------

def init_params(cfg: LLMConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    d, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    nh, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    L = cfg.num_hidden_layers
    ks = iter(jax.random.split(key, 64))

    def lin(din, dout, bias=True):
        p = {"w": jax.random.normal(next(ks), (L, din, dout), dtype) * (din ** -0.5)}
        if bias:
            p["b"] = jnp.zeros((L, dout), dtype)
        return p

    def mlp():
        return {
            "gate": lin(d, inter, bias=False),
            "up": lin(d, inter, bias=False),
            "down": lin(inter, d, bias=False),
        }

    layers = {
        "ln_attn": jnp.ones((L, d), dtype),
        "q": lin(d, nh * hd),
        "k": lin(d, kvh * hd),
        "v": lin(d, kvh * hd),
        "o": lin(nh * hd, d, bias=False),
        "q_norm": jnp.ones((L, hd), dtype),
        "k_norm": jnp.ones((L, hd), dtype),
        "ln_mlp": jnp.ones((L, d), dtype),
        "mlp": mlp(),
    }
    if cfg.layer_module == "mot":
        layers.update(
            ln_attn_geo=jnp.ones((L, d), dtype),
            q_geo=lin(d, nh * hd),
            k_geo=lin(d, kvh * hd),
            v_geo=lin(d, kvh * hd),
            o_geo=lin(nh * hd, d, bias=False),
            q_norm_geo=jnp.ones((L, hd), dtype),
            k_norm_geo=jnp.ones((L, hd), dtype),
            ln_mlp_geo=jnp.ones((L, d), dtype),
            mlp_geo=mlp(),
            ls1=jnp.full((L, d), cfg.layer_scale_init, dtype),
            ls2=jnp.full((L, d), cfg.layer_scale_init, dtype),
        )
    elif cfg.layer_module == "moe":
        layers.update(mlp_geo=mlp())

    params = {
        "embed": jax.random.normal(next(ks), (v, d), dtype) * 0.02,
        "layers": layers,
        "norm": jnp.ones((d,), dtype),
        "lm_head": jax.random.normal(next(ks), (d, v), dtype) * (d ** -0.5),
    }
    if cfg.use_moe:
        params["norm_geo"] = jnp.ones((d,), dtype)
    return params


def params_from_torch(state_dict, cfg: LLMConfig, prefix: str = "") -> Dict:
    """Map the reference Qwen2VLForCausalLM state_dict (naming per
    qwen2vl.py:1340-1356: model.layers.{i}.self_attn.{q,k,v,o}_proj[_moe_geo],
    .mlp[_moe_geo].{gate,up,down}_proj, .input_layernorm[_moe_geo], ...)."""

    def g(name):
        t = state_dict[prefix + name]
        arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        return jnp.asarray(arr, jnp.float32)

    def lin(name, bias=True):
        p = {"w": g(name + ".weight").T}
        if bias:
            p["b"] = g(name + ".bias")
        return p

    def mlp(name):
        return {
            "gate": lin(name + ".gate_proj", bias=False),
            "up": lin(name + ".up_proj", bias=False),
            "down": lin(name + ".down_proj", bias=False),
        }

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}."
        lp = {
            "ln_attn": g(pre + "input_layernorm.weight"),
            "q": lin(pre + "self_attn.q_proj"),
            "k": lin(pre + "self_attn.k_proj"),
            "v": lin(pre + "self_attn.v_proj"),
            "o": lin(pre + "self_attn.o_proj", bias=False),
            "q_norm": g(pre + "self_attn.q_norm.weight"),
            "k_norm": g(pre + "self_attn.k_norm.weight"),
            "ln_mlp": g(pre + "post_attention_layernorm.weight"),
            "mlp": mlp(pre + "mlp"),
        }
        if cfg.layer_module == "mot":
            lp.update(
                ln_attn_geo=g(pre + "input_layernorm_moe_geo.weight"),
                q_geo=lin(pre + "self_attn.q_proj_moe_geo"),
                k_geo=lin(pre + "self_attn.k_proj_moe_geo"),
                v_geo=lin(pre + "self_attn.v_proj_moe_geo"),
                o_geo=lin(pre + "self_attn.o_proj_moe_geo", bias=False),
                q_norm_geo=g(pre + "self_attn.q_norm_moe_geo.weight"),
                k_norm_geo=g(pre + "self_attn.k_norm_moe_geo.weight"),
                ln_mlp_geo=g(pre + "post_attention_layernorm_moe_geo.weight"),
                mlp_geo=mlp(pre + "mlp_moe_geo"),
                ls1=g(pre + "ls1.gamma"),
                ls2=g(pre + "ls2.gamma"),
            )
        elif cfg.layer_module == "moe":
            lp.update(mlp_geo=mlp(pre + "mlp_moe_geo"))
        layers.append(lp)

    params = {
        "embed": g("model.embed_tokens.weight"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": g("model.norm.weight"),
        "lm_head": g("lm_head.weight").T,
    }
    if cfg.use_moe:
        params["norm_geo"] = g("model.norm_moe_geo.weight")
    return params
