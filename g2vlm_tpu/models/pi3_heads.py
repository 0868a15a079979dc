"""Pi3/VGGT-style 3D heads reading LLM hidden states, TPU-native.

Behavioral spec: reference modeling/pi3/models/layers/{transformer_head.py:9-130,
camera_head.py:7-93, block.py:259-406, attention.py:238-270 & 357-381,
pos_embed.py:106-174} and their assembly in modeling/g2vlm/g2vlm.py:162-226,
1143-1238.

Components:
  * 5-block self-attention decoder with 2D axial RoPE (point / camera / conf)
  * 5-block self+cross decoder (global points; frame-0 tokens as context)
  * pixel-shuffle linear point head
  * camera head: 2 residual 1x1 blocks, token mean-pool, MLPs, 9D->SO(3) via
    fp32 SVD orthogonalization, assembled into SE(3)

All attention here is dense batched MHA over (B*N, hw, D) — static shapes,
straight onto the MXU. Heads run in fp32 (reference g2vlm.py:1200-1226 wraps
them in autocast-disabled fp32).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Pi3HeadConfig
from ..ops.attention import dense_attention
from ..ops.norms import layer_norm
from ..ops.rope import rope2d_cos_sin


def _lin(x, p, dtype):
    y = x.astype(dtype) @ p["w"].astype(dtype)
    if "b" in p:
        y = y + p["b"].astype(dtype)
    return y


def patch_positions(n: int, hp: int, wp: int) -> jax.Array:
    """(n, hp*wp, 2) cartesian (y, x) patch coordinates (reference
    pos_embed.py:162-174)."""
    ys = np.arange(hp, dtype=np.int32)
    xs = np.arange(wp, dtype=np.int32)
    grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1).reshape(-1, 2)
    return jnp.broadcast_to(jnp.asarray(grid), (n, hp * wp, 2))


def _rope_fold_idx(num_heads: int, hd: int):
    """Column permutation + signs that fold RoPE2D's axial rotate-half into
    the projection weights: (x @ w)[..., perm]*sign == rotate_half_axial
    per head. The 24-element lane slices/concats of the direct rotation are
    a relayout storm on TPU (measured 4.3 ms per application at 32 views);
    as folded weight columns the rotation costs one wider GEMM instead."""
    half = hd // 2
    q = half // 2
    idx_h = np.empty(hd, np.int64)
    sgn_h = np.empty(hd, np.float32)
    for off in (0, half):  # y-half, x-half
        idx_h[off : off + q] = off + q + np.arange(q)  # out[:q] = -in[q:2q]
        sgn_h[off : off + q] = -1.0
        idx_h[off + q : off + half] = off + np.arange(q)  # out[q:] = in[:q]
        sgn_h[off + q : off + half] = 1.0
    idx = np.concatenate([idx_h + h * hd for h in range(num_heads)])
    sgn = np.tile(sgn_h, num_heads)
    return idx, sgn


def _rot_perm_matrix(num_heads: int, hd: int):
    """(hd, hd) signed-permutation matrix P with t @ P == rotate_half_axial(t)
    per head. Applying P as a tiny head-dim matmul costs ~15 GFLOP at the
    production head shapes vs ~237 GFLOP for the r3 'folded projection
    columns' trick (extra (d, 2d) GEMM columns), and is still shuffle-free:
    the permutation rides the MXU. Output is bitwise identical to the folded
    columns (P entries are exactly +-1; bf16 rounding is sign-symmetric)."""
    idx, sgn = _rope_fold_idx(1, hd)
    p = np.zeros((hd, hd), np.float32)
    p[idx, np.arange(hd)] = sgn
    return jnp.asarray(p)


def _use_flash(b, s, m=None):
    """Pallas batched kernel on TPU once the dense fp32 logit tensors would
    dominate HBM traffic (same dispatch rule as models/dinov2.py)."""
    thresh = int(os.environ.get("G2VLM_BATCHED_FLASH_MIN", 64 * 512 * 512))
    return (
        jax.default_backend() == "tpu"
        and b * s * (m if m is not None else s) >= thresh
    )


def _attend(q, k, v, valid_kv=None):
    # q, k, v: (B, S, H, D); keys >= valid_kv (pre-padded rows) are masked
    if _use_flash(q.shape[0], q.shape[1], k.shape[1]):
        from ..ops.flash_attention import flash_batched_attention

        return flash_batched_attention(q, k, v, valid_kv=valid_kv)
    if valid_kv is not None and valid_kv < k.shape[1]:
        mask = jnp.arange(k.shape[1]) < valid_kv  # (M,) -> (1, 1, 1, M)
        return dense_attention(q, k, v, mask=mask[None, None, None, :])
    return dense_attention(q, k, v)


def _rope_mix(t, t_rot, cos, sin, dtype):
    """out = t*cos + rotate_half(t)*sin, with the rotated copy coming from
    the folded projection columns (no lane shuffles)."""
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    out = t.astype(jnp.float32) * c + t_rot.astype(jnp.float32) * s
    return out.astype(dtype)


def _rot(t, pmat, dtype):
    """rotate_half_axial(t) via the signed-permutation matmul (MXU, no lane
    shuffles)."""
    return jnp.einsum("bshd,de->bshe", t, pmat.astype(dtype))


def _self_attn(x, lp, cos, sin, num_heads, dtype, valid_kv=None):
    """Fused-QKV self attention with RoPE2D (reference FlashAttentionRope,
    attention.py:357-381; qk_norm is disabled in the Pi3 heads). Everything
    stays in (B, S, H, D) layout, and the RoPE rotate-half runs as a tiny
    signed-permutation matmul on the head dim (see _rot_perm_matrix) — no
    lane-shuffle relayouts, ~16x fewer FLOPs than the folded-column GEMM."""
    b, s, d = x.shape
    hd = d // num_heads
    pmat = _rot_perm_matrix(num_heads, hd)
    qkv = _lin(x, lp["qkv"], dtype)  # (b, s, 3d)
    q = qkv[..., :d].reshape(b, s, num_heads, hd)
    k = qkv[..., d : 2 * d].reshape(b, s, num_heads, hd)
    v = qkv[..., 2 * d :].reshape(b, s, num_heads, hd)
    q = _rope_mix(q, _rot(q, pmat, dtype), cos, sin, dtype)
    k = _rope_mix(k, _rot(k, pmat, dtype), cos, sin, dtype)
    out = _attend(q, k, v, valid_kv=valid_kv).reshape(b, s, d)
    return _lin(out, lp["proj"], dtype)


def _cross_attn(x, y, lp, cos_q, sin_q, cos_k, sin_k, num_heads, dtype,
                valid_kv=None):
    """Separate-projection cross attention with RoPE2D (reference
    FlashCrossAttentionRope, attention.py:238-270). Rotations applied via
    the signed-permutation matmul like _self_attn.

    y may carry batch 1 against x batch B (the global decoder's shared
    frame-0 context, reference Pi3ContextTransformerDecoder): K/V
    projections + rope then run once and broadcast after, instead of B
    redundant copies."""
    b, s, d = x.shape
    by, m = y.shape[0], y.shape[1]
    hd = d // num_heads
    pmat = _rot_perm_matrix(num_heads, hd)
    q = _lin(x, lp["q"], dtype).reshape(b, s, num_heads, hd)
    k = _lin(y, lp["k"], dtype).reshape(by, m, num_heads, hd)
    v = _lin(y, lp["v"], dtype).reshape(by, m, num_heads, hd)
    q = _rope_mix(q, _rot(q, pmat, dtype), cos_q, sin_q, dtype)
    k = _rope_mix(k, _rot(k, pmat, dtype), cos_k, sin_k, dtype)
    if by == 1 and b > 1:
        k = jnp.broadcast_to(k, (b, m, num_heads, hd))
        v = jnp.broadcast_to(v, (b, m, num_heads, hd))
    out = _attend(q, k, v, valid_kv=valid_kv).reshape(b, s, d)
    return _lin(out, lp["proj"], dtype)


def _mlp(x, lp, dtype):
    h = _lin(x, lp["fc1"], dtype)
    h = jax.nn.gelu(h, approximate=False)
    return _lin(h, lp["fc2"], dtype)


def decoder_forward(
    params: Dict,
    hidden: jax.Array,  # (B*N, hw, D)
    positions: jax.Array,  # (B*N, hw, 2)
    cfg: Pi3HeadConfig,
    context: Optional[jax.Array] = None,  # (B*N, hw_ctx, D) for cross decoder
    context_positions: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """Pi3TransformerDecoder / Pi3ContextTransformerDecoder. Output is
    linear_out(blocks(hidden)) of dim cfg.*_out_dim."""
    d = hidden.shape[-1]
    hd = d // cfg.num_heads
    eps = cfg.layer_norm_eps
    dt = compute_dtype

    # Run the WHOLE decoder at an 8-multiple row count: a 518px view is 777
    # tokens, and 777-row tensors made XLA thread (8,128)-tile relayout
    # copies between every GEMM/residual/attention (35% of head device time
    # in the r3 trace). Pad once here, mask the pad keys inside attention,
    # slice once at the end — pad QUERY rows carry garbage that never
    # escapes their own rows.
    s_real = hidden.shape[1]
    s_pad = -(-s_real // 8) * 8
    if s_pad != s_real:
        hidden = jnp.pad(hidden, ((0, 0), (0, s_pad - s_real), (0, 0)))
        positions = jnp.pad(
            positions, ((0, 0), (0, s_pad - s_real), (0, 0))
        )
    valid_kv = s_real if s_pad != s_real else None
    cos, sin = rope2d_cos_sin(positions, hd, cfg.rope_freq)
    ctx_valid = None
    if context is not None:
        m_real = context.shape[1]
        m_pad = -(-m_real // 8) * 8
        if m_pad != m_real:
            context = jnp.pad(
                context, ((0, 0), (0, m_pad - m_real), (0, 0))
            )
            context_positions = jnp.pad(
                context_positions, ((0, 0), (0, m_pad - m_real), (0, 0))
            )
            ctx_valid = m_real
        cos_k, sin_k = rope2d_cos_sin(context_positions, hd, cfg.rope_freq)
        ctx = context.astype(dt)

    x = hidden.astype(dt)

    def block(x, lp):
        h = layer_norm(x, lp["norm1"]["w"], lp["norm1"]["b"], eps)
        x = x + _self_attn(
            h, lp["attn"], cos, sin, cfg.num_heads, dt, valid_kv=valid_kv
        )
        if context is not None:
            y = layer_norm(ctx, lp["norm_y"]["w"], lp["norm_y"]["b"], eps)
            h = layer_norm(x, lp["norm2"]["w"], lp["norm2"]["b"], eps)
            x = x + _cross_attn(
                h, y, lp["cross"], cos, sin, cos_k, sin_k, cfg.num_heads,
                dt, valid_kv=ctx_valid,
            )
            h = layer_norm(x, lp["norm3"]["w"], lp["norm3"]["b"], eps)
        else:
            h = layer_norm(x, lp["norm2"]["w"], lp["norm2"]["b"], eps)
        x = x + _mlp(h, lp["mlp"], dt)
        return x, None

    if remat:
        block = jax.checkpoint(block, prevent_cse=False)
    x, _ = jax.lax.scan(block, x, params["blocks"])
    out = _lin(x, params["linear_out"], dt)
    return out[:, :s_real]


def _lin_k(x, p, dtype):
    """Per-decoder GEMM: x (K, B, S, din) @ w (K, din, dout) — a K-batched
    matmul (block-diagonal over the stacked decoders)."""
    y = jnp.einsum(
        "kbsd,kde->kbse", x.astype(dtype), p["w"].astype(dtype)
    )
    if "b" in p:
        y = y + p["b"][:, None, None, :].astype(dtype)
    return y


def stacked_decoder_forward(
    params_list,
    hidden: jax.Array,  # (B*N, hw, D) shared input
    positions: jax.Array,  # (B*N, hw, 2)
    cfg: Pi3HeadConfig,
    compute_dtype=jnp.float32,
    remat: bool = False,
):
    """Run K architecturally-identical self-attention decoders (point /
    camera / conf — reference g2vlm.py:162-226 instantiates them with the
    same dim/heads/depth) over the SAME input as ONE fused scan: block
    weights stacked on a leading K axis, views tiled to K*B inside
    attention. Per block this issues one attention kernel and one
    norm/residual chain instead of K of each — the r3 profile put the heads
    ~2x over their dot roofline on exactly those per-op costs. Exact: the
    decoders never mix (batched GEMMs are block-diagonal in K; attention is
    per-view). Returns the K outputs (linear_out applied per decoder)."""
    kd = len(params_list)
    d = hidden.shape[-1]
    hd = d // cfg.num_heads
    eps = cfg.layer_norm_eps
    dt = compute_dtype

    s_real = hidden.shape[1]
    s_pad = -(-s_real // 8) * 8
    if s_pad != s_real:
        hidden = jnp.pad(hidden, ((0, 0), (0, s_pad - s_real), (0, 0)))
        positions = jnp.pad(positions, ((0, 0), (0, s_pad - s_real), (0, 0)))
    valid_kv = s_real if s_pad != s_real else None
    cos, sin = rope2d_cos_sin(positions, hd, cfg.rope_freq)
    cos_t = jnp.tile(cos, (kd, 1, 1))
    sin_t = jnp.tile(sin, (kd, 1, 1))

    b, s, _ = hidden.shape
    x = jnp.broadcast_to(hidden.astype(dt), (kd, b, s, d))
    blocks = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[p["blocks"] for p in params_list]
    )  # leaves: (K, L, ...) — scan runs over L
    blocks = jax.tree.map(lambda t: jnp.swapaxes(t, 0, 1), blocks)
    pmat = _rot_perm_matrix(cfg.num_heads, hd)

    def norm_k(x, lp):
        return layer_norm(
            x, lp["w"][:, None, None, :], lp["b"][:, None, None, :], eps
        )

    def attn_k(h, lp):
        qkv = _lin_k(h, lp["qkv"], dt)
        q = qkv[..., :d].reshape(kd * b, s, cfg.num_heads, hd)
        k = qkv[..., d : 2 * d].reshape(kd * b, s, cfg.num_heads, hd)
        v = qkv[..., 2 * d :].reshape(kd * b, s, cfg.num_heads, hd)
        q = _rope_mix(q, _rot(q, pmat, dt), cos_t, sin_t, dt)
        k = _rope_mix(k, _rot(k, pmat, dt), cos_t, sin_t, dt)
        out = _attend(q, k, v, valid_kv=valid_kv).reshape(kd, b, s, d)
        return _lin_k(out, lp["proj"], dt)

    def block(x, lp):
        h = norm_k(x, lp["norm1"])
        x = x + attn_k(h, lp["attn"])
        h = norm_k(x, lp["norm2"])
        h = _lin_k(h, lp["mlp"]["fc1"], dt)
        h = jax.nn.gelu(h, approximate=False)
        x = x + _lin_k(h, lp["mlp"]["fc2"], dt)
        return x, None

    if remat:
        block = jax.checkpoint(block, prevent_cse=False)
    x, _ = jax.lax.scan(block, x, blocks)
    return [
        _lin(x[i], p["linear_out"], dt)[:, :s_real]
        for i, p in enumerate(params_list)
    ]


def linear_pts3d(params: Dict, tokens: jax.Array, img_hw, patch_size: int) -> jax.Array:
    """Pixel-shuffle point head (reference Pi3LinearPts3d,
    transformer_head.py:58-81). tokens (B, S, D) -> (B, H, W, out_dim)."""
    h, w = img_hw
    p = patch_size
    b, s, _ = tokens.shape
    hp, wp = h // p, w // p
    feat = _lin(tokens, params["proj"], jnp.float32)  # (B, S, C*p*p)
    c = feat.shape[-1] // (p * p)
    # torch: view(B, C*p*p, hp, wp) then pixel_shuffle(p):
    # out[b, ch, y*p+i, x*p+j] = feat[b, ch*p*p + i*p + j, y, x].
    # One fused 6D transpose straight to channel-last (B, H, W, C) — the
    # two-step CHW detour doubled the relayout traffic.
    feat = feat.reshape(b, hp, wp, c, p, p)
    return feat.transpose(0, 1, 4, 2, 5, 3).reshape(b, h, w, c)


def svd_orthogonalize(m: jax.Array) -> jax.Array:
    """9D -> SO(3) via SVD (reference camera_head.py:74-93), fp32.

    r = V' @ U^T where USV^T = normalize(m)^T and V' has its last column
    flipped by det(V @ U^T) to ensure a proper rotation.
    """
    m = m.reshape(-1, 3, 3).astype(jnp.float32)
    norm = jnp.linalg.norm(m, axis=-1, keepdims=True)
    m_t = (m / jnp.maximum(norm, 1e-12)).swapaxes(-1, -2)
    u, s, vh = jnp.linalg.svd(m_t, full_matrices=False)
    v = vh.swapaxes(-1, -2)
    det = jnp.linalg.det(v @ u.swapaxes(-1, -2))
    v_fixed = jnp.concatenate([v[..., :-1], v[..., -1:] * det[:, None, None]], axis=-1)
    return v_fixed @ u.swapaxes(-1, -2)


def camera_head(params: Dict, feat: jax.Array, patch_h: int, patch_w: int) -> jax.Array:
    """Camera pose head (reference Pi3CameraHead, camera_head.py:32-72).
    feat (BN, hw, C) -> (BN, 4, 4) SE(3)."""
    bn = feat.shape[0]
    x = feat.astype(jnp.float32)
    for blk in params["res_conv"]:
        h = jax.nn.relu(_lin(x, blk["c1"], jnp.float32))
        h = jax.nn.relu(_lin(h, blk["c2"], jnp.float32))
        h = jax.nn.relu(_lin(h, blk["c3"], jnp.float32))
        x = x + h  # head_skip is Identity (in==out channels)
    x = jnp.mean(x, axis=1)  # AdaptiveAvgPool2d(1) == token mean
    x = jax.nn.relu(_lin(x, params["mlp1"], jnp.float32))
    x = jax.nn.relu(_lin(x, params["mlp2"], jnp.float32))
    t = _lin(x, params["fc_t"], jnp.float32)  # (BN, 3)
    r9 = _lin(x, params["fc_rot"], jnp.float32)  # (BN, 9)
    rot = svd_orthogonalize(r9)
    pose = jnp.zeros((bn, 4, 4), jnp.float32)
    pose = pose.at[:, :3, :3].set(rot)
    pose = pose.at[:, :3, 3].set(t)
    pose = pose.at[:, 3, 3].set(1.0)
    return pose


# ---------------------------------------------------------------------------
# init / torch weight mapping
# ---------------------------------------------------------------------------

def init_decoder_params(
    cfg: Pi3HeadConfig,
    key: jax.Array,
    dim: int,
    out_dim: int,
    cross: bool = False,
    dtype=jnp.float32,
) -> Dict:
    L = cfg.depth
    hidden = int(dim * cfg.mlp_ratio)
    ks = iter(jax.random.split(key, 32))

    def lin(din, dout, bias=True):
        p = {"w": jax.random.normal(next(ks), (L, din, dout), dtype) * (din ** -0.5)}
        if bias:
            p["b"] = jnp.zeros((L, dout), dtype)
        return p

    def norm():
        return {"w": jnp.ones((L, dim), dtype), "b": jnp.zeros((L, dim), dtype)}

    blocks = {
        "norm1": norm(),
        "attn": {"qkv": lin(dim, 3 * dim), "proj": lin(dim, dim)},
        "norm2": norm(),
        "mlp": {"fc1": lin(dim, hidden), "fc2": lin(hidden, dim)},
    }
    if cross:
        blocks.update(
            norm_y=norm(),
            norm3=norm(),
            cross={
                "q": lin(dim, dim),
                "k": lin(dim, dim),
                "v": lin(dim, dim),
                "proj": lin(dim, dim),
            },
        )
    return {
        "blocks": blocks,
        "linear_out": {
            "w": jax.random.normal(next(ks), (dim, out_dim), dtype) * (dim ** -0.5),
            "b": jnp.zeros((out_dim,), dtype),
        },
    }


def _t2j(t):
    return jnp.asarray(
        np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t),
        jnp.float32,
    )


def decoder_params_from_torch(state_dict, depth: int, prefix: str = "") -> Dict:
    """Map Pi3TransformerDecoder / Pi3ContextTransformerDecoder state dicts
    (naming per transformer_head.py: blocks.{i}.norm1/attn.qkv/..., plus
    cross_attn / norm_y / norm3 for the context decoder)."""

    def g(name):
        return _t2j(state_dict[prefix + name])

    def lin(name, bias=True):
        p = {"w": g(name + ".weight").T}
        if bias:
            p["b"] = g(name + ".bias")
        return p

    def norm(name):
        return {"w": g(name + ".weight"), "b": g(name + ".bias")}

    cross = any(k.startswith(prefix + "blocks.0.cross_attn.") for k in state_dict)
    blocks = []
    for i in range(depth):
        pre = f"blocks.{i}."
        bp = {
            "norm1": norm(pre + "norm1"),
            "attn": {"qkv": lin(pre + "attn.qkv"), "proj": lin(pre + "attn.proj")},
            "mlp": {"fc1": lin(pre + "mlp.fc1"), "fc2": lin(pre + "mlp.fc2")},
        }
        if cross:
            bp.update(
                norm2=norm(pre + "norm2"),
                norm3=norm(pre + "norm3"),
                norm_y=norm(pre + "norm_y"),
                cross={
                    "q": lin(pre + "cross_attn.q_proj"),
                    "k": lin(pre + "cross_attn.k_proj"),
                    "v": lin(pre + "cross_attn.v_proj"),
                    "proj": lin(pre + "cross_attn.proj"),
                },
            )
        else:
            bp["norm2"] = norm(pre + "norm2")
        blocks.append(bp)
    return {
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "linear_out": lin("linear_out"),
    }


def pts3d_params_from_torch(state_dict, prefix: str = "") -> Dict:
    return {
        "proj": {
            "w": _t2j(state_dict[prefix + "proj.weight"]).T,
            "b": _t2j(state_dict[prefix + "proj.bias"]),
        }
    }


def camera_head_params_from_torch(state_dict, prefix: str = "") -> Dict:
    def lin(name):
        return {
            "w": _t2j(state_dict[prefix + name + ".weight"]).T,
            "b": _t2j(state_dict[prefix + name + ".bias"]),
        }

    return {
        "res_conv": [
            {
                "c1": lin(f"res_conv.{i}.res_conv1"),
                "c2": lin(f"res_conv.{i}.res_conv2"),
                "c3": lin(f"res_conv.{i}.res_conv3"),
            }
            for i in range(2)
        ],
        "mlp1": lin("more_mlps.0"),
        "mlp2": lin("more_mlps.2"),
        "fc_t": lin("fc_t"),
        "fc_rot": lin("fc_rot"),
    }


def init_pts3d_params(key, dec_dim: int, patch_size: int, out_dim: int, dtype=jnp.float32):
    d_out = out_dim * patch_size * patch_size
    return {
        "proj": {
            "w": jax.random.normal(key, (dec_dim, d_out), dtype) * (dec_dim ** -0.5),
            "b": jnp.zeros((d_out,), dtype),
        }
    }


def init_camera_head_params(key, dim: int, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 16))

    def lin(din, dout):
        return {
            "w": jax.random.normal(next(ks), (din, dout), dtype) * (din ** -0.5),
            "b": jnp.zeros((dout,), dtype),
        }

    return {
        "res_conv": [
            {"c1": lin(dim, dim), "c2": lin(dim, dim), "c3": lin(dim, dim)}
            for _ in range(2)
        ],
        "mlp1": lin(dim, dim),
        "mlp2": lin(dim, dim),
        "fc_t": lin(dim, 3),
        "fc_rot": lin(dim, 9),
    }
