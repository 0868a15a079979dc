"""Rotary position embeddings: 3-axis mRoPE (LLM), 2D axial RoPE (Pi3 heads),
and 2D vision RoPE (Qwen2-VL ViT).

All cos/sin tables are computed in float32 and rotation is applied in float32,
then cast back to the input dtype — matching reference numerics
(modeling/qwen2vl/modeling_qwen2_vl.py:141-246, pi3/models/layers/pos_embed.py:112-159).

These are pure jnp ops; XLA fuses them into the surrounding QK projections, so
no custom kernel is needed (the reference's optional cuRoPE2D CUDA extension is
unnecessary on TPU).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rotate_half(x: jax.Array) -> jax.Array:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


# ---------------------------------------------------------------------------
# 3-axis mRoPE for the Qwen2-VL LLM
# ---------------------------------------------------------------------------

def mrope_axis_map(head_dim: int, mrope_section: Sequence[int]) -> np.ndarray:
    """Static per-channel axis selector implementing the section interleave of
    apply_multimodal_rotary_pos_emb (reference modeling_qwen2_vl.py:176-232):
    channel blocks of sizes mrope_section*2 cycle through axes (t, h, w)."""
    half = head_dim // 2
    assert sum(mrope_section) == half, (mrope_section, head_dim)
    axes = []
    for i, sec in enumerate(list(mrope_section) * 2):
        axes.extend([i % 3] * sec)
    return np.asarray(axes, dtype=np.int32)  # (head_dim,)


def mrope_cos_sin(
    position_ids: jax.Array,  # (3, S) int
    head_dim: int,
    theta: float,
    mrope_section: Sequence[int],
) -> Tuple[jax.Array, jax.Array]:
    """Per-token cos/sin of shape (S, head_dim), float32, with the t/h/w
    section interleave already folded in."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float32) * 2.0 / head_dim))
    inv_freq2 = jnp.asarray(np.concatenate([inv_freq, inv_freq]))  # (head_dim,)
    axis_map = jnp.asarray(mrope_axis_map(head_dim, mrope_section))  # (head_dim,)
    # pos_per_channel[s, c] = position_ids[axis_map[c], s]
    pos = position_ids.astype(jnp.float32)  # (3, S)
    pos_per_channel = pos[axis_map, :].T  # (S, head_dim)
    ang = pos_per_channel * inv_freq2[None, :]
    return jnp.cos(ang), jnp.sin(ang)


def apply_mrope(
    q: jax.Array,  # (S, num_heads, head_dim)
    k: jax.Array,  # (S, num_kv_heads, head_dim)
    cos: jax.Array,  # (S, head_dim) float32
    sin: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    qd, kd = q.dtype, k.dtype
    c = cos[:, None, :]
    s = sin[:, None, :]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    q_out = qf * c + rotate_half(qf) * s
    k_out = kf * c + rotate_half(kf) * s
    return q_out.astype(qd), k_out.astype(kd)


# ---------------------------------------------------------------------------
# 2D axial RoPE for Pi3 decoder heads (reference pos_embed.py:112-159)
# ---------------------------------------------------------------------------

def rope2d_cos_sin(
    positions: jax.Array,  # (B, S, 2) int — (y, x) patch coords
    head_dim: int,
    freq: float = 100.0,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin of shape (B, S, head_dim), float32.

    The head_dim splits into a y-half and an x-half; each half is a standard
    1D RoPE of dimension head_dim//2 with base `freq`.
    """
    half = head_dim // 2  # per-axis rope dim
    quarter = half // 2
    inv_freq = 1.0 / (freq ** (np.arange(0, half, 2, dtype=np.float32) / half))
    inv_freq = jnp.asarray(np.concatenate([inv_freq, inv_freq]))  # (half,)
    posf = positions.astype(jnp.float32)  # (B, S, 2)
    ang_y = posf[..., 0:1] * inv_freq[None, None, :]  # (B, S, half)
    ang_x = posf[..., 1:2] * inv_freq[None, None, :]
    ang = jnp.concatenate([ang_y, ang_x], axis=-1)  # (B, S, head_dim)
    return jnp.cos(ang), jnp.sin(ang)


def _rotate_half_axial(x: jax.Array) -> jax.Array:
    """rotate_half applied independently within the y-half and x-half."""
    d = x.shape[-1]
    half = d // 2
    y, xx = x[..., :half], x[..., half:]
    q = half // 2
    y_rot = jnp.concatenate([-y[..., q:], y[..., :q]], axis=-1)
    x_rot = jnp.concatenate([-xx[..., q:], xx[..., :q]], axis=-1)
    return jnp.concatenate([y_rot, x_rot], axis=-1)


def apply_rope2d(
    tokens: jax.Array,  # (B, num_heads, S, head_dim)
    cos: jax.Array,  # (B, S, head_dim)
    sin: jax.Array,
) -> jax.Array:
    dtype = tokens.dtype
    t = tokens.astype(jnp.float32)
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]
    out = t * c + _rotate_half_axial(t) * s
    return out.astype(dtype)


def apply_rope2d_bshd(
    tokens: jax.Array,  # (B, S, num_heads, head_dim)
    cos: jax.Array,  # (B, S, head_dim)
    sin: jax.Array,
) -> jax.Array:
    """Same rotation in (B, S, H, D) layout — avoids the head-major
    transposes (pure relayout traffic) around attention in the Pi3 heads."""
    dtype = tokens.dtype
    t = tokens.astype(jnp.float32)
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    out = t * c + _rotate_half_axial(t) * s
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Qwen2-VL vision RoPE (reference modeling_qwen2_vl.py:249-258, 1019-1046)
# ---------------------------------------------------------------------------

def vision_rope_cos_sin(
    pos_hw: jax.Array,  # (S, 2) int — (h, w) patch coords in merge-permuted order
    head_dim: int,
    theta: float = 10000.0,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin of shape (S, head_dim), float32.

    VisionRotaryEmbedding uses dim = head_dim // 2 per axis; the (h, w) freq
    vectors are concatenated then duplicated (reference :1044-1052).
    """
    dim = head_dim // 2
    inv_freq = jnp.asarray(
        1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    )  # (dim//2,)
    posf = pos_hw.astype(jnp.float32)
    fh = posf[:, 0:1] * inv_freq[None, :]  # (S, dim//2)
    fw = posf[:, 1:2] * inv_freq[None, :]
    half = jnp.concatenate([fh, fw], axis=-1)  # (S, dim) == head_dim//2
    ang = jnp.concatenate([half, half], axis=-1)  # (S, head_dim)
    return jnp.cos(ang), jnp.sin(ang)


def apply_vision_rope(
    q: jax.Array,  # (S, num_heads, head_dim)
    k: jax.Array,
    cos: jax.Array,  # (S, head_dim)
    sin: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    qd, kd = q.dtype, k.dtype
    c = cos[:, None, :]
    s = sin[:, None, :]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    q_out = qf * c + rotate_half(qf) * s
    k_out = kf * c + rotate_half(kf) * s
    return q_out.astype(qd), k_out.astype(kd)
