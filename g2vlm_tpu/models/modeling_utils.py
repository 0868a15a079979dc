"""Misc modeling utilities.

Behavioral spec: reference modeling/g2vlm/modeling_utils.py:24-163 — DiT-style
2D sincos position-embedding tables, timestep embedder, MLP connector
(present in the reference's FSDP wrap policy; the connector is unused by the
shipped G2VLM config but kept for capability parity)."""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def get_1d_sincos_pos_embed(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid_size^2, embed_dim) table (reference modeling_utils.py / the MAE
    recipe pos_embed.py:22-48)."""
    gh = np.arange(grid_size, dtype=np.float64)
    gw = np.arange(grid_size, dtype=np.float64)
    grid = np.stack(np.meshgrid(gw, gh), axis=0).reshape(2, -1)
    emb_h = get_1d_sincos_pos_embed(embed_dim // 2, grid[1])
    emb_w = get_1d_sincos_pos_embed(embed_dim // 2, grid[0])
    return np.concatenate([emb_h, emb_w], axis=1)


def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal timestep features (reference TimestepEmbedder.timestep_embedding)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def timestep_embedder(params: Dict, t: jax.Array, freq_dim: int = 256) -> jax.Array:
    """MLP over sinusoidal features (reference TimestepEmbedder: Linear ->
    SiLU -> Linear)."""
    h = timestep_embedding(t, freq_dim)
    h = h @ params["fc1"]["w"] + params["fc1"]["b"]
    h = jax.nn.silu(h)
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


def mlp_connector(params: Dict, x: jax.Array) -> jax.Array:
    """2-layer GELU connector (reference MLPconnector)."""
    h = x @ params["fc1"]["w"] + params["fc1"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


def init_timestep_embedder(key, hidden: int, freq_dim: int = 256, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": {
            "w": jax.random.normal(k1, (freq_dim, hidden), dtype) * 0.02,
            "b": jnp.zeros((hidden,), dtype),
        },
        "fc2": {
            "w": jax.random.normal(k2, (hidden, hidden), dtype) * 0.02,
            "b": jnp.zeros((hidden,), dtype),
        },
    }


def init_mlp_connector(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": {
            "w": jax.random.normal(k1, (in_dim, out_dim), dtype) * (in_dim ** -0.5),
            "b": jnp.zeros((out_dim,), dtype),
        },
        "fc2": {
            "w": jax.random.normal(k2, (out_dim, out_dim), dtype) * (out_dim ** -0.5),
            "b": jnp.zeros((out_dim,), dtype),
        },
    }
