"""DINOv3 ViT — alternative geometry encoder (patch 16, RoPE pos embedding,
optional gated MLP).

Behavioral spec: reference modeling/dinov3/dinov3_model.py:36-544 (packed
variant) / modeling_dinov3_vit.py (stock), selected via
G2VLMConfig.use_dinov3 (reference g2vlm.py:380-394).

Same TPU-first stance as models/dinov2.py: batched dense attention over
(B, S, D) in place of varlen flash, patch conv as one matmul, per-shape
RoPE tables computed from normalized patch-center coordinates. The training-
time coordinate shift/jitter/rescale augmentations are explicit rng-driven
arguments instead of module-state randomness.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dense_attention
from ..ops.norms import layer_norm


@dataclass(frozen=True)
class Dinov3Config:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    image_size: int = 512
    patch_size: int = 16
    num_channels: int = 3
    num_register_tokens: int = 4
    layerscale_value: float = 1.0
    rope_theta: float = 100.0
    use_gated_mlp: bool = False
    query_bias: bool = True
    key_bias: bool = False
    value_bias: bool = True
    proj_bias: bool = True
    mlp_bias: bool = True
    pos_embed_shift: Optional[float] = None
    pos_embed_jitter: Optional[float] = None
    pos_embed_rescale: Optional[float] = 2.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def patch_center_coords(hp: int, wp: int) -> np.ndarray:
    """(hp*wp, 2) patch-center (y, x) coords in [-1, 1] (reference
    get_patches_center_coordinates, dinov3_model.py:72-97)."""
    ch = (np.arange(0.5, hp, dtype=np.float64) / hp)
    cw = (np.arange(0.5, wp, dtype=np.float64) / wp)
    grid = np.stack(np.meshgrid(ch, cw, indexing="ij"), axis=-1).reshape(-1, 2)
    return (2.0 * grid - 1.0).astype(np.float32)


def augment_coords(
    coords: np.ndarray,
    rng: np.random.Generator,
    shift: Optional[float],
    jitter: Optional[float],
    rescale: Optional[float],
) -> np.ndarray:
    """Training-time coordinate augmentation (reference :100-126)."""
    out = coords.copy()
    if shift is not None:
        out = out + rng.uniform(-shift, shift, (1, 2)).astype(np.float32)
    if jitter is not None:
        jr = np.log(jitter)
        out = out * np.exp(rng.uniform(-jr, jr, (1, 2))).astype(np.float32)
    if rescale is not None:
        rr = np.log(rescale)
        out = out * np.float32(np.exp(rng.uniform(-rr, rr)))
    return out


def rope_cos_sin(
    coords: jax.Array, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """(hw, 2) coords -> cos/sin (hw, head_dim) fp32 (reference :129-176)."""
    inv_freq = 1.0 / theta ** np.arange(0, 1, 4.0 / head_dim, dtype=np.float32)
    ang = 2.0 * math.pi * coords[:, :, None] * jnp.asarray(inv_freq)[None, None]
    ang = ang.reshape(coords.shape[0], -1)
    ang = jnp.tile(ang, (1, 2))
    return jnp.cos(ang), jnp.sin(ang)


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _lin(x, p, dtype):
    y = x.astype(dtype) @ p["w"].astype(dtype)
    if "b" in p:
        y = y + p["b"].astype(dtype)
    return y


def encode(
    params: Dict,
    images: jax.Array,  # (B, C, H, W)
    cfg: Dinov3Config,
    compute_dtype=jnp.float32,
    coord_rng: Optional[np.random.Generator] = None,
    training: bool = False,
    remat: bool = False,
) -> jax.Array:
    """-> patch tokens (B, hp*wp, D), CLS+registers stripped (:539)."""
    b, c, h, w = images.shape
    p = cfg.patch_size
    hp, wp = h // p, w // p
    dt = compute_dtype
    d = cfg.hidden_size
    nh = cfg.num_attention_heads
    hd = cfg.head_dim
    eps = cfg.layer_norm_eps
    n_prefix = 1 + cfg.num_register_tokens

    patches = images.reshape(b, c, hp, p, wp, p)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(b, hp * wp, c * p * p)
    x = _lin(patches, params["patch_embed"], dt)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, d)).astype(dt)
    regs = jnp.broadcast_to(
        params["register_tokens"], (b, cfg.num_register_tokens, d)
    ).astype(dt)
    x = jnp.concatenate([cls, regs, x], axis=1)

    coords = patch_center_coords(hp, wp)
    if training and coord_rng is not None:
        coords = augment_coords(
            coords, coord_rng, cfg.pos_embed_shift, cfg.pos_embed_jitter,
            cfg.pos_embed_rescale,
        )
    cos, sin = rope_cos_sin(jnp.asarray(coords), hd, cfg.rope_theta)
    cos = cos[None, :, None, :]  # (1, hw, 1, hd)
    sin = sin[None, :, None, :]

    def rope(t):  # (B, S, H, hd), patch tokens only
        prefix, pt = t[:, :n_prefix], t[:, n_prefix:]
        ptf = pt.astype(jnp.float32)
        pt = (ptf * cos + _rotate_half(ptf) * sin).astype(t.dtype)
        return jnp.concatenate([prefix, pt], axis=1)

    s = x.shape[1]

    def layer(x, lp):
        hnorm = layer_norm(x, lp["norm1"]["w"], lp["norm1"]["b"], eps)
        q = rope(_lin(hnorm, lp["q"], dt).reshape(b, s, nh, hd))
        k = rope(_lin(hnorm, lp["k"], dt).reshape(b, s, nh, hd))
        v = _lin(hnorm, lp["v"], dt).reshape(b, s, nh, hd)
        attn = dense_attention(q, k, v).reshape(b, s, d)
        x = x + _lin(attn, lp["o"], dt) * lp["ls1"].astype(dt)
        hnorm = layer_norm(x, lp["norm2"]["w"], lp["norm2"]["b"], eps)
        if cfg.use_gated_mlp:
            m = jax.nn.gelu(_lin(hnorm, lp["gate"], dt), approximate=False) * _lin(
                hnorm, lp["up"], dt
            )
        else:
            m = jax.nn.gelu(_lin(hnorm, lp["up"], dt), approximate=False)
        m = _lin(m, lp["down"], dt)
        x = x + m * lp["ls2"].astype(dt)
        return x, None

    if remat:
        layer = jax.checkpoint(layer, prevent_cse=False)
    x, _ = jax.lax.scan(layer, x, params["layers"])
    x = layer_norm(x, params["final_norm"]["w"], params["final_norm"]["b"], eps)
    return x[:, n_prefix:]


def params_from_torch(state_dict, cfg: Dinov3Config, prefix: str = "") -> Dict:
    def g(name):
        t = state_dict[prefix + name]
        arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        return jnp.asarray(arr, jnp.float32)

    def lin(name, bias=True):
        p = {"w": g(name + ".weight").T}
        if bias:
            p["b"] = g(name + ".bias")
        return p

    def norm(name):
        return {"w": g(name + ".weight"), "b": g(name + ".bias")}

    conv_w = g("embeddings.patch_embeddings.weight")  # (D, C, P, P)
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"layer.{i}."
        lp = {
            "norm1": norm(pre + "norm1"),
            "q": lin(pre + "attention.q_proj", cfg.query_bias),
            "k": lin(pre + "attention.k_proj", cfg.key_bias),
            "v": lin(pre + "attention.v_proj", cfg.value_bias),
            "o": lin(pre + "attention.o_proj", cfg.proj_bias),
            "ls1": g(pre + "layer_scale1.lambda1"),
            "norm2": norm(pre + "norm2"),
            "up": lin(pre + "mlp.up_proj", cfg.mlp_bias),
            "down": lin(pre + "mlp.down_proj", cfg.mlp_bias),
            "ls2": g(pre + "layer_scale2.lambda1"),
        }
        if cfg.use_gated_mlp:
            lp["gate"] = lin(pre + "mlp.gate_proj", cfg.mlp_bias)
        layers.append(lp)
    return {
        "cls_token": g("embeddings.cls_token").reshape(-1),
        "register_tokens": g("embeddings.register_tokens").reshape(
            cfg.num_register_tokens, -1
        ),
        "patch_embed": {
            "w": conv_w.reshape(cfg.hidden_size, -1).T,
            "b": g("embeddings.patch_embeddings.bias"),
        },
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": norm("norm"),
    }


def init_params(cfg: Dinov3Config, key: jax.Array, dtype=jnp.float32) -> Dict:
    d = cfg.hidden_size
    inter = cfg.intermediate_size
    L = cfg.num_hidden_layers
    ks = iter(jax.random.split(key, 16))

    def lin(din, dout, bias=True):
        p = {"w": jax.random.normal(next(ks), (L, din, dout), dtype) * (din ** -0.5)}
        if bias:
            p["b"] = jnp.zeros((L, dout), dtype)
        return p

    def norm():
        return {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)}

    layers = {
        "norm1": norm(),
        "q": lin(d, d, cfg.query_bias),
        "k": lin(d, d, cfg.key_bias),
        "v": lin(d, d, cfg.value_bias),
        "o": lin(d, d, cfg.proj_bias),
        "ls1": jnp.full((L, d), cfg.layerscale_value, dtype),
        "norm2": norm(),
        "up": lin(d, inter, cfg.mlp_bias),
        "down": lin(inter, d, cfg.mlp_bias),
        "ls2": jnp.full((L, d), cfg.layerscale_value, dtype),
    }
    if cfg.use_gated_mlp:
        layers["gate"] = lin(d, inter, cfg.mlp_bias)
    pdim = cfg.num_channels * cfg.patch_size ** 2
    return {
        "cls_token": jax.random.normal(next(ks), (d,), dtype) * 0.02,
        "register_tokens": jax.random.normal(
            next(ks), (cfg.num_register_tokens, d), dtype
        ) * 0.02,
        "patch_embed": {
            "w": jax.random.normal(next(ks), (pdim, d), dtype) * 0.02,
            "b": jnp.zeros((d,), dtype),
        },
        "layers": layers,
        "final_norm": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }
