"""DINOv2-with-registers geometry encoder, TPU-native.

Behavioral spec: reference modeling/g2vlm/dinov2_model.py:26-368 +
modeling/dinov2_with_registers/modeling_dinov2_with_registers.py:42-165.

Design differences from the reference (not a port):
  * The reference re-plumbs HF DINOv2 for packed varlen flash attention over
    cu_seqlens; G2VLM always feeds same-sized 518px views, so attention never
    actually crosses image boundaries. We therefore run plain batched dense
    attention over (B, S, D) — the XLA-friendly formulation (all MXU matmuls,
    static shapes, no ragged bookkeeping).
  * Patch "convolution" is a reshape + one big matmul (a stride=kernel conv is
    exactly that), keeping it on the MXU.
  * Position-embedding interpolation reproduces torch's antialiased bicubic
    exactly (utils/image.py) and is folded in per static input shape.

Parameters are a plain pytree (dict); per-layer weights are stacked on a
leading axis and the 24 layers run under one lax.scan.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DinoConfig
from ..ops.attention import dense_attention
from ..ops.norms import layer_norm
from ..utils.image import resize_hw


def init_params(cfg: DinoConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    d = cfg.hidden_size
    p = cfg.patch_size
    n_pos = cfg.num_pos_patches_per_side ** 2
    mlp_hidden = int(d * cfg.mlp_ratio)
    keys = jax.random.split(key, 8)

    def lin(k, din, dout):
        return {
            "w": jax.random.normal(k, (din, dout), dtype) * (din ** -0.5),
            "b": jnp.zeros((dout,), dtype),
        }

    L = cfg.num_hidden_layers

    def stack_lin(k, din, dout):
        return {
            "w": jax.random.normal(k, (L, din, dout), dtype) * (din ** -0.5),
            "b": jnp.zeros((L, dout), dtype),
        }

    lk = jax.random.split(keys[7], 8)
    return {
        "cls_token": jax.random.normal(keys[0], (d,), dtype),
        "mask_token": jnp.zeros((d,), dtype),
        "register_tokens": jnp.zeros((cfg.num_register_tokens, d), dtype),
        "pos_embed": jax.random.normal(keys[1], (n_pos + 1, d), dtype) * 0.02,
        "patch_embed": lin(keys[2], p * p * cfg.num_channels, d),
        "layers": {
            "norm1": {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)},
            "q": stack_lin(lk[0], d, d),
            "k": stack_lin(lk[1], d, d),
            "v": stack_lin(lk[2], d, d),
            "o": stack_lin(lk[3], d, d),
            "ls1": jnp.full((L, d), cfg.layerscale_value, dtype),
            "norm2": {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)},
            "fc1": stack_lin(lk[4], d, mlp_hidden),
            "fc2": stack_lin(lk[5], mlp_hidden, d),
            "ls2": jnp.full((L, d), cfg.layerscale_value, dtype),
        },
        "final_norm": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }


def params_from_torch(state_dict, cfg: DinoConfig, prefix: str = "") -> Dict:
    """Map a reference torch state_dict (HF naming, reference
    dinov2_model.py:277-299) onto our pytree. Accepts numpy or torch tensors."""

    def g(name):
        t = state_dict[prefix + name]
        arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        return jnp.asarray(arr, jnp.float32)

    def lin(name):
        return {"w": g(f"{name}.weight").T, "b": g(f"{name}.bias")}

    d = cfg.hidden_size
    conv_w = g("embeddings.patch_embeddings.projection.weight")  # (D, C, P, P)
    # Our patch vectors are flattened (C, pi, pj) to match conv semantics.
    patch_w = conv_w.reshape(d, -1).T

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}."
        layers.append(
            {
                "norm1": {"w": g(pre + "norm1.weight"), "b": g(pre + "norm1.bias")},
                "q": lin(pre + "attention.attention.query"),
                "k": lin(pre + "attention.attention.key"),
                "v": lin(pre + "attention.attention.value"),
                "o": lin(pre + "attention.output.dense"),
                "ls1": g(pre + "layer_scale1.lambda1"),
                "norm2": {"w": g(pre + "norm2.weight"), "b": g(pre + "norm2.bias")},
                "fc1": lin(pre + "mlp.fc1"),
                "fc2": lin(pre + "mlp.fc2"),
                "ls2": g(pre + "layer_scale2.lambda1"),
            }
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "cls_token": g("embeddings.cls_token").reshape(-1),
        "mask_token": g("embeddings.mask_token").reshape(-1),
        "register_tokens": g("embeddings.register_tokens").reshape(
            cfg.num_register_tokens, -1
        ),
        "pos_embed": g("embeddings.position_embeddings").reshape(-1, d),
        "patch_embed": {
            "w": patch_w,
            "b": g("embeddings.patch_embeddings.projection.bias"),
        },
        "layers": stacked,
        "final_norm": {"w": g("layernorm.weight"), "b": g("layernorm.bias")},
    }


def interpolated_pos_embed(
    pos_embed: jax.Array, cfg: DinoConfig, hp: int, wp: int
) -> jax.Array:
    """CLS pos + bicubic-antialias-interpolated patch grid (reference
    modeling_dinov2_with_registers.py:93-162). Static per (hp, wp)."""
    n = cfg.num_pos_patches_per_side
    cls_pos = pos_embed[:1]
    patch_pos = pos_embed[1:]
    if (hp, wp) != (n, n):
        grid = patch_pos.reshape(n, n, -1).transpose(2, 0, 1)  # (D, n, n)
        grid = resize_hw(grid, (hp, wp), method="bicubic", antialias=True)
        patch_pos = grid.transpose(1, 2, 0).reshape(hp * wp, -1)
    return jnp.concatenate([cls_pos, patch_pos], axis=0)


def embed(params: Dict, images: jax.Array, cfg: DinoConfig) -> jax.Array:
    """images (B, C, H, W) float, already RESNET-normalized → (B, S, D) with
    S = 1 + num_registers + hp*wp."""
    b, c, h, w = images.shape
    p = cfg.patch_size
    hp, wp = h // p, w // p
    patches = images.reshape(b, c, hp, p, wp, p)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(b, hp * wp, c * p * p)
    x = patches @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + interpolated_pos_embed(params["pos_embed"], cfg, hp, wp)[None]
    regs = jnp.broadcast_to(
        params["register_tokens"], (b,) + params["register_tokens"].shape
    )
    return jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)


def encode(
    params: Dict,
    images: jax.Array,  # (B, C, H, W), RESNET-normalized
    cfg: DinoConfig,
    compute_dtype=jnp.float32,
    remat: bool = False,
    remat_group: int = 1,
) -> jax.Array:
    """Full encoder; returns patch tokens only (B, hp*wp, D), CLS+registers
    stripped (reference dinov2_model.py:354)."""
    x = embed(params, images, cfg).astype(compute_dtype)
    b, s_real, d = x.shape
    # Run the WHOLE encoder at an 8-multiple row count (782 -> 784 for a
    # 518x294 view): odd row counts make XLA thread (8,128)-tile relayout
    # copies between every GEMM/residual/attention. Pad once, mask the pad
    # keys in attention, slice once at the end — pad-row garbage (layer_norm
    # of zeros = bias) never escapes its own rows.
    s = -(-s_real // 8) * 8
    valid_kv = s_real if s != s_real else None
    if valid_kv is not None:
        x = jnp.pad(x, ((0, 0), (0, s - s_real), (0, 0)))
    nh = cfg.num_attention_heads
    hd = cfg.head_dim
    eps = cfg.layer_norm_eps

    # Per-view attention, two formulations of the same math:
    #  * dense (B, S, S) batched — CPU / small inputs;
    #  * Pallas batched flash (ops/flash_attention.flash_batched_attention)
    #    on TPU — the dense path's fp32 logit tensors are the dino encoder's
    #    HBM bottleneck at many views; the kernel never materializes them.
    use_flash = jax.default_backend() == "tpu" and b * s * s >= 64 * 512 * 512
    if use_flash:
        from ..ops.flash_attention import flash_batched_attention

    def lin(x, p):
        return x @ p["w"].astype(compute_dtype) + p["b"].astype(compute_dtype)

    def layer(x, lp):
        h1 = layer_norm(x, lp["norm1"]["w"], lp["norm1"]["b"], eps)
        q = lin(h1, lp["q"]).reshape(b, s, nh, hd)
        k = lin(h1, lp["k"]).reshape(b, s, nh, hd)
        v = lin(h1, lp["v"]).reshape(b, s, nh, hd)
        if use_flash:
            attn = flash_batched_attention(q, k, v, valid_kv=valid_kv)
        elif valid_kv is not None:
            mask = jnp.arange(s) < valid_kv
            attn = dense_attention(q, k, v, mask=mask[None, None, None, :])
        else:
            attn = dense_attention(q, k, v)
        attn = lin(attn.reshape(b, s, d), lp["o"])
        x = x + attn * lp["ls1"].astype(compute_dtype)
        h2 = layer_norm(x, lp["norm2"]["w"], lp["norm2"]["b"], eps)
        h2 = lin(h2, lp["fc1"])
        h2 = jax.nn.gelu(h2, approximate=False)
        h2 = lin(h2, lp["fc2"])
        x = x + h2 * lp["ls2"].astype(compute_dtype)
        return x, None

    if remat:
        # training: recompute each layer in the bwd instead of saving its
        # attention/MLP intermediates (24 layers x 40 views of fp32 score
        # chunks otherwise dominate HBM at full train scale)
        layer = jax.checkpoint(layer, prevent_cse=False)
    if remat and remat_group > 1:
        # sqrt-remat over layer groups (same scheme as the MoT scan,
        # mot_decoder.decoder_forward): the scan bwd saves one (B, S, D)
        # carry per GROUP instead of per layer — 24 x 25.7MB -> ~10 x at
        # group 4 for a 16-view 518x294 batch — at one extra fwd recompute
        # of each group during bwd.
        n_layers = jax.tree.leaves(params["layers"])[0].shape[0]
        assert n_layers % remat_group == 0, (n_layers, remat_group)
        glayers = jax.tree.map(
            lambda a: a.reshape(
                n_layers // remat_group, remat_group, *a.shape[1:]
            ),
            params["layers"],
        )

        def gstep(c, glp):
            h2, _ = jax.lax.scan(layer, c, glp)
            return h2, None

        gstep = jax.checkpoint(gstep, prevent_cse=False)
        x, _ = jax.lax.scan(gstep, x, glayers)
    else:
        x, _ = jax.lax.scan(layer, x, params["layers"])
    x = layer_norm(x, params["final_norm"]["w"], params["final_norm"]["b"], eps)
    return x[:, 1 + cfg.num_register_tokens : s_real]
