"""Qwen2-VL vision tower (semantic encoder), TPU-native.

Behavioral spec: reference modeling/qwen2vl/modeling_qwen2_vl.py:249-302
(PatchEmbed / VisionRotaryEmbedding / PatchMerger), :316-483 (attention +
blocks), :987-1072 (Qwen2VisionTransformerPretrainedModel).

Design notes:
  * The Conv3d patch embed with kernel==stride is a single matmul over the
    image processor's flattened patch rows — no conv needed.
  * Attention is dense per temporal frame: tokens are reshaped to
    (t, h*w, D) and batched, replacing the varlen/cu_seqlens plumbing (each
    frame is its own attention segment in the reference, :1054-1062).
  * Rotary (h, w) coords follow the merge-permuted token order (:1019-1046),
    so the 2x2 PatchMerger (:289-302) is a plain reshape of consecutive 4.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VitConfig
from ..ops.attention import dense_attention, segment_attention
from ..ops.masks import TokenInfo
from ..ops.norms import layer_norm
from ..ops.rope import apply_vision_rope, vision_rope_cos_sin


def _lin(x, p, dtype):
    y = x.astype(dtype) @ p["w"].astype(dtype)
    if "b" in p:
        y = y + p["b"].astype(dtype)
    return y


def _act(x, name: str):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "silu":
        return jax.nn.silu(x)
    raise ValueError(name)


def merge_permuted_hw_coords(grid_thw: Tuple[int, int, int]) -> np.ndarray:
    """(h, w) coords per token in the image-processor's merge-grouped order
    (reference rot_pos_emb, :1019-1046)."""
    t, h, w = grid_thw
    m = 2  # spatial_merge_size
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

    def perm(x):
        return (
            x.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        )

    coords = np.stack([perm(hpos), perm(wpos)], axis=-1)  # (h*w, 2)
    return np.tile(coords, (t, 1))


def encode(
    params: Dict,
    patches: jax.Array,  # (S, C*tps*ps*ps) flattened patch rows
    grid_thw: Tuple[int, int, int],
    cfg: VitConfig,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """-> (S // merge^2, hidden_size) merged image tokens."""
    t, h, w = grid_thw
    s = t * h * w
    dt = compute_dtype
    d = cfg.embed_dim
    nh = cfg.num_heads
    hd = cfg.head_dim

    x = _lin(patches, params["patch_embed"], dt)  # (S, D) — no bias in conv

    coords = jnp.asarray(merge_permuted_hw_coords(grid_thw))
    cos, sin = vision_rope_cos_sin(coords, hd)

    def block(x, lp):
        hnorm = layer_norm(x, lp["norm1"]["w"], lp["norm1"]["b"], 1e-6)
        qkv = _lin(hnorm, lp["qkv"], dt).reshape(s, 3, nh, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q, k = apply_vision_rope(q, k, cos, sin)
        # dense attention per temporal frame
        qf = q.reshape(t, h * w, nh, hd)
        kf = k.reshape(t, h * w, nh, hd)
        vf = v.reshape(t, h * w, nh, hd)
        attn = dense_attention(qf, kf, vf).reshape(s, d)
        x = x + _lin(attn, lp["proj"], dt)
        hnorm = layer_norm(x, lp["norm2"]["w"], lp["norm2"]["b"], 1e-6)
        m = _lin(hnorm, lp["fc1"], dt)
        m = _act(m, cfg.hidden_act)
        x = x + _lin(m, lp["fc2"], dt)
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])

    # PatchMerger: LN then group 4 consecutive tokens (one 2x2 block)
    mp = params["merger"]
    x = layer_norm(x, mp["ln_q"]["w"], mp["ln_q"]["b"], 1e-6)
    x = x.reshape(s // 4, 4 * d)
    x = _lin(x, mp["fc1"], dt)
    x = jax.nn.gelu(x, approximate=False)
    x = _lin(x, mp["fc2"], dt)
    return x


def encode_packed(
    params: Dict,
    patches: jax.Array,  # (P, pdim) rows from several images, concatenated
    coords: jax.Array,  # (P, 2) merge-permuted (h, w) rope coords
    seg_id: jax.Array,  # (P,) image index per token; -1 = padding
    cfg: VitConfig,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
    row_chunks: int = 1,
    remat: bool = False,
) -> jax.Array:
    """Packed multi-image encode for training: arbitrary per-image grids in
    one static-shape program (the reference feeds variable grids through
    flash-attn cu_seqlens, modeling_qwen2_vl.py:1048-1072; here each image is
    an attention segment). Returns (P//4, hidden_size) merged tokens in image
    order; rows from padding segments are garbage — callers drop them via
    out-of-bounds scatter indices.

    row_chunks > 1 runs the WHOLE tower on P/row_chunks-row slices under
    lax.map — images never attend across each other, so any image-aligned
    row split is exact while live activations shrink by the chunk factor
    (a 32-image 768px chat prefill otherwise keeps ~93k-row MLP buffers in
    the temp arena, which doesn't fit next to the resident params). Callers
    must pick boundaries that don't split a segment (see
    packed_row_chunks)."""
    if row_chunks > 1:
        p_tot = patches.shape[0]
        assert p_tot % row_chunks == 0, (p_tot, row_chunks)
        rpc = p_tot // row_chunks

        def one(args):
            return encode_packed(
                params, args[0], args[1], args[2], cfg, compute_dtype,
                attn_impl=attn_impl, remat=remat,
            )

        out = jax.lax.map(
            one,
            (
                patches.reshape(row_chunks, rpc, patches.shape[1]),
                coords.reshape(row_chunks, rpc, 2),
                seg_id.reshape(row_chunks, rpc),
            ),
        )
        return out.reshape(p_tot // 4, out.shape[-1])

    p_tot = patches.shape[0]
    dt = compute_dtype
    d, nh, hd = cfg.embed_dim, cfg.num_heads, cfg.head_dim

    x = _lin(patches, params["patch_embed"], dt)
    cos, sin = vision_rope_cos_sin(coords, hd)
    seg = seg_id.astype(jnp.int32)
    # full bidirectional attention within each image, none across
    info = TokenInfo(seg, seg, jnp.full_like(seg, -1), jnp.arange(p_tot, dtype=jnp.int32))

    def block(x, lp):
        hnorm = layer_norm(x, lp["norm1"]["w"], lp["norm1"]["b"], 1e-6)
        qkv = _lin(hnorm, lp["qkv"], dt).reshape(p_tot, 3, nh, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q, k = apply_vision_rope(q, k, cos, sin)
        attn = segment_attention(
            q.astype(dt), k.astype(dt), v.astype(dt), info, info, impl=attn_impl
        )
        x = x + _lin(attn.reshape(p_tot, d), lp["proj"], dt)
        hnorm = layer_norm(x, lp["norm2"]["w"], lp["norm2"]["b"], 1e-6)
        m = _act(_lin(hnorm, lp["fc1"], dt), cfg.hidden_act)
        x = x + _lin(m, lp["fc2"], dt)
        return x, None

    if remat:
        # training: a 32-layer tower saving fp32 score chunks per layer is
        # the single largest buffer at full train scale (24.5 GB) — recompute
        block = jax.checkpoint(block, prevent_cse=False)
    x, _ = jax.lax.scan(block, x, params["blocks"])

    mp = params["merger"]
    x = layer_norm(x, mp["ln_q"]["w"], mp["ln_q"]["b"], 1e-6)
    x = x.reshape(p_tot // 4, 4 * d)
    x = _lin(x, mp["fc1"], dt)
    x = jax.nn.gelu(x, approximate=False)
    return _lin(x, mp["fc2"], dt)


def packed_row_chunks(seg_id, max_rows: int = 16384) -> int:
    """Largest valid lax.map chunking of a packed layout: the smallest chunk
    count whose equal row slices are <= max_rows, never split a segment, and
    keep the 4-row merge groups whole. 1 (no chunking) when the layout
    already fits or no clean split exists. Host-side (concrete seg only)."""
    seg = np.asarray(seg_id)
    p = len(seg)
    if p <= max_rows:
        return 1
    for c in (2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64):
        if p % c:
            continue
        rpc = p // c
        if rpc > max_rows or rpc % 4:
            continue
        bounds = np.arange(1, c) * rpc
        if all(seg[b - 1] != seg[b] or seg[b] < 0 for b in bounds):
            return c
    return 1


def pack_views(views, pad_to: int = 0, patch_dim: int = 1176):
    """Host-side packing of [{'patches', 'grid_thw'}, ...] into the
    encode_packed inputs: (patches (P, pdim), coords (P, 2), seg_id (P,),
    n_merged_real). P = pad_to if given (padding rows get seg_id=-1)."""
    if views:
        pats = np.concatenate([np.asarray(v["patches"], np.float32) for v in views])
        coords = np.concatenate(
            [merge_permuted_hw_coords(tuple(v["grid_thw"])) for v in views]
        )
        seg = np.concatenate(
            [
                np.full(int(np.prod(v["grid_thw"])), i, np.int32)
                for i, v in enumerate(views)
            ]
        )
        patch_dim = pats.shape[1]
    else:
        pats = np.zeros((0, patch_dim), np.float32)
        coords = np.zeros((0, 2), np.int64)
        seg = np.zeros((0,), np.int32)
    n = pats.shape[0]
    if pad_to:
        assert n <= pad_to, (n, pad_to)
        pats = np.concatenate([pats, np.zeros((pad_to - n, pats.shape[1]), np.float32)])
        coords = np.concatenate([coords, np.zeros((pad_to - n, 2), coords.dtype)])
        seg = np.concatenate([seg, np.full(pad_to - n, -1, np.int32)])
    return pats, coords, seg, n // 4


def init_params(cfg: VitConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    d = cfg.embed_dim
    pdim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    mlp_hidden = int(d * cfg.mlp_ratio)
    merge_dim = d * cfg.spatial_merge_size ** 2
    L = cfg.depth
    ks = iter(jax.random.split(key, 16))

    def lin(din, dout, stacked=True, bias=True):
        shape = (L, din, dout) if stacked else (din, dout)
        p = {"w": jax.random.normal(next(ks), shape, dtype) * (din ** -0.5)}
        if bias:
            p["b"] = jnp.zeros(shape[:-2] + (dout,), dtype)
        return p

    def norm(stacked=True):
        shape = (L, d) if stacked else None
        return {
            "w": jnp.ones(shape or (d,), dtype),
            "b": jnp.zeros(shape or (d,), dtype),
        }

    return {
        "patch_embed": {"w": jax.random.normal(next(ks), (pdim, d), dtype) * 0.02},
        "blocks": {
            "norm1": norm(),
            "qkv": lin(d, 3 * d),
            "proj": lin(d, d),
            "norm2": norm(),
            "fc1": lin(d, mlp_hidden),
            "fc2": lin(mlp_hidden, d),
        },
        "merger": {
            "ln_q": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
            "fc1": lin(merge_dim, merge_dim, stacked=False),
            "fc2": lin(merge_dim, cfg.hidden_size, stacked=False),
        },
    }


def params_from_torch(state_dict, cfg: VitConfig, prefix: str = "") -> Dict:
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

    blocks = []
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        blocks.append(
            {
                "norm1": norm(pre + "norm1"),
                "qkv": lin(pre + "attn.qkv"),
                "proj": lin(pre + "attn.proj"),
                "norm2": norm(pre + "norm2"),
                "fc1": lin(pre + "mlp.fc1"),
                "fc2": lin(pre + "mlp.fc2"),
            }
        )
    conv_w = g("patch_embed.proj.weight")  # (D, C, tps, ps, ps)
    return {
        "patch_embed": {"w": conv_w.reshape(cfg.embed_dim, -1).T},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "merger": {
            "ln_q": norm("merger.ln_q"),
            "fc1": lin("merger.mlp.0"),
            "fc2": lin("merger.mlp.2"),
        },
    }
