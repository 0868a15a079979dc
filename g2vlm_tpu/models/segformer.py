"""SegFormer (mit_b0 + all-MLP head) — frozen ADE20k segmenter used to
predict sky masks (class 2) for the confidence loss.

Behavioral spec: reference modeling/pi3/models/segformer/{backbone.py,
head.py, model.py} (EncoderDecoder.inference_, model.py:120-129; used in
pi3_loss.py:55-65). Inference-only (the reference freezes it).

JAX design: convs via lax.conv_general_dilated (XLA lowers them onto the
MXU), efficient attention with spatial-reduction convs as in MiT, bilinear
upsampling with torch-exact kernels (utils/image.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dense_attention
from ..ops.norms import layer_norm
from ..utils.image import resize_hw


@dataclass(frozen=True)
class SegformerConfig:
    """mit_b0 geometry (reference backbone.py:360-366)."""

    embed_dims: Tuple[int, ...] = (32, 64, 160, 256)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    strides: Tuple[int, ...] = (4, 2, 2, 2)
    decoder_dim: int = 256
    num_classes: int = 150
    sky_class: int = 2


def _conv(x, w, b, stride: int, padding: int, groups: int = 1):
    """x (B, C, H, W), w (O, I/groups, kh, kw) — torch layout."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def _bn(x, p, eps=1e-5):
    scale = p["w"] / jnp.sqrt(p["var"] + eps)
    return x * scale[None, :, None, None] + (
        p["b"] - p["mean"] * scale
    )[None, :, None, None]


def _attention(x, lp, h, w, num_heads, sr_ratio):
    """Efficient self attention (reference backbone.py:60-120)."""
    b, n, c = x.shape
    hd = c // num_heads
    q = (x @ lp["q"]["w"] + lp["q"]["b"]).reshape(b, n, num_heads, hd)
    if sr_ratio > 1:
        xs = x.transpose(0, 2, 1).reshape(b, c, h, w)
        xs = _conv(xs, lp["sr"]["w"], lp["sr"]["b"], sr_ratio, 0)
        xs = xs.reshape(b, c, -1).transpose(0, 2, 1)
        xs = layer_norm(xs, lp["sr_norm"]["w"], lp["sr_norm"]["b"], 1e-5)
    else:
        xs = x
    m = xs.shape[1]
    kv = (xs @ lp["kv"]["w"] + lp["kv"]["b"]).reshape(b, m, 2, num_heads, hd)
    k, v = kv[:, :, 0], kv[:, :, 1]
    out = dense_attention(q, k, v).reshape(b, n, c)
    return out @ lp["proj"]["w"] + lp["proj"]["b"]


def _mix_mlp(x, lp, h, w):
    """Mlp with 3x3 depthwise conv (reference backbone.py:8-58)."""
    b, n, c_in = x.shape
    x = x @ lp["fc1"]["w"] + lp["fc1"]["b"]
    c = x.shape[-1]
    xs = x.transpose(0, 2, 1).reshape(b, c, h, w)
    xs = _conv(xs, lp["dw"]["w"], lp["dw"]["b"], 1, 1, groups=c)
    x = xs.reshape(b, c, n).transpose(0, 2, 1)
    x = jax.nn.gelu(x, approximate=False)
    return x @ lp["fc2"]["w"] + lp["fc2"]["b"]


def forward_features(params, images, cfg: SegformerConfig) -> List[jax.Array]:
    """-> 4 feature maps (B, C_i, H/4..H/32, ...) (reference
    forward_features, backbone.py:315-352)."""
    x = images
    outs = []
    for si in range(4):
        sp = params[f"stage{si}"]
        pad = cfg.patch_sizes[si] // 2
        x = _conv(x, sp["patch"]["w"], sp["patch"]["b"], cfg.strides[si], pad)
        b, c, h, w = x.shape
        x = x.reshape(b, c, h * w).transpose(0, 2, 1)
        x = layer_norm(x, sp["patch_norm"]["w"], sp["patch_norm"]["b"], 1e-5)
        for li in range(cfg.depths[si]):
            lp = sp[f"block{li}"]
            x = x + _attention(
                layer_norm(x, lp["norm1"]["w"], lp["norm1"]["b"], 1e-6),
                lp["attn"], h, w, cfg.num_heads[si], cfg.sr_ratios[si],
            )
            x = x + _mix_mlp(
                layer_norm(x, lp["norm2"]["w"], lp["norm2"]["b"], 1e-6),
                lp["mlp"], h, w,
            )
        x = layer_norm(x, sp["norm"]["w"], sp["norm"]["b"], 1e-6)
        x = x.transpose(0, 2, 1).reshape(b, c, h, w)
        outs.append(x)
    return outs


def seg_logits(params, images, cfg: SegformerConfig) -> jax.Array:
    """-> (B, num_classes, H, W) logits (reference EncoderDecoder.encode_decode
    + SegFormerHead.forward, head.py:691-712)."""
    feats = forward_features(params, images, cfg)
    hp = params["head"]
    c1 = feats[0]
    target_hw = c1.shape[2:]
    ups = []
    for i in [3, 2, 1, 0]:
        f = feats[i]
        b, c, h, w = f.shape
        t = f.reshape(b, c, h * w).transpose(0, 2, 1)
        t = t @ hp[f"linear_c{i + 1}"]["w"] + hp[f"linear_c{i + 1}"]["b"]
        t = t.transpose(0, 2, 1).reshape(b, -1, h, w)
        if (h, w) != target_hw:
            t = resize_hw(t, target_hw, method="bilinear", antialias=False)
        ups.append(t)
    x = jnp.concatenate(ups, axis=1)
    x = _conv(x, hp["fuse"]["w"], None, 1, 0)
    x = jax.nn.relu(_bn(x, hp["fuse_bn"]))
    x = _conv(x, hp["pred"]["w"], hp["pred"]["b"], 1, 0)
    return resize_hw(x, images.shape[2:], method="bilinear", antialias=False)


def predict_sky_mask(params, images, cfg: SegformerConfig = SegformerConfig()):
    """(B, 3, H, W) -> bool sky mask (reference predict_sky_mask,
    pi3_loss.py:62-65: argmax class == 2)."""
    logits = seg_logits(params, images, cfg)
    return jnp.argmax(logits, axis=1) == cfg.sky_class


def params_from_torch(state_dict, cfg: SegformerConfig = SegformerConfig(), prefix: str = "") -> Dict:
    def g(name):
        t = state_dict[prefix + name]
        arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        return jnp.asarray(arr, jnp.float32)

    def lin(name):
        return {"w": g(name + ".weight").T, "b": g(name + ".bias")}

    def conv(name, bias=True):
        p = {"w": g(name + ".weight")}
        p["b"] = g(name + ".bias") if bias else None
        return p

    def norm(name):
        return {"w": g(name + ".weight"), "b": g(name + ".bias")}

    params: Dict = {}
    for si in range(4):
        bb = f"backbone.patch_embed{si + 1}."
        sp = {
            "patch": conv(bb + "proj"),
            "patch_norm": norm(bb + "norm"),
            "norm": norm(f"backbone.norm{si + 1}"),
        }
        for li in range(cfg.depths[si]):
            pre = f"backbone.block{si + 1}.{li}."
            lp = {
                "norm1": norm(pre + "norm1"),
                "attn": {
                    "q": lin(pre + "attn.q"),
                    "kv": lin(pre + "attn.kv"),
                    "proj": lin(pre + "attn.proj"),
                },
                "norm2": norm(pre + "norm2"),
                "mlp": {
                    "fc1": lin(pre + "mlp.fc1"),
                    "dw": conv(pre + "mlp.dwconv.dwconv"),
                    "fc2": lin(pre + "mlp.fc2"),
                },
            }
            if cfg.sr_ratios[si] > 1:
                lp["attn"]["sr"] = conv(pre + "attn.sr")
                lp["attn"]["sr_norm"] = norm(pre + "attn.norm")
            sp[f"block{li}"] = lp
        params[f"stage{si}"] = sp

    head = {}
    for i in range(1, 5):
        head[f"linear_c{i}"] = lin(f"decode_head.linear_c{i}.proj")
    head["fuse"] = conv("decode_head.linear_fuse.conv", bias=False)
    head["fuse_bn"] = {
        "w": g("decode_head.linear_fuse.bn.weight"),
        "b": g("decode_head.linear_fuse.bn.bias"),
        "mean": g("decode_head.linear_fuse.bn.running_mean"),
        "var": g("decode_head.linear_fuse.bn.running_var"),
    }
    head["pred"] = conv("decode_head.linear_pred")
    params["head"] = head
    return params


def init_params(
    key: jax.Array, cfg: SegformerConfig = SegformerConfig()
) -> Dict:
    """Random init with the exact pytree layout of params_from_torch — used
    when training starts without the reference's frozen
    segformer.b0.512x512.ade.160k.pth (pi3_loss.py:55-65); load real weights
    for reference-equivalent sky supervision."""
    keys = iter(jax.random.split(key, 256))

    def lin(din, dout):
        w = jax.random.normal(next(keys), (din, dout), jnp.float32)
        return {"w": w * (din ** -0.5), "b": jnp.zeros((dout,), jnp.float32)}

    def conv(cout, cin, kh, kw, bias=True):
        fan = cin * kh * kw
        p = {
            "w": jax.random.normal(
                next(keys), (cout, cin, kh, kw), jnp.float32
            ) * (fan ** -0.5)
        }
        p["b"] = jnp.zeros((cout,), jnp.float32) if bias else None
        return p

    def norm(d):
        return {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}

    params: Dict = {}
    in_ch = 3
    for si in range(4):
        e = cfg.embed_dims[si]
        p = cfg.patch_sizes[si]
        sp = {
            "patch": conv(e, in_ch, p, p),
            "patch_norm": norm(e),
            "norm": norm(e),
        }
        for li in range(cfg.depths[si]):
            eh = e * cfg.mlp_ratios[si]
            lp = {
                "norm1": norm(e),
                "attn": {"q": lin(e, e), "kv": lin(e, 2 * e), "proj": lin(e, e)},
                "norm2": norm(e),
                "mlp": {
                    "fc1": lin(e, eh),
                    "dw": {
                        "w": jax.random.normal(
                            next(keys), (eh, 1, 3, 3), jnp.float32
                        ) * (9 ** -0.5),
                        "b": jnp.zeros((eh,), jnp.float32),
                    },
                    "fc2": lin(eh, e),
                },
            }
            if cfg.sr_ratios[si] > 1:
                sr = cfg.sr_ratios[si]
                lp["attn"]["sr"] = conv(e, e, sr, sr)
                lp["attn"]["sr_norm"] = norm(e)
            sp[f"block{li}"] = lp
        params[f"stage{si}"] = sp
        in_ch = e

    dd = cfg.decoder_dim
    head = {
        f"linear_c{i + 1}": lin(cfg.embed_dims[i], dd) for i in range(4)
    }
    head["fuse"] = conv(dd, 4 * dd, 1, 1, bias=False)
    head["fuse_bn"] = {
        "w": jnp.ones((dd,), jnp.float32),
        "b": jnp.zeros((dd,), jnp.float32),
        "mean": jnp.zeros((dd,), jnp.float32),
        "var": jnp.ones((dd,), jnp.float32),
    }
    head["pred"] = conv(cfg.num_classes, dd, 1, 1)
    params["head"] = head
    return params
