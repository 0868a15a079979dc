"""Parity tests for core ops against the PyTorch reference on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.ops import (
    rms_norm,
    layer_norm,
    mrope_cos_sin,
    apply_mrope,
    rope2d_cos_sin,
    apply_rope2d,
    TokenInfo,
    make_segment_mask,
    segment_attention,
    dense_attention,
)
from g2vlm_tpu.ops.masks import make_token_info_np


def to_t(x):
    return torch.from_numpy(np.asarray(x))


def test_rms_norm_matches_qwen2(rng):
    from modeling.qwen2vl.modeling_qwen2_vl import Qwen2RMSNorm

    x = rng.standard_normal((5, 64)).astype(np.float32)
    m = Qwen2RMSNorm(64, eps=1e-6)
    with torch.no_grad():
        m.weight.copy_(to_t(rng.standard_normal(64).astype(np.float32)))
    ref = m(to_t(x)).detach().numpy()
    got = rms_norm(jnp.asarray(x), jnp.asarray(m.weight.detach().numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((5, 48)).astype(np.float32)
    w = rng.standard_normal(48).astype(np.float32)
    b = rng.standard_normal(48).astype(np.float32)
    ref = torch.nn.functional.layer_norm(
        to_t(x), (48,), to_t(w), to_t(b), eps=1e-6
    ).numpy()
    got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def _ref_mrope(q, k, pos_ids, head_dim, theta, mrope_section):
    """Reference path: Qwen2VLRotaryEmbedding + apply_multimodal_rotary_pos_emb
    with the (S, H, D).transpose(0,1) convention used at inference
    (reference qwen2vl.py:608-618)."""
    from modeling.qwen2vl.modeling_qwen2_vl import apply_multimodal_rotary_pos_emb

    half = head_dim // 2
    inv_freq = 1.0 / (
        theta ** (torch.arange(0, head_dim, 2, dtype=torch.float32) / head_dim)
    )
    pos = to_t(pos_ids).unsqueeze(1).float()  # (3, 1, S)
    inv_freq_expanded = inv_freq[None, None, :, None].expand(3, 1, half, 1)
    freqs = (inv_freq_expanded @ pos[:, :, None, :]).transpose(2, 3)
    emb = torch.cat((freqs, freqs), dim=-1)
    cos, sin = emb.cos(), emb.sin()
    qt = to_t(q).transpose(0, 1)  # (H, S, D)
    kt = to_t(k).transpose(0, 1)
    q_emb, k_emb = apply_multimodal_rotary_pos_emb(
        qt, kt, cos, sin, list(mrope_section), unsqueeze_dim=1
    )
    return q_emb.transpose(0, 1).numpy(), k_emb.transpose(0, 1).numpy()


@pytest.mark.parametrize("head_dim,section", [(128, (16, 24, 24)), (16, (2, 3, 3))])
def test_mrope_matches_reference(rng, head_dim, section):
    S, H, KVH = 11, 4, 2
    theta = 1e6
    q = rng.standard_normal((S, H, head_dim)).astype(np.float32)
    k = rng.standard_normal((S, KVH, head_dim)).astype(np.float32)
    pos = np.stack(
        [
            rng.integers(0, 50, S),
            rng.integers(0, 50, S),
            rng.integers(0, 50, S),
        ]
    ).astype(np.int64)
    ref_q, ref_k = _ref_mrope(q, k, pos, head_dim, theta, section)
    cos, sin = mrope_cos_sin(jnp.asarray(pos), head_dim, theta, section)
    got_q, got_k = apply_mrope(jnp.asarray(q), jnp.asarray(k), cos, sin)
    np.testing.assert_allclose(np.asarray(got_q), ref_q, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_k), ref_k, atol=2e-5, rtol=1e-4)


def test_rope2d_matches_reference(rng):
    from pi3.models.layers.pos_embed import RoPE2D

    B, H, S, D = 2, 3, 12, 32
    tokens = rng.standard_normal((B, H, S, D)).astype(np.float32)
    positions = rng.integers(0, 9, (B, S, 2)).astype(np.int64)
    ref = RoPE2D(freq=100.0)(to_t(tokens), to_t(positions)).numpy()
    cos, sin = rope2d_cos_sin(jnp.asarray(positions), D, freq=100.0)
    got = apply_rope2d(jnp.asarray(tokens), cos, sin)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_segment_mask_matches_reference_train_masks():
    """Our metadata rule == materialized flex sparse mask == dense nested mask."""
    from data.data_utils import create_sparse_mask, prepare_attention_mask_per_sample

    sample_lens = [10, 14]
    split_lens = [4, 6, 3, 5, 6]
    attn_modes = ["causal", "full", "causal", "noise", "causal"]

    info = make_token_info_np(sample_lens, split_lens, attn_modes)
    got = np.asarray(make_segment_mask(info, info))

    mask_mod = create_sparse_mask(sample_lens, split_lens, attn_modes, "cpu")
    S = sum(sample_lens)
    ref = np.zeros((S, S), dtype=bool)
    for qi in range(S):
        for ki in range(S):
            ref[qi, ki] = bool(
                mask_mod(torch.tensor(0), torch.tensor(0), torch.tensor(qi), torch.tensor(ki))
            )
    np.testing.assert_array_equal(got, ref)

    # Dense per-sample masks agree too (within each sample block).
    csum = 0
    split_csum = 0
    for n, slen in enumerate(sample_lens):
        nsplits = []
        modes = []
        acc = 0
        while acc < slen:
            nsplits.append(split_lens[len(modes) + split_csum])
            modes.append(attn_modes[len(modes) + split_csum])
            acc += nsplits[-1]
        split_csum += len(modes)
        dense = prepare_attention_mask_per_sample(nsplits, modes).numpy()
        block = got[csum : csum + slen, csum : csum + slen]
        np.testing.assert_array_equal(block, dense == 0)
        csum += slen


def test_segment_mask_padding():
    info = make_token_info_np([4], [4], ["causal"], pad_to=8)
    m = np.asarray(make_segment_mask(info, info))
    assert m[:4, 4:].sum() == 0 and m[4:, :].sum() == 0


@pytest.mark.parametrize("impl", ["dense", "chunked"])
def test_segment_attention_vs_torch_sdpa(rng, impl):
    """Mixed causal/full packed attention vs torch SDPA with explicit mask."""
    S, H, KVH, D = 33, 6, 2, 16
    sample_lens = [12, 21]
    split_lens = [5, 7, 9, 12]
    attn_modes = ["causal", "full", "full", "causal"]
    q = rng.standard_normal((S, H, D)).astype(np.float32)
    k = rng.standard_normal((S, KVH, D)).astype(np.float32)
    v = rng.standard_normal((S, KVH, D)).astype(np.float32)

    info = make_token_info_np(sample_lens, split_lens, attn_modes)
    got = segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info, impl=impl,
        kv_chunk=8,
    )

    mask = np.asarray(make_segment_mask(info, info))
    kt = to_t(k).repeat_interleave(H // KVH, dim=1)
    vt = to_t(v).repeat_interleave(H // KVH, dim=1)
    ref = (
        torch.nn.functional.scaled_dot_product_attention(
            to_t(q).permute(1, 0, 2),
            kt.permute(1, 0, 2),
            vt.permute(1, 0, 2),
            attn_mask=to_t(mask),
        )
        .permute(1, 0, 2)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", ["dense", "chunked"])
def test_segment_attention_decode_vs_flash_stub(rng, impl):
    """1-token decode against cache == flash_attn_varlen_func(causal=True)."""
    import flash_attn

    S_kv, H, KVH, D = 17, 4, 2, 8
    q = rng.standard_normal((1, H, D)).astype(np.float32)
    k = rng.standard_normal((S_kv, KVH, D)).astype(np.float32)
    v = rng.standard_normal((S_kv, KVH, D)).astype(np.float32)

    ref = flash_attn.flash_attn_varlen_func(
        to_t(q), to_t(k), to_t(v),
        cu_seqlens_q=torch.tensor([0, 1]),
        cu_seqlens_k=torch.tensor([0, S_kv]),
        causal=True,
    ).numpy()

    q_info = TokenInfo(
        jnp.asarray([0]), jnp.asarray([-1]), jnp.asarray([-1]), jnp.asarray([S_kv - 1])
    )
    kv_info = TokenInfo(
        jnp.zeros(S_kv, jnp.int32),
        jnp.full(S_kv, -1, jnp.int32),
        jnp.full(S_kv, -1, jnp.int32),
        jnp.arange(S_kv, dtype=jnp.int32),
    )
    got = segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), q_info, kv_info, impl=impl,
        kv_chunk=8,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_dense_attention_basic(rng):
    B, S, H, D = 2, 7, 3, 8
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    out = dense_attention(q, k, v)
    ref = (
        torch.nn.functional.scaled_dot_product_attention(
            to_t(np.asarray(q)).permute(0, 2, 1, 3),
            to_t(np.asarray(k)).permute(0, 2, 1, 3),
            to_t(np.asarray(v)).permute(0, 2, 1, 3),
        )
        .permute(0, 2, 1, 3)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
