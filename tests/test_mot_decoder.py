"""Parity: our unified MoT decoder vs the reference Qwen2VLForCausalLM
(modeling/g2vlm/qwen2vl.py) in all three regimes it implements separately:
geo-mode non-causal prefill, und-mode causal prefill with cache, and packed
train forward with mixed per-sample masks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.config import LLMConfig
from g2vlm_tpu.models import mot_decoder as md
from g2vlm_tpu.ops.masks import TokenInfo, make_token_info_np


CFG = LLMConfig(
    vocab_size=128,
    hidden_size=96,
    intermediate_size=80,
    num_hidden_layers=2,
    num_attention_heads=6,
    num_key_value_heads=2,
    mrope_section=(2, 3, 3),
)


def _ref_model():
    from modeling.g2vlm.qwen2vl import Qwen2VLConfig, Qwen2VLForCausalLM

    cfg = Qwen2VLConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta,
        qk_norm=True,
        layer_module="Qwen2VLMoTDecoderLayer",
        attn_implementation="eager",
        rope_scaling={"type": "mrope", "mrope_section": list(CFG.mrope_section)},
    )
    torch.manual_seed(1)
    model = Qwen2VLForCausalLM(cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.08, 0.08)
    # Reference hardcodes mrope_section=[16,24,24] (modeling_qwen2_vl.py:562);
    # shrink it for the tiny head_dim.
    for layer in model.model.layers:
        layer.self_attn.rope_scaling["mrope_section"] = list(CFG.mrope_section)
    return model


@pytest.fixture(scope="module")
def models():
    torch_ref.allow_math_sdpa()
    ref = _ref_model()
    params = md.params_from_torch(ref.state_dict(), CFG)
    return ref, params


def full_info(S, start_pos=0, fn=0):
    return TokenInfo(
        jnp.zeros(S, jnp.int32),
        jnp.full(S, fn, jnp.int32),
        jnp.full(S, -1, jnp.int32),
        jnp.arange(start_pos, start_pos + S, dtype=jnp.int32),
    )


def causal_info(S, start_pos=0):
    return full_info(S, start_pos, fn=-1)


def rand_pos_ids(rng, S):
    return rng.integers(0, 40, (3, S)).astype(np.int64)


def test_geo_prefill_parity(rng, models):
    """Non-causal mixed geo/text prefill, empty cache (the recon hot path,
    reference qwen2vl.py:1267-1337 mode='geo', is_causal=False)."""
    from modeling.g2vlm.qwen2vl import NaiveCache

    ref, params = models
    S = 21
    x = rng.standard_normal((S, CFG.hidden_size)).astype(np.float32)
    pos = rand_pos_ids(rng, S)
    is_geo = rng.random(S) < 0.7
    geo_idx = np.nonzero(is_geo)[0]
    txt_idx = np.nonzero(~is_geo)[0]

    cache = NaiveCache(CFG.num_hidden_layers)
    with torch.no_grad(), torch_ref.fp32_casts():
        out = ref.forward_inference(
            packed_query_sequence=torch.from_numpy(x.copy()),
            query_lens=torch.tensor([S], dtype=torch.int32),
            packed_query_position_ids=torch.from_numpy(pos),
            packed_query_indexes=torch.arange(S),
            past_key_values=cache,
            key_values_lens=torch.tensor([0], dtype=torch.int32),
            packed_key_value_indexes=torch.arange(0),
            update_past_key_values=True,
            is_causal=False,
            mode="geo",
            packed_geo_token_indexes=torch.from_numpy(geo_idx),
            packed_text_indexes=torch.from_numpy(txt_idx),
        )
    ref_hidden = out.packed_query_sequence.numpy()
    ref_k0 = out.past_key_values.key_cache[0].numpy()

    hidden, kv = md.decoder_forward(
        params,
        jnp.asarray(x),
        jnp.asarray(is_geo),
        jnp.asarray(pos),
        q_info=full_info(S),
        kv_info=None,
        past_kv=None,
        cfg=CFG,
        expert_mode=md.MIXED,
    )
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(kv["k"][0]), ref_k0, atol=1e-5, rtol=1e-4)


def test_und_causal_with_cache_parity(rng, models):
    """Causal text prefill against an existing cache (chat path,
    reference mode='und', is_causal=True with merged KV)."""
    from modeling.g2vlm.qwen2vl import NaiveCache

    ref, params = models
    T, S = 9, 5
    x0 = rng.standard_normal((T, CFG.hidden_size)).astype(np.float32)
    x1 = rng.standard_normal((S, CFG.hidden_size)).astype(np.float32)
    pos0 = rand_pos_ids(rng, T)
    pos1 = rand_pos_ids(rng, S)

    cache = NaiveCache(CFG.num_hidden_layers)
    with torch.no_grad(), torch_ref.fp32_casts():
        out0 = ref.forward_inference(
            packed_query_sequence=torch.from_numpy(x0.copy()),
            query_lens=torch.tensor([T], dtype=torch.int32),
            packed_query_position_ids=torch.from_numpy(pos0),
            packed_query_indexes=torch.arange(T),
            past_key_values=cache,
            key_values_lens=torch.tensor([0], dtype=torch.int32),
            packed_key_value_indexes=torch.arange(0),
            update_past_key_values=True,
            is_causal=True,
            mode="und",
        )
        out1 = ref.forward_inference(
            packed_query_sequence=torch.from_numpy(x1.copy()),
            query_lens=torch.tensor([S], dtype=torch.int32),
            packed_query_position_ids=torch.from_numpy(pos1),
            packed_query_indexes=torch.arange(T, T + S),
            past_key_values=out0.past_key_values,
            key_values_lens=torch.tensor([T], dtype=torch.int32),
            packed_key_value_indexes=torch.arange(T),
            update_past_key_values=True,
            is_causal=True,
            mode="und",
        )
    ref_hidden = out1.packed_query_sequence.numpy()

    h0, kv0 = md.decoder_forward(
        params,
        jnp.asarray(x0),
        jnp.zeros(T, bool),
        jnp.asarray(pos0),
        q_info=causal_info(T),
        kv_info=None,
        past_kv=None,
        cfg=CFG,
        expert_mode=md.UND_ONLY,
    )
    h1, _ = md.decoder_forward(
        params,
        jnp.asarray(x1),
        jnp.zeros(S, bool),
        jnp.asarray(pos1),
        q_info=causal_info(S, start_pos=T),
        kv_info=causal_info(T + S),
        past_kv=kv0,
        cfg=CFG,
        expert_mode=md.UND_ONLY,
    )
    np.testing.assert_allclose(np.asarray(h1), ref_hidden, atol=1e-5, rtol=1e-4)


def test_train_forward_parity(rng, models):
    """Packed train forward with per-sample nested masks (reference
    forward_train + prepare_attention_mask_per_sample)."""
    from data.data_utils import prepare_attention_mask_per_sample

    ref, params = models
    sample_lens = [10, 12]
    split_lens = [4, 6, 5, 7]
    attn_modes = ["causal", "full", "causal", "full"]
    S = sum(sample_lens)
    x = rng.standard_normal((S, CFG.hidden_size)).astype(np.float32)
    pos = rand_pos_ids(rng, S)
    # vision splits are geo tokens here
    is_geo = np.zeros(S, bool)
    is_geo[4:10] = True
    is_geo[15:22] = True
    geo_idx = np.nonzero(is_geo)[0]
    und_idx = np.nonzero(~is_geo)[0]

    masks = [
        prepare_attention_mask_per_sample([4, 6], ["causal", "full"]),
        prepare_attention_mask_per_sample([5, 7], ["causal", "full"]),
    ]
    ref.train()
    with torch.no_grad(), torch_ref.fp32_casts():
        out = ref.forward_train(
            packed_sequence=torch.from_numpy(x.copy()),
            sample_lens=sample_lens,
            attention_mask=masks,
            packed_position_ids=torch.from_numpy(pos),
            packed_und_token_indexes=torch.from_numpy(und_idx),
            packed_geo_token_indexes=torch.from_numpy(geo_idx),
        )
    ref.eval()
    ref_hidden = out.packed_query_sequence.numpy()

    info = make_token_info_np(sample_lens, split_lens, attn_modes)
    hidden, _ = md.decoder_forward(
        params,
        jnp.asarray(x),
        jnp.asarray(is_geo),
        jnp.asarray(pos),
        q_info=info,
        kv_info=None,
        past_kv=None,
        cfg=CFG,
        expert_mode=md.MIXED,
    )
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=1e-5, rtol=1e-4)


def test_decode_step_parity(rng, models):
    """Single-token decode against cache == reference generate_text inner step
    (g2vlm.py:1086-1135)."""
    from modeling.g2vlm.qwen2vl import NaiveCache

    ref, params = models
    T = 13
    x0 = rng.standard_normal((T, CFG.hidden_size)).astype(np.float32)
    pos0 = rand_pos_ids(rng, T)
    tok = rng.standard_normal((1, CFG.hidden_size)).astype(np.float32)
    pos1 = np.full((3, 1), 41, dtype=np.int64)

    cache = NaiveCache(CFG.num_hidden_layers)
    with torch.no_grad(), torch_ref.fp32_casts():
        out0 = ref.forward_inference(
            packed_query_sequence=torch.from_numpy(x0.copy()),
            query_lens=torch.tensor([T], dtype=torch.int32),
            packed_query_position_ids=torch.from_numpy(pos0),
            packed_query_indexes=torch.arange(T),
            past_key_values=cache,
            key_values_lens=torch.tensor([0], dtype=torch.int32),
            packed_key_value_indexes=torch.arange(0),
            is_causal=True,
            mode="und",
        )
        out1 = ref.forward_inference(
            packed_query_sequence=torch.from_numpy(tok.copy()),
            query_lens=torch.tensor([1], dtype=torch.int32),
            packed_query_position_ids=torch.from_numpy(pos1),
            packed_query_indexes=torch.tensor([T]),
            past_key_values=out0.past_key_values,
            key_values_lens=torch.tensor([T], dtype=torch.int32),
            packed_key_value_indexes=torch.arange(T),
            is_causal=True,
            mode="und",
        )
        ref_logits = ref.lm_head(out1.packed_query_sequence).numpy()

    h0, kv0 = md.decoder_forward(
        params,
        jnp.asarray(x0),
        jnp.zeros(T, bool),
        jnp.asarray(pos0),
        q_info=causal_info(T),
        kv_info=None,
        past_kv=None,
        cfg=CFG,
        expert_mode=md.UND_ONLY,
    )
    h1, _ = md.decoder_forward(
        params,
        jnp.asarray(tok),
        jnp.zeros(1, bool),
        jnp.asarray(pos1),
        q_info=causal_info(1, start_pos=T),
        kv_info=causal_info(T + 1),
        past_kv=kv0,
        cfg=CFG,
        expert_mode=md.UND_ONLY,
    )
    logits = md.lm_head(params, h1)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-5, rtol=1e-4)


def test_geo_main_matches_mixed(rng, models):
    """GEO_MAIN (geo-everywhere + und fixup) must equal MIXED exactly."""
    ref, params = models
    S = 24
    x = rng.standard_normal((S, CFG.hidden_size)).astype(np.float32)
    pos = rand_pos_ids(rng, S)
    is_geo = np.ones(S, bool)
    und_rows = np.array([0, 5, 13])
    is_geo[und_rows] = False
    info = full_info(S)

    mixed, kv_m = md.decoder_forward(
        params, jnp.asarray(x), jnp.asarray(is_geo), jnp.asarray(pos),
        q_info=info, kv_info=None, past_kv=None, cfg=CFG,
        expert_mode=md.MIXED,
    )
    und_idx = jnp.asarray(np.pad(und_rows, (0, 5)))  # padded with 0s
    geo_main, kv_g = md.decoder_forward(
        params, jnp.asarray(x), jnp.asarray(is_geo), jnp.asarray(pos),
        q_info=info, kv_info=None, past_kv=None, cfg=CFG,
        expert_mode=md.GEO_MAIN, und_fixup_idx=und_idx,
    )
    np.testing.assert_allclose(
        np.asarray(geo_main), np.asarray(mixed), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(kv_g["k"]), np.asarray(kv_m["k"]), atol=2e-5, rtol=1e-4
    )


def test_layer_variant_consistency(rng, models):
    """Dense/MoE-FFN layer variants (reference qwen2vl.py:667-748, 913-1012).

    NB: the reference's OWN dense/MoE inference paths crash upstream —
    PackedAttention.forward_inference applies mRoPE without the (S,H,D) ->
    (H,S,D) transpose the MoT path does (qwen2vl.py:363-373 vs :572-609), so
    golden comparison is impossible; only the shipped MoT path runs. We check
    internal consistency instead: with geo experts tied to the base expert
    and layer scales neutralized, MoT == MoE == dense must hold exactly.
    """
    import dataclasses

    _, params = models
    # tie geo expert weights to the base expert; neutralize layer scales
    from g2vlm_tpu.weights import init_moe_from_dense

    tied = init_moe_from_dense({"llm": params})["llm"]
    layers = dict(tied["layers"])
    layers["ls1"] = jnp.ones_like(layers["ls1"])
    layers["ls2"] = jnp.ones_like(layers["ls2"])
    tied = dict(tied, layers=layers)

    S = 18
    x = rng.standard_normal((S, CFG.hidden_size)).astype(np.float32)
    pos = rand_pos_ids(rng, S)
    is_geo = rng.random(S) < 0.5
    info = full_info(S)

    def run(cfg_variant, expert_mode, p):
        cfg = dataclasses.replace(CFG, layer_module=cfg_variant)
        h, _ = md.decoder_forward(
            p, jnp.asarray(x), jnp.asarray(is_geo), jnp.asarray(pos),
            q_info=info, kv_info=None, past_kv=None, cfg=cfg,
            expert_mode=expert_mode,
        )
        return np.asarray(h)

    mot = run("mot", md.MIXED, tied)
    moe = run("moe", md.MIXED, tied)
    dense = run("dense", md.UND_ONLY, tied)
    np.testing.assert_allclose(mot, moe, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(moe, dense, atol=2e-5, rtol=1e-5)


def test_collect_hidden_states(rng, models):
    """output_hidden_states capability (reference qwen2vl.py:1236-1249)."""
    _, params = models
    S = 10
    x = rng.standard_normal((S, CFG.hidden_size)).astype(np.float32)
    pos = rand_pos_ids(rng, S)
    h, aux = md.decoder_forward(
        params, jnp.asarray(x), jnp.zeros(S, bool), jnp.asarray(pos),
        q_info=causal_info(S), kv_info=None, past_kv=None, cfg=CFG,
        expert_mode=md.UND_ONLY, collect_hidden=True,
    )
    assert aux["hidden_states"].shape == (CFG.num_hidden_layers, S, CFG.hidden_size)
    # the last collected layer is the pre-final-norm hidden
    hn = np.asarray(aux["hidden_states"][-1])
    assert np.isfinite(hn).all()


def test_split_matches_mixed_sorted_layout(rng, models):
    """SPLIT ([und|geo] contiguous slices) == MIXED on the same logical
    sequence, via the packer's sorted_layout permutation."""
    _, params = models
    S = 20
    x_logical = rng.standard_normal((S, CFG.hidden_size)).astype(np.float32)
    pos3 = rand_pos_ids(rng, S)
    is_geo = rng.random(S) < 0.5
    info = full_info(S)

    mixed, _ = md.decoder_forward(
        params, jnp.asarray(x_logical), jnp.asarray(is_geo), jnp.asarray(pos3),
        q_info=info, kv_info=None, past_kv=None, cfg=CFG,
        expert_mode=md.MIXED,
    )

    # sorted physical layout: und first, then geo, metadata permuted
    order = np.argsort(is_geo, kind="stable")
    inv = np.empty(S, np.int64); inv[order] = np.arange(S)
    x_s = x_logical[order]
    pos_s = pos3[:, order]
    info_s = TokenInfo(
        info.doc_id[order], info.fn_id[order], info.noise_id[order],
        info.pos[order],
    )
    geo_start = int((~is_geo).sum())
    split, _ = md.decoder_forward(
        params, jnp.asarray(x_s), jnp.asarray(np.sort(is_geo)),
        jnp.asarray(pos_s), q_info=info_s, kv_info=None, past_kv=None,
        cfg=CFG, expert_mode=md.SPLIT, geo_start=geo_start,
    )
    np.testing.assert_allclose(
        np.asarray(split)[inv], np.asarray(mixed), atol=2e-5, rtol=1e-4
    )
