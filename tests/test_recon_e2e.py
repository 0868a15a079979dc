"""End-to-end parity for the multi-view reconstruction slice: our single
packed forward vs the reference's three-phase cache-update pipeline
(G2VLM.recon: forward_cache_update_text -> forward_cache_update_dino ->
reconstruct, reference g2vlm.py:1240-1303)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.config import tiny_test_config
from g2vlm_tpu.models import g2vlm as jg

CFG = tiny_test_config()
BOS, SOI, EOI = 7, 11, 12
PROMPT_IDS = [23, 45, 67, 89, 101]  # fake "Reconstruct the 3D scene." encoding
N_VIEWS = 2
H = W = 56  # 4x4 dino grid at patch 14


def _ref_g2vlm():
    from modeling.g2vlm.qwen2vl import Qwen2VLConfig, Qwen2VLForCausalLM
    from modeling.dinov2_with_registers.configuration_dinov2_with_registers import (
        Dinov2WithRegistersConfig,
    )
    from modeling.g2vlm.dinov2_model import Dinov2WithRegistersModel
    from modeling.g2vlm.g2vlm import G2VLM, G2VLMConfig

    torch_ref.allow_math_sdpa()

    llm_cfg = Qwen2VLConfig(
        vocab_size=CFG.llm.vocab_size,
        hidden_size=CFG.llm.hidden_size,
        intermediate_size=CFG.llm.intermediate_size,
        num_hidden_layers=CFG.llm.num_hidden_layers,
        num_attention_heads=CFG.llm.num_attention_heads,
        num_key_value_heads=CFG.llm.num_key_value_heads,
        qk_norm=True,
        layer_module="Qwen2VLMoTDecoderLayer",
        attn_implementation="eager",
        rope_scaling={"type": "mrope", "mrope_section": list(CFG.llm.mrope_section)},
    )
    dino_cfg = Dinov2WithRegistersConfig(
        hidden_size=CFG.dino.hidden_size,
        num_hidden_layers=CFG.dino.num_hidden_layers,
        num_attention_heads=CFG.dino.num_attention_heads,
        image_size=CFG.dino.image_size,
        patch_size=CFG.dino.patch_size,
        num_register_tokens=CFG.dino.num_register_tokens,
        attn_implementation="eager",
    )
    g2_cfg = G2VLMConfig(
        visual_und=False,
        visual_recon=True,
        llm_config=llm_cfg,
        vit_config=None,
        dino_config=dino_cfg,
    )
    torch.manual_seed(3)
    llm = Qwen2VLForCausalLM(llm_cfg)
    dino = Dinov2WithRegistersModel(dino_cfg)
    for layer in llm.model.layers:
        layer.self_attn.rope_scaling["mrope_section"] = list(CFG.llm.mrope_section)
    model = G2VLM(llm, None, dino, g2_cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.06, 0.06)
    torch_ref.patch_dino_attention_fp32(model)
    return model


def _run_reference(model, images_norm):
    """Drive the reference recon pipeline with pre-tokenized inputs."""
    from modeling.g2vlm.qwen2vl import NaiveCache

    n, _, h, w = images_norm.shape
    hp, wp = h // 14, w // 14
    hw = hp * wp
    text_ids = [BOS] + PROMPT_IDS
    T = len(text_ids)

    cache = NaiveCache(CFG.llm.num_hidden_layers)
    with torch.no_grad(), torch_ref.fp32_casts():
        cache = model.forward_cache_update_text(
            cache,
            packed_text_ids=torch.tensor(text_ids),
            packed_text_position_ids=torch.arange(T).expand(3, -1),
            text_token_lens=torch.tensor([T], dtype=torch.int32),
            packed_text_indexes=torch.arange(T),
            packed_key_value_indexes=torch.arange(0),
            key_values_lens=torch.tensor([0], dtype=torch.int32),
        )

        # dino phase metadata (mirrors prepare_dino_images_pi3, g2vlm.py:868-966)
        ptext_ids, ptext_idx, pdino_idx, ppos, pidx = [], [], [], [], []
        curr = 0
        rope = T
        for _ in range(n):
            ptext_ids.append(SOI)
            ptext_idx.append(curr)
            pidx.append(T + curr)
            ppos.append(torch.full((3, 1), rope))
            curr += 1
            rope += 1
            t_i = torch.zeros(hw, dtype=torch.long)
            h_i = torch.arange(hp).repeat_interleave(wp)
            w_i = torch.arange(wp).repeat(hp)
            ppos.append(torch.stack([t_i, h_i, w_i]) + rope)
            pdino_idx.extend(range(curr, curr + hw))
            pidx.extend(range(T + curr, T + curr + hw))
            curr += hw
            rope += max(hp, wp)
            ptext_ids.append(EOI)
            ptext_idx.append(curr)
            pidx.append(T + curr)
            ppos.append(torch.full((3, 1), rope))
            curr += 1
            rope += 1

        gen = dict(
            packed_text_ids=torch.tensor(ptext_ids),
            packed_text_indexes=torch.tensor(ptext_idx),
            packed_dino_token_indexes=torch.tensor(pdino_idx),
            dino_token_seqlens=torch.tensor([hw] * n, dtype=torch.int32),
            packed_position_ids=torch.cat(ppos, dim=1),
            packed_seqlens=torch.tensor([curr], dtype=torch.int32),
            packed_indexes=torch.tensor(pidx),
            packed_key_value_indexes=torch.arange(T),
            key_values_lens=torch.tensor([T], dtype=torch.int32),
            packed_dino_images=torch.from_numpy(images_norm.copy()),
            original_images=torch.from_numpy(images_norm.copy()),
        )
        cache, last_hidden = model.forward_cache_update_dino(cache, **gen)
        pred = model.reconstruct(
            past_key_values=cache,
            packed_key_value_indexes=gen["packed_indexes"],
            key_values_lens=gen["key_values_lens"],
            selected_hidden_states=last_hidden,
            packed_dino_token_indexes=gen["packed_dino_token_indexes"],
            packed_dino_images=gen["packed_dino_images"],
            original_images=gen["packed_dino_images"],
        )
    return {
        k: v.numpy().squeeze(0)
        for k, v in pred.items()
        if k in ("points", "local_points", "camera_poses", "global_points")
        and v is not None
    }


def test_recon_end_to_end_parity(rng):
    model = _ref_g2vlm()
    images = rng.standard_normal((N_VIEWS, 3, H, W)).astype(np.float32) * 0.3

    ref = _run_reference(model, images)

    params = jg.params_from_torch(model.state_dict(), CFG)
    builder = jg.SequenceBuilder(SOI, EOI)
    builder.add_text([BOS] + PROMPT_IDS)
    builder.add_dino_images(N_VIEWS, H // 14, W // 14)
    prefill = builder.build()

    got = jg.recon_forward(params, prefill, jnp.asarray(images), CFG)

    # `points` is a derived product (pose @ exp(z)-scaled local points) that
    # amplifies fp32 association noise; the north-star tolerance is 1e-3.
    tols = {"local_points": 2e-4, "camera_poses": 2e-4, "global_points": 2e-4,
            "points": 1e-3}
    for key, atol in tols.items():
        np.testing.assert_allclose(
            np.asarray(got[key]),
            ref[key],
            atol=atol,
            rtol=1e-3,
            err_msg=key,
        )


def test_key_audit_exact_catches_renamed_key():
    """audit_keys is an exact consumed-key inventory: a clean reference
    state_dict audits empty; renaming ONE key (same prefix, so a prefix
    audit would pass) reports it both as missing and as unknown."""
    from g2vlm_tpu.weights import audit_keys

    model = _ref_g2vlm()
    sd = dict(model.state_dict())
    report = audit_keys(sd, CFG)
    assert report["unknown"] == [], report["unknown"][:10]
    assert report["missing"] == []

    bad = dict(sd)
    val = bad.pop("language_model.model.layers.0.ls1.gamma")
    bad["language_model.model.layers.0.ls1.weight"] = val
    report = audit_keys(bad, CFG)
    assert any("ls1.gamma" in m for m in report["missing"]), report
    assert "language_model.model.layers.0.ls1.weight" in report["unknown"]
