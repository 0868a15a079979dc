"""Parity: our DINOv2-with-registers encoder vs the reference packed torch
implementation (modeling/g2vlm/dinov2_model.py) with identical random weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.config import DinoConfig
from g2vlm_tpu.models import dinov2


def _make_ref_model(cfg: DinoConfig):
    from modeling.dinov2_with_registers.configuration_dinov2_with_registers import (
        Dinov2WithRegistersConfig,
    )
    from modeling.g2vlm.dinov2_model import Dinov2WithRegistersModel

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        mlp_ratio=cfg.mlp_ratio,
        hidden_act=cfg.hidden_act,
        layer_norm_eps=cfg.layer_norm_eps,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        num_register_tokens=cfg.num_register_tokens,
        layerscale_value=cfg.layerscale_value,
        use_swiglu_ffn=cfg.use_swiglu_ffn,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Dinov2WithRegistersModel(hf_cfg).eval()
    # Randomize everything (HF init zeroes some params).
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.05, 0.05)
    return torch_ref.patch_dino_attention_fp32(model)


@pytest.mark.parametrize("hw", [(56, 56), (56, 42)])
def test_dinov2_encoder_parity(rng, hw):
    cfg = DinoConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        num_register_tokens=4,
    )
    model = _make_ref_model(cfg)
    h, w = hw
    n_views = 3
    imgs = rng.standard_normal((n_views, 3, h, w)).astype(np.float32)

    n_patches = (h // 14) * (w // 14)
    cu = torch.arange(0, n_views + 1) * (n_patches + 1 + cfg.num_register_tokens)
    with torch.no_grad():
        ref = model(
            packed_pixel_values=torch.from_numpy(imgs),
            cu_seqlens=cu.to(torch.int32),
            max_seqlen=int(cu[1]),
        ).numpy()

    params = dinov2.params_from_torch(model.state_dict(), cfg)
    got = dinov2.encode(params, jnp.asarray(imgs), cfg)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-5, rtol=1e-4)


def test_dinov2_grouped_remat_equivalence(rng):
    """Grouped sqrt-remat is a scheduling change only: values and grads match
    the plain remat path exactly."""
    cfg = DinoConfig(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        num_register_tokens=4,
    )
    params = dinov2.init_params(cfg, jax.random.PRNGKey(0))
    imgs = jnp.asarray(rng.standard_normal((2, 3, 56, 56)), jnp.float32)

    def loss(p, g):
        out = dinov2.encode(p, imgs, cfg, remat=True, remat_group=g)
        return jnp.sum(out**2)

    v1, g1 = jax.value_and_grad(lambda p: loss(p, 1))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(p, 2))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
