"""Parity: DINOv3 ViT encoder vs reference packed torch implementation."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.models import dinov3 as jd3

CFG = jd3.Dinov3Config(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    image_size=64,
    patch_size=16,
    num_register_tokens=4,
)


@pytest.mark.parametrize("gated", [False, True])
def test_dinov3_encoder_parity(rng, gated):
    from modeling.dinov3.configuration_dinov3_vit import DINOv3ViTConfig
    from modeling.dinov3.dinov3_model import DINOv3ViTModel

    cfg = jd3.Dinov3Config(
        **{**CFG.__dict__, "use_gated_mlp": gated}
    )
    hf_cfg = DINOv3ViTConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_act="gelu",
        layer_norm_eps=cfg.layer_norm_eps,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        num_register_tokens=cfg.num_register_tokens,
        layerscale_value=cfg.layerscale_value,
        rope_theta=cfg.rope_theta,
        use_gated_mlp=gated,
        query_bias=cfg.query_bias,
        key_bias=cfg.key_bias,
        value_bias=cfg.value_bias,
        proj_bias=cfg.proj_bias,
        mlp_bias=cfg.mlp_bias,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    model = DINOv3ViTModel(hf_cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.07, 0.07)

    n, h, w = 2, 64, 48  # non-square grid exercises coord normalization
    imgs = rng.standard_normal((n, 3, h, w)).astype(np.float32)
    n_tok = 1 + 4 + (h // 16) * (w // 16)
    cu = (torch.arange(0, n + 1) * n_tok).to(torch.int32)
    with torch.no_grad(), torch_ref.fp32_casts():
        ref = model(
            pixel_values=torch.from_numpy(imgs.copy()),
            cu_seqlens=cu,
            max_seqlen=n_tok,
        ).numpy()

    params = jd3.params_from_torch(model.state_dict(), cfg)
    got = jd3.encode(params, jnp.asarray(imgs), cfg)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)
