"""Parity: Qwen2-VL vision tower vs the reference torch implementation."""

import numpy as np
import jax.numpy as jnp
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.config import VitConfig
from g2vlm_tpu.data.vit_preprocess import smart_resize, tile_patches
from g2vlm_tpu.models import qwen_vit

CFG = VitConfig(depth=2, embed_dim=64, hidden_size=96, num_heads=4)


def _ref_model():
    from modeling.qwen2vl.configuration_qwen2_vl import Qwen2VLVisionConfig
    from modeling.qwen2vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel,
    )

    cfg = Qwen2VLVisionConfig(
        depth=CFG.depth,
        embed_dim=CFG.embed_dim,
        hidden_size=CFG.hidden_size,
        hidden_act=CFG.hidden_act,
        mlp_ratio=CFG.mlp_ratio,
        num_heads=CFG.num_heads,
        in_channels=3,
        patch_size=CFG.patch_size,
        spatial_merge_size=2,
        temporal_patch_size=2,
        attn_implementation="eager",
    )
    torch.manual_seed(5)
    model = Qwen2VisionTransformerPretrainedModel(cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.07, 0.07)
    return model


def test_vit_encoder_parity(rng):
    model = _ref_model()
    img = rng.standard_normal((3, 56, 84)).astype(np.float32)  # 4x6 grid
    patches, grid = tile_patches(img)
    assert grid == (1, 4, 6)

    with torch.no_grad(), torch_ref.fp32_casts():
        ref = model(
            torch.from_numpy(patches.copy()),
            grid_thw=torch.tensor([list(grid)]),
        ).numpy()

    params = qwen_vit.params_from_torch(model.state_dict(), CFG)
    got = qwen_vit.encode(params, jnp.asarray(patches), grid, CFG)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-4)


def test_smart_resize_matches_reference():
    from modeling.qwen2vl.image_processing_qwen2_vl import (
        smart_resize as ref_smart_resize,
    )

    for h, w in [(768, 768), (540, 960), (968, 1296), (100, 3000), (56, 56)]:
        assert smart_resize(h, w) == ref_smart_resize(h, w)


def test_internvl_transform_matches_reference():
    # Reference data/transforms.py:110-148 (InternVLImageTransform):
    # numpy -> transformers resize((448,448), resample=3 BICUBIC) ->
    # ToTensor (CHW /255) -> Normalize(CLIP mean/std).
    from PIL import Image
    from transformers.image_transforms import resize as hf_resize

    from g2vlm_tpu.data.vit_preprocess import (
        OPENAI_CLIP_MEAN,
        OPENAI_CLIP_STD,
        preprocess_internvl_image,
    )

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (130, 217, 3), dtype=np.uint8)
    ref = hf_resize(arr, size=(448, 448), resample=3).astype(np.float32) / 255.0
    ref = ((ref - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD).transpose(2, 0, 1)

    got = preprocess_internvl_image(Image.fromarray(arr))
    assert got.shape == (3, 448, 448)
    np.testing.assert_allclose(got, ref, atol=1e-5)
