"""Fused device preprocessing vs torch bilinear reference."""

import numpy as np
import jax.numpy as jnp
import torch

from g2vlm_tpu.data.device_preprocess import preprocess_views_device, target_hw


def test_device_preprocess_matches_torch(rng):
    frames = (rng.random((2, 96, 128, 3)) * 255).astype(np.uint8)
    th, tw = target_hw(96, 128, new_width=56, multiple=14)
    out = np.asarray(
        preprocess_views_device(jnp.asarray(frames), (th, tw), normalize=False)
    )
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(frames.astype(np.float32) / 255).permute(0, 3, 1, 2),
            (th, tw), mode="bilinear", align_corners=False, antialias=True,
        )
        .numpy()
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_device_preprocess_normalize(rng):
    frames = (rng.random((1, 56, 56, 3)) * 255).astype(np.uint8)
    out = np.asarray(preprocess_views_device(jnp.asarray(frames), (56, 56)))
    raw = frames[0].astype(np.float32) / 255.0
    mean = np.asarray([0.485, 0.456, 0.406])
    std = np.asarray([0.229, 0.224, 0.225])
    ref = ((raw - mean) / std).transpose(2, 0, 1)
    np.testing.assert_allclose(out[0], ref, atol=1e-5, rtol=1e-5)


def test_device_vit_preprocess_matches_host(rng):
    """Device Qwen-ViT preprocess (bicubic matmuls, fp32 throughout) vs the
    host PIL path (vit_preprocess.preprocess_vit_image). PIL re-quantizes to
    uint8 between its two resizes, so exact equality is impossible; the
    device path must stay within that quantization envelope (~0.5/255 per
    resize, /CLIP std after normalize)."""
    from g2vlm_tpu.data.device_preprocess import (
        preprocess_vit_frames_device, vit_device_grid,
    )
    from g2vlm_tpu.data.vit_preprocess import preprocess_vit_image

    frames = (rng.random((2, 96, 128, 3)) * 255).astype(np.uint8)
    got = np.asarray(
        preprocess_vit_frames_device(jnp.asarray(frames)), np.float32
    )
    grid = vit_device_grid()
    refs, grids = zip(*(preprocess_vit_image(f) for f in frames))
    assert all(tuple(g) == grid for g in grids)
    ref = np.concatenate(refs)
    assert got.shape == ref.shape
    err = np.abs(got - ref)
    # normalized units: CLIP std ~0.27 -> one uint8 step ~0.0145
    assert err.max() < 0.05, err.max()
    assert np.mean(err < 0.02) > 0.97, np.mean(err < 0.02)


def test_device_vit_preprocess_padding():
    from g2vlm_tpu.data.device_preprocess import (
        preprocess_vit_frames_device, vit_device_grid,
    )

    frames = np.zeros((1, 64, 64, 3), np.uint8)
    per = int(np.prod(vit_device_grid()))
    pad_to = per + 4
    out = np.asarray(preprocess_vit_frames_device(
        jnp.asarray(frames), pad_to=pad_to
    ))
    assert out.shape[0] == pad_to
    assert np.all(out[per:] == 0)
