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
