"""Fused on-device image preprocessing.

BASELINE.json's north star asks for resize/normalize/patchify fused into one
JAX path feeding the encoder without host round-trips (replacing the
reference's transforms_vggt.py:411-471 + data_utils.py:40-47 host pipeline).

Host work shrinks to image decode; raw uint8 frames upload once (3-4x less
transfer than fp32) and one jitted program does cast -> antialiased bilinear
resize (as two matmuls — MXU work) -> RESNET normalize. The encoder's patch
embed is already a reshape+matmul, so patchify needs no separate step.

Deviation: the reference resizes with PIL LANCZOS; the device path uses
torch-exact antialiased bilinear (utils/image.py). Use the host path
(data/images.py) when LANCZOS-exact parity is required.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

RESNET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
RESNET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def target_hw(h0: int, w0: int, new_width: int = 518, multiple: int = 14):
    """Same shape rule as the host loader (reference load_images,
    transforms_vggt.py:411-431)."""
    th = round(h0 * (new_width / w0) / multiple) * multiple
    return th, new_width


OPENAI_CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def _pil_bicubic(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """PIL-order bicubic resize of (..., H, W) in 0..255: horizontal pass,
    uint8 lattice, vertical pass, uint8 lattice (PIL ImagingResample runs
    horizontal-then-vertical with a materialized uint8 image between)."""
    from ..utils.image import resize_matrix

    def lattice(v):
        return jnp.round(jnp.clip(v, 0.0, 255.0))

    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if w_in != w_out:
        ww = jnp.asarray(resize_matrix(w_in, w_out, "bicubic", True))
        x = lattice(jnp.einsum("ow,...hw->...ho", ww, x,
                               preferred_element_type=jnp.float32))
    if h_in != h_out:
        wh = jnp.asarray(resize_matrix(h_in, h_out, "bicubic", True))
        x = lattice(jnp.einsum("oh,...hw->...ow", wh, x,
                               preferred_element_type=jnp.float32))
    return x


def vit_device_grid(
    stage_hw: Tuple[int, int] = (768, 768),
    patch_size: int = 14,
    merge_size: int = 2,
) -> Tuple[int, int, int]:
    """grid_thw the device ViT preprocess produces for every frame (static:
    the serving path fixes the pre-resize stage at 768x768, reference
    data/transforms.py:151-178, then smart_resize rounds to factor 28)."""
    from .vit_preprocess import smart_resize

    rh, rw = smart_resize(*stage_hw, factor=patch_size * merge_size)
    return (1, rh // patch_size, rw // patch_size)


@functools.partial(
    jax.jit,
    static_argnames=("stage_hw", "patch_size", "merge_size", "pad_to",
                     "out_dtype"),
)
def preprocess_vit_frames_device(
    frames: jax.Array,  # (N, H0, W0, 3) uint8
    stage_hw: Tuple[int, int] = (768, 768),
    patch_size: int = 14,
    merge_size: int = 2,
    pad_to: int = 0,
    out_dtype=jnp.float32,
) -> jax.Array:
    """uint8 frames -> flattened Qwen2-VL patch rows (P, 1176) on device.

    Mirrors the host preprocess_vit_image (data/vit_preprocess.py:81-107:
    bicubic 768x768 -> smart_resize bicubic -> CLIP normalize -> patch
    tiling, reference image_processing_qwen2_vl.py:248-273). PIL resamples
    HORIZONTALLY first and materializes a uint8 image after EACH pass —
    bicubic overshoot saturates at [0,255] and values round to 1/255 steps —
    so the device path replicates pass order and lattice quantization; the
    only residual deviation is PIL's fixed-point tap arithmetic (<=2/255
    per pass, tests/test_device_preprocess.py)."""
    from .vit_preprocess import smart_resize

    x = frames.astype(jnp.float32)  # 0..255, (N, H0, W0, 3)
    x = x.transpose(0, 3, 1, 2)  # (N, C, H0, W0)
    rh, rw = smart_resize(*stage_hw, factor=patch_size * merge_size)
    for out_hw in ((tuple(stage_hw),) if (rh, rw) == tuple(stage_hw)
                   else (tuple(stage_hw), (rh, rw))):
        x = _pil_bicubic(x, out_hw)
    x = x * (1.0 / 255.0)
    mean = jnp.asarray(OPENAI_CLIP_MEAN)[None, :, None, None]
    std = jnp.asarray(OPENAI_CLIP_STD)[None, :, None, None]
    x = (x - mean) / std

    # batched tile_patches (vit_preprocess.py:42-58): a single image repeats
    # temporally to fill the 2-frame temporal patch
    n, c, h, w = x.shape
    m, p, tps = merge_size, patch_size, 2
    gh, gw = h // p, w // p
    f = jnp.stack([x, x], axis=1)  # (N, tps, C, H, W)
    f = f.reshape(n, tps, c, gh // m, m, p, gw // m, m, p)
    f = f.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = f.reshape(n * gh * gw, c * tps * p * p).astype(out_dtype)
    if pad_to and pad_to > flat.shape[0]:
        flat = jnp.pad(flat, ((0, pad_to - flat.shape[0]), (0, 0)))
    return flat


@functools.partial(jax.jit, static_argnames=("out_hw", "normalize"))
def preprocess_views_device(
    frames: jax.Array,  # (N, H0, W0, 3) uint8
    out_hw: Tuple[int, int],
    normalize: bool = True,
) -> jax.Array:
    """-> (N, 3, H, W) float32, resized + RESNET-normalized, one XLA program."""
    from ..utils.image import resize_hw

    x = frames.astype(jnp.float32) / 255.0
    x = x.transpose(0, 3, 1, 2)  # NCHW
    x = resize_hw(x, out_hw, method="bilinear", antialias=True)
    if normalize:
        mean = jnp.asarray(RESNET_MEAN)[None, :, None, None]
        std = jnp.asarray(RESNET_STD)[None, :, None, None]
        x = (x - mean) / std
    return x
