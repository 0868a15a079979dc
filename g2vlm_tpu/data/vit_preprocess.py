"""Host-side Qwen2-VL image preprocessing.

Behavioral spec: reference modeling/qwen2vl/image_processing_qwen2_vl.py:56-273
(smart_resize + patch tiling) and data/transforms.py:151-178
(QwenVL2ImageTransform: PIL bicubic resize to 768x768 before the processor)."""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

OPENAI_CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def smart_resize(
    height: int,
    width: int,
    factor: int = 28,
    min_pixels: int = 56 * 56,
    max_pixels: int = 14 * 14 * 4 * 1280,
) -> Tuple[int, int]:
    """Round to multiples of `factor` while keeping pixel count in range
    (reference image_processing_qwen2_vl.py:56-85)."""
    if height < factor or width < factor:
        raise ValueError(f"height/width must exceed factor {factor}")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def tile_patches(
    img: np.ndarray,  # (C, H, W) normalized
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Flatten into merge-grouped patch rows (reference :248-273). A single
    image is repeated temporally to fill the temporal patch."""
    frames = np.stack([img] * temporal_patch_size)  # (tps, C, H, W)
    c, h, w = img.shape
    gt = 1
    gh, gw = h // patch_size, w // patch_size
    m, p = merge_size, patch_size
    x = frames.reshape(gt, temporal_patch_size, c, gh // m, m, p, gw // m, m, p)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = x.reshape(gt * gh * gw, c * temporal_patch_size * p * p)
    return flat, (gt, gh, gw)


def preprocess_internvl_image(image, size: int = 448) -> np.ndarray:
    """InternVL-style fixed-square preprocess (reference data/transforms.py:110-148
    InternVLImageTransform): RGB -> bicubic resize to 448x448 -> CLIP
    normalize. Returns (C, size, size) float32. Kept for parity with the
    reference's alternate ViT transform; the G2VLM flow uses the Qwen2-VL
    processor below."""
    from PIL import Image

    if isinstance(image, str):
        image = Image.open(image).convert("RGB")
    elif isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    elif image.mode != "RGB":
        image = image.convert("RGB")
    image = image.resize((size, size), Image.Resampling.BICUBIC)
    arr = np.asarray(image, np.float32) / 255.0
    arr = (arr - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    return arr.transpose(2, 0, 1)


def preprocess_vit_image_fast(
    image,
    target_hw: Tuple[int, int] = (768, 768),
    patch_size: int = 14,
    merge_size: int = 2,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """csrc-accelerated preprocess for the training data path: one fused C++
    pass (resize+normalize+patch rows, csrc/datapath.cpp:vit_preprocess_u8)
    at ~20x the PIL+numpy chain per host core. Resample is the same Keys
    bicubic with antialias but float-accumulated, so outputs sit within
    ~1/255 of PIL's per-pass-quantized values (training noise floor; the
    cojitter augmentation injects far more). Inference keeps the exact
    PIL path (preprocess_vit_image). G2VLM_NATIVE_VIT=0 opts out."""
    import os

    if os.environ.get("G2VLM_NATIVE_VIT", "1") == "1":
        arr = None
        if isinstance(image, str):
            from PIL import Image

            arr = np.asarray(Image.open(image).convert("RGB"))
        elif isinstance(image, np.ndarray) and image.dtype == np.uint8:
            arr = image
        elif hasattr(image, "convert"):
            arr = np.asarray(image.convert("RGB"))
        if arr is not None and arr.ndim == 3 and arr.shape[2] == 3:
            from ..csrc import vit_preprocess

            return vit_preprocess(arr, target_hw, patch_size, merge_size)
    return preprocess_vit_image(image, target_hw, patch_size, merge_size)


def preprocess_vit_image(
    image,
    target_hw: Tuple[int, int] = (768, 768),
    patch_size: int = 14,
    merge_size: int = 2,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """PIL image -> (flattened patch rows, grid_thw), matching
    QwenVL2ImageTransform(768, 768, 14) + Qwen2VLImageProcessor."""
    from PIL import Image

    if isinstance(image, str):
        image = Image.open(image).convert("RGB")
    elif isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    elif image.mode != "RGB":
        image = image.convert("RGB")

    # reference data/transforms.py:171-172 (resample=3 == BICUBIC)
    image = image.resize((target_hw[1], target_hw[0]), Image.Resampling.BICUBIC)
    h, w = image.size[1], image.size[0]
    rh, rw = smart_resize(h, w, factor=patch_size * merge_size)
    if (rh, rw) != (h, w):
        image = image.resize((rw, rh), Image.Resampling.BICUBIC)
    arr = np.asarray(image, np.float32) / 255.0  # (H, W, C)
    arr = (arr - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    arr = arr.transpose(2, 0, 1)
    return tile_patches(arr, patch_size, merge_size)
