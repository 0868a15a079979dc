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
