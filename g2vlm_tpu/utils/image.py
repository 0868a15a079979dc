"""Separable image resizing with exact PyTorch `F.interpolate` numerics.

The reference pipeline resizes in three places whose outputs feed the model
(load_and_resize14: bilinear+antialias, data/transforms_vggt.py:454-462;
DINOv2 position-embedding interpolation: bicubic+antialias,
modeling_dinov2_with_registers.py:93-162; PLY point-map upsample: bilinear,
g2vlm_utils.py:84-149). `jax.image.resize`'s cubic kernel (Keys, A=-0.5)
differs from torch's (A=-0.75), so we build the interpolation weight matrices
ourselves (host-side numpy, static per shape) and apply them as two matmuls —
which is also the MXU-friendly formulation.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    return np.clip(1.0 - np.abs(x), 0.0, None)


@lru_cache(maxsize=256)
def resize_matrix(
    in_size: int, out_size: int, method: str = "bilinear", antialias: bool = True
) -> np.ndarray:
    """(out_size, in_size) float32 weight matrix replicating torch
    F.interpolate(..., mode=method, align_corners=False, antialias=antialias)."""
    if method in ("bilinear", "linear"):
        kernel, radius = _linear_kernel, 1.0
    elif method in ("bicubic", "cubic"):
        # torch's antialiased bicubic is ported from Pillow (A=-0.5); the
        # classic non-antialiased kernel uses A=-0.75.
        a = -0.5 if antialias else -0.75
        kernel, radius = (lambda x, _a=a: _cubic_kernel(x, _a)), 2.0
    else:
        raise ValueError(method)
    scale = in_size / out_size
    support_scale = max(scale, 1.0) if antialias else 1.0
    support = radius * support_scale
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale - 0.5
        lo = int(np.floor(center - support)) + 1
        hi = int(np.floor(center + support)) + 1
        idx = np.arange(lo, hi)
        w = kernel((idx - center) / support_scale)
        if antialias:
            # Pillow/torch -aa kernels drop out-of-range taps and renormalize
            # over the surviving ones (no border replication).
            keep = (idx >= 0) & (idx < in_size)
            idx, w = idx[keep], w[keep]
            s = w.sum()
            if s != 0:
                w = w / s
            W[i, idx] = w
        else:
            # Classic 4-tap path replicates the border (index clamp); cubic
            # weights already sum to 1.
            np.add.at(W[i], np.clip(idx, 0, in_size - 1), w)
    return W.astype(np.float32)


def resize_hw(
    img: jax.Array,  # (..., H, W)
    out_hw: Tuple[int, int],
    method: str = "bilinear",
    antialias: bool = True,
) -> jax.Array:
    """Resize the trailing two axes; fp32 compute."""
    h_in, w_in = img.shape[-2], img.shape[-1]
    h_out, w_out = out_hw
    dtype = img.dtype
    x = img.astype(jnp.float32)
    if h_in != h_out:
        wh = jnp.asarray(resize_matrix(h_in, h_out, method, antialias))
        x = jnp.einsum("oh,...hw->...ow", wh, x, preferred_element_type=jnp.float32)
    if w_in != w_out:
        ww = jnp.asarray(resize_matrix(w_in, w_out, method, antialias))
        x = jnp.einsum("ow,...hw->...ho", ww, x, preferred_element_type=jnp.float32)
    return x.astype(dtype)
