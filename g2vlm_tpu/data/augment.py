"""Image augmentations (host-side numpy).

Behavioral spec: reference data/augmentation_vggt.py:11-72 — ColorJitter
(brightness/contrast/saturation 0.5, hue 0.1) applied with p=0.9 plus random
grayscale p=0.05, used as the (co-)jitter in PackedDataset.to_tensor."""

from __future__ import annotations

import numpy as np

_GRAY_W = np.asarray([0.299, 0.587, 0.114], np.float32)


def _grayscale(img: np.ndarray) -> np.ndarray:
    """img (3, H, W) -> luminance replicated to 3 channels."""
    g = np.tensordot(_GRAY_W, img, axes=([0], [0]))
    return np.stack([g, g, g])


def _adjust_hue(img: np.ndarray, factor: float) -> np.ndarray:
    """Hue rotation by `factor` (in turns, [-0.5, 0.5]) via HSV round-trip."""
    r, g, b = img[0], img[1], img[2]
    maxc = np.max(img, axis=0)
    minc = np.min(img, axis=0)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    dz = np.maximum(delta, 1e-12)
    rc = (maxc - r) / dz
    gc = (maxc - g) / dz
    bc = (maxc - b) / dz
    h = np.where(r == maxc, bc - gc, np.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = np.where(delta == 0, 0.0, h)

    h = (h + factor) % 1.0
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    r2 = np.choose(i, [v, q, p, p, t, v])
    g2 = np.choose(i, [t, v, v, q, p, p])
    b2 = np.choose(i, [p, p, t, v, v, q])
    return np.stack([r2, g2, b2])


def random_color_augmentation(
    img: np.ndarray,
    rng: np.random.Generator,
    brightness: float = 0.5,
    contrast: float = 0.5,
    saturation: float = 0.5,
    hue: float = 0.1,
    jitter_p: float = 0.9,
    grayscale_p: float = 0.05,
) -> np.ndarray:
    """img (3, H, W) float [0,1]. torchvision ColorJitter semantics: random
    order of the four adjustments, factors uniform in [1-x, 1+x].

    All RNG draws happen here (same order either way), then the pixel work
    runs in one fused native pass (csrc color_jitter_f32) when the toolchain
    is present — the numpy hue round-trip below was the measured hot spot of
    the whole host data path (~70% of pack time) — with this numpy body as
    the exact-semantics fallback."""
    out = img.astype(np.float32)  # astype always copies here
    jit = rng.random() < jitter_p
    ops, fb, fc, fs, fh = np.zeros(0, np.int32), 0.0, 0.0, 0.0, 0.0
    if jit:
        ops = rng.permutation(4)
        fb = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        fc = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        fs = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        fh = rng.uniform(-hue, hue)
    do_gray = rng.random() < grayscale_p
    if jit or do_gray:
        from ..csrc import color_jitter

        res = color_jitter(out, ops, fb, fc, fs, fh, do_gray)
        if res is not None:
            return res
    if jit:
        for op in ops:
            if op == 0:
                out = out * fb
            elif op == 1:
                mean = _grayscale(out).mean()
                out = (out - mean) * fc + mean
            elif op == 2:
                gray = _grayscale(out)
                out = (out - gray) * fs + gray
            else:
                out = _adjust_hue(np.clip(out, 0.0, 1.0), fh)
            out = np.clip(out, 0.0, 1.0)
    if do_gray:
        out = _grayscale(out)
    return np.clip(out, 0.0, 1.0).astype(np.float32)
