"""Native (C++) data-path library, loaded via ctypes with lazy compilation.

Python fallbacks exist for every entry point (models/g2vlm.SequenceBuilder,
data/recon_dataset.depth_to_world_points), so the package works without a
toolchain; with g++ present the .so builds once and is cached next to the
source."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "datapath.cpp")
_SO = os.path.join(_DIR, "libdatapath.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        if _build():
            lib = ctypes.CDLL(_SO)
            i64 = ctypes.c_int64
            p = ctypes.POINTER
            lib.depth_unproject.argtypes = [
                p(ctypes.c_float), i64, i64, p(ctypes.c_float),
                p(ctypes.c_float), p(ctypes.c_float), p(ctypes.c_uint8),
            ]
            lib.resize_bilinear_f32.argtypes = [
                p(ctypes.c_float), i64, i64, p(ctypes.c_float), i64, i64,
            ]
            lib.vit_preprocess_u8.argtypes = [
                p(ctypes.c_uint8), i64, i64,        # src, sh, sw
                i64, i64,                            # mh, mw (stage-1)
                i64, i64,                            # th, tw (smart-resized)
                p(ctypes.c_float), p(ctypes.c_float),  # mean, std
                i64, i64, i64,                       # patch, merge, tps
                p(ctypes.c_float),                   # out rows
            ]
            lib.resize_window_u8.argtypes = [
                p(ctypes.c_uint8), i64, i64,        # src, sh, sw
                i64, i64, i64, i64,                  # cl, ct, cw, ch
                p(ctypes.c_uint8), i64, i64,        # dst, dh, dw
                i64, i64,                            # channels, filter
            ]
            lib.color_jitter_f32.argtypes = [
                p(ctypes.c_float), i64, i64,        # img (3,h,w), h, w
                p(ctypes.c_int32), i64,              # ops, n_ops
                ctypes.c_float, ctypes.c_float,      # fb, fc
                ctypes.c_float, ctypes.c_float,      # fs, fh
                ctypes.c_int32,                      # do_grayscale
            ]
            i32p = p(ctypes.c_int32)
            i64p = p(ctypes.c_int64)
            u8p = p(ctypes.c_uint8)
            lib.build_sequence_metadata.restype = ctypes.c_int64
            lib.build_sequence_metadata.argtypes = [
                i32p, i64,                       # segs, n_segs
                ctypes.c_int32, ctypes.c_int32,  # doc, rope_start
                i64,                             # curr_start
                ctypes.c_int32, ctypes.c_int32,  # fn_start, dino_fn
                ctypes.c_int32, ctypes.c_int32,  # soi, eoi
                i32p, i32p, i32p, i32p,          # doc/fn/noise/pos
                i64p,                            # position_ids (3, S)
                u8p,                             # is_geo
                i32p, i64p, i64p,                # text_ids/indexes/n_text
                i64p, i64p,                      # dino_indexes/n_dino
                i64p, i64p,                      # vit_indexes/n_vit
                i64,                             # stride
            ]
            _lib = lib
    return _lib


def build_sequence_metadata(
    segs: np.ndarray,  # (n_segs, 4) int32 rows: [type, a, b, c]
    total_len: int,
    doc: int = 0,
    rope_start: int = 0,
    curr_start: int = 0,
    fn_start: int = 1,
    dino_fn: int = 0,
    soi: int = 151652,
    eoi: int = 151653,
):
    """One-pass packed-sequence metadata (native). Returns a dict of the same
    arrays models/g2vlm.SequenceBuilder produces; text slots belonging to
    caller token ids are marked -1 in text_ids."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native datapath library unavailable")
    segs = np.ascontiguousarray(segs, np.int32)
    s = total_len
    doc_id = np.full(s, -1, np.int32)
    fn_id = np.full(s, -1, np.int32)
    noise_id = np.full(s, -1, np.int32)
    pos_meta = np.zeros(s, np.int32)
    position_ids = np.zeros((3, s), np.int64)
    is_geo = np.zeros(s, np.uint8)
    cap = s
    text_ids = np.zeros(cap, np.int32)
    text_indexes = np.zeros(cap, np.int64)
    dino_indexes = np.zeros(cap, np.int64)
    vit_indexes = np.zeros(cap, np.int64)
    n_text = np.zeros(1, np.int64)
    n_dino = np.zeros(1, np.int64)
    n_vit = np.zeros(1, np.int64)

    def ip32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def ip64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    ret = lib.build_sequence_metadata(
        ip32(segs), len(segs), doc, rope_start, curr_start, fn_start, dino_fn,
        soi, eoi,
        ip32(doc_id), ip32(fn_id), ip32(noise_id), ip32(pos_meta),
        ip64(position_ids),
        is_geo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ip32(text_ids), ip64(text_indexes), ip64(n_text),
        ip64(dino_indexes), ip64(n_dino),
        ip64(vit_indexes), ip64(n_vit),
        s,
    )
    nt, nd, nv = int(n_text[0]), int(n_dino[0]), int(n_vit[0])
    return dict(
        doc_id=doc_id, fn_id=fn_id, noise_id=noise_id, pos=pos_meta,
        position_ids=position_ids, is_geo=is_geo.astype(bool),
        text_ids=text_ids[:nt], text_indexes=text_indexes[:nt],
        dino_indexes=dino_indexes[:nd], vit_indexes=vit_indexes[:nv],
        seq_len=int(ret & 0xFFFFFFFF), next_rope_pos=int(ret >> 32),
    )


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def depth_unproject(depth: np.ndarray, intrinsics: np.ndarray, cam2world: np.ndarray):
    """Native pinhole unprojection; falls back to numpy when no toolchain."""
    lib = get_lib()
    h, w = depth.shape
    if lib is None:
        from ..data.recon_dataset import depth_to_world_points

        return depth_to_world_points(depth, intrinsics, cam2world)
    depth = np.ascontiguousarray(depth, np.float32)
    k = np.ascontiguousarray(intrinsics, np.float32)
    c2w = np.ascontiguousarray(cam2world, np.float32)
    pts = np.empty((h, w, 3), np.float32)
    valid = np.empty((h, w), np.uint8)
    lib.depth_unproject(
        _fptr(depth), h, w, _fptr(k), _fptr(c2w), _fptr(pts),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return pts, valid.astype(bool)


def vit_preprocess(
    image: np.ndarray,  # (H, W, 3) uint8 RGB
    target_hw=(768, 768),
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
):
    """Fused native Qwen2-VL preprocess: bicubic resize (antialiased, PIL
    convention) -> smart_resize dims -> CLIP normalize -> merge-grouped patch
    rows, one C++ pass. Returns (rows (gh*gw, C*tps*p*p) float32, grid_thw).
    ~20x the PIL+numpy chain on one host core (scripts/bench_data.py).
    Falls back to data/vit_preprocess.preprocess_vit_image without g++."""
    from ..data.vit_preprocess import (
        OPENAI_CLIP_MEAN, OPENAI_CLIP_STD, preprocess_vit_image, smart_resize,
    )

    lib = get_lib()
    if lib is None or image.dtype != np.uint8 or image.ndim != 3 \
            or image.shape[2] != 3:
        return preprocess_vit_image(
            image, target_hw, patch_size, merge_size
        )
    mh, mw = target_hw
    th, tw = smart_resize(mh, mw, factor=patch_size * merge_size)
    gh, gw = th // patch_size, tw // patch_size
    rows = np.empty(
        (gh * gw, 3 * temporal_patch_size * patch_size * patch_size),
        np.float32,
    )
    img = np.ascontiguousarray(image)
    mean = np.ascontiguousarray(OPENAI_CLIP_MEAN, np.float32)
    std = np.ascontiguousarray(OPENAI_CLIP_STD, np.float32)
    lib.vit_preprocess_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1], mh, mw, th, tw,
        _fptr(mean), _fptr(std),
        patch_size, merge_size, temporal_patch_size,
        _fptr(rows),
    )
    return rows, (1, gh, gw)


def crop_resize_u8(
    image: np.ndarray,  # (H, W, C) uint8
    crop_box,           # (l, t, r, b) PIL convention, or None for full image
    out_wh,             # (W, H) like PIL Image.resize
    filter: str = "bicubic",
) -> "np.ndarray | None":
    """Native PIL-semantics crop+resize to uint8 (one fused pass, float
    accumulation, PIL output rounding). Drop-in for
    Image.fromarray(a).crop(box).resize(out_wh, BICUBIC|LANCZOS) in the
    dino/recon host path (reference pi3/utils/cropping.py rescale path).
    Returns None when the native library is unavailable (caller falls back
    to PIL)."""
    lib = get_lib()
    if lib is None or image.dtype != np.uint8 or image.ndim != 3:
        return None
    h, w, c = image.shape
    if crop_box is None:
        crop_box = (0, 0, w, h)
    l, t, r, b = (int(x) for x in crop_box)
    if not (0 <= l < r <= w and 0 <= t < b <= h):
        return None  # out-of-bounds crops: PIL zero-pads; keep PIL for those
    dw, dh = (int(x) for x in out_wh)
    img = np.ascontiguousarray(image)
    dst = np.empty((dh, dw, c), np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.resize_window_u8(
        img.ctypes.data_as(u8), h, w, l, t, r - l, b - t,
        dst.ctypes.data_as(u8), dh, dw, c,
        1 if filter == "lanczos" else 0,
    )
    return dst


def color_jitter(
    img: np.ndarray,  # (3, H, W) float32 [0,1], modified IN PLACE when native
    ops: np.ndarray,  # permutation over {0,1,2,3}
    fb: float, fc: float, fs: float, fh: float,
    do_grayscale: bool,
) -> "np.ndarray | None":
    """Native fused ColorJitter(+grayscale) matching data/augment.py's op
    sequence bit-for-bit in structure (fp32 roundoff-level differences).
    Returns None when unavailable; caller falls back to numpy."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    ops = np.ascontiguousarray(ops, np.int32)
    lib.color_jitter_f32(
        _fptr(img), img.shape[1], img.shape[2],
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ops),
        fb, fc, fs, fh, 1 if do_grayscale else 0,
    )
    return img


def resize_bilinear(src: np.ndarray, out_hw) -> np.ndarray:
    """Native bilinear resize (align_corners=False, no antialias)."""
    lib = get_lib()
    dh, dw = out_hw
    if lib is None:
        import jax.numpy as jnp

        from ..utils.image import resize_hw

        return np.asarray(
            resize_hw(jnp.asarray(src), out_hw, "bilinear", antialias=False)
        )
    src = np.ascontiguousarray(src, np.float32)
    dst = np.empty((dh, dw), np.float32)
    lib.resize_bilinear_f32(_fptr(src), src.shape[0], src.shape[1], _fptr(dst), dh, dw)
    return dst
