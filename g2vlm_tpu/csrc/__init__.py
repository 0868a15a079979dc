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
            _lib = lib
    return _lib


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
