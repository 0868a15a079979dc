"""Point-cloud export. Behavioral spec: reference g2vlm_utils.py:84-149
(bilinear point-map upsample to image resolution, NaN/Inf filtering) — written
as a plain binary PLY writer instead of the open3d C++ dependency (the
reference's own data/dataset_utils_vggt.py:599-614 does the same)."""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np


def write_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None):
    """points (N, 3) float; colors (N, 3) in [0,1] or uint8."""
    points = np.asarray(points, np.float32)
    n = len(points)
    has_color = colors is not None
    if has_color:
        colors = np.asarray(colors)
        if colors.dtype != np.uint8:
            colors = np.clip(colors * 255.0, 0, 255).astype(np.uint8)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if has_color:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if has_color:
            rec = np.zeros(
                n,
                dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)],
            )
            rec["xyz"] = points
            rec["rgb"] = colors
            f.write(rec.tobytes())
        else:
            f.write(points.astype("<f4").tobytes())


def save_ply_visualization(
    pred: dict, save_path: str, filter_nan: bool = True
) -> dict:
    """pred: dict with numpy 'points' (N_views, Hp, Wp, 3) and 'images'
    (N_views, 3, H, W) in [0,1]. Upsamples the point map bilinearly
    (antialiased, matching torch) to the image resolution, filters NaN/Inf,
    writes a colored PLY. Returns stats."""
    from .image import resize_hw
    import jax.numpy as jnp

    points = np.asarray(pred["points"])
    images = np.asarray(pred["images"])
    h, w = images.shape[-2:]
    if points.shape[1:3] != (h, w):
        pts = np.asarray(
            resize_hw(
                jnp.asarray(points.transpose(0, 3, 1, 2)), (h, w),
                method="bilinear", antialias=True,
            )
        ).transpose(0, 2, 3, 1)
    else:
        pts = points
    pts = pts.reshape(-1, 3)
    colors = images.transpose(0, 2, 3, 1).reshape(-1, 3)
    stats = {"total": len(pts)}
    if filter_nan:
        valid = np.isfinite(pts).all(axis=1)
        stats["invalid"] = int((~valid).sum())
        pts, colors = pts[valid], colors[valid]
    stats["written"] = len(pts)
    if len(pts):
        lo, hi = pts.min(axis=0), pts.max(axis=0)
        stats["bbox"] = (lo.tolist(), hi.tolist())
    write_ply(save_path, pts, colors)
    return stats
