"""Geometry primitives (JAX). Behavioral spec: reference
modeling/pi3/utils/geometry.py:5-366 (se3_inverse, homogenize_points,
depth unprojection, depth_edge, point-map recovery helpers)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def homogenize_points(points: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 4) with a trailing 1 (reference geometry.py:108)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def se3_inverse(mat: jax.Array) -> jax.Array:
    """Invert (..., 4, 4) rigid transforms via R^T, -R^T t (reference
    geometry.py:5)."""
    r = mat[..., :3, :3]
    t = mat[..., :3, 3:]
    rt = jnp.swapaxes(r, -1, -2)
    new_t = -rt @ t
    top = jnp.concatenate([rt, new_t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], mat.dtype), mat.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(mat: jax.Array, points: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to (..., H, W, 3) points -> (..., H, W, 3)."""
    ph = homogenize_points(points)
    out = jnp.einsum("...ij,...hwj->...hwi", mat, ph)
    return out[..., :3]


def depthmap_to_camera_coordinates(
    depth: jax.Array,  # (H, W)
    intrinsics: jax.Array,  # (3, 3)
) -> Tuple[jax.Array, jax.Array]:
    """Unproject a depth map to camera-frame points with a pinhole model
    (reference geometry.py:47-105). Returns (points (H,W,3), valid (H,W))."""
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    pts = jnp.stack([x, y, depth], axis=-1)
    return pts, depth > 0.0


def depthmap_to_world_coordinates(
    depth: jax.Array,  # (H, W)
    intrinsics: jax.Array,  # (3, 3)
    cam2world: jax.Array,  # (4, 4)
) -> Tuple[jax.Array, jax.Array]:
    pts_cam, valid = depthmap_to_camera_coordinates(depth, intrinsics)
    pts_w = transform_points(cam2world, pts_cam)
    return pts_w, valid


def points_to_normals(points: jax.Array, mask: Optional[jax.Array] = None):
    """Per-pixel normals via cross products of forward differences, mirroring
    the normal-loss construction (reference pi3_loss.py:86-117 uses
    utils3d-style normals from point maps). points (..., H, W, 3)."""
    dx = points[..., :, 1:, :] - points[..., :, :-1, :]
    dy = points[..., 1:, :, :] - points[..., :-1, :, :]
    dx = dx[..., :-1, :, :]
    dy = dy[..., :, :-1, :]
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    if mask is not None:
        m = mask[..., 1:, 1:] & mask[..., :-1, :-1] & mask[..., 1:, :-1] & mask[..., :-1, 1:]
        return n, m
    return n, None


def depth_edge(
    depth: jax.Array, rtol: float = 0.03, kernel_size: int = 3
) -> jax.Array:
    """Mark pixels whose local relative depth range exceeds rtol (reference
    geometry.py:339-366: maxpool(depth) - (-maxpool(-depth)) > rtol * depth).
    depth (..., H, W) -> bool (..., H, W)."""
    pad = kernel_size // 2
    shape = depth.shape
    x = depth.reshape((-1,) + shape[-2:])[..., None]  # (B, H, W, 1)
    mx = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, kernel_size, kernel_size, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    mn = -jax.lax.reduce_window(
        -x, -jnp.inf, jax.lax.max,
        (1, kernel_size, kernel_size, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    diff = (mx - mn)[..., 0]
    # NB: the reference compares diff/depth (not diff vs rtol*depth), which
    # flips the predicate for negative depths — keep identical semantics.
    ratio = jnp.nan_to_num(diff / x[..., 0])  # nan->0, +-inf->dtype max/min
    edge = ratio > rtol
    return edge.reshape(shape)
