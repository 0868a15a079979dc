"""Pi3 training losses, JAX-native.

Behavioral spec: reference modeling/pi3/models/pi3_loss.py:43-356 and
modeling/pi3/utils/alignment.py:53-85, 233-249.

All reductions over dynamic valid-pixel sets are reformulated as masked sums
with static shapes (fancy-indexing in the reference); the ROE resampling and
the weighted-L1 scale alignment are expressed with sort/cumsum/gather, which
XLA compiles without host round-trips.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.geometry import depth_edge, homogenize_points, se3_inverse

# Dataset-quality gating for the normal loss (reference pi3_loss.py:13-15).
HIGH_QUALITY_DATASETS = {
    "BlinkVision", "Game", "GameNew", "DynamicStereo", "FlyingThings3D",
    "gtasfm", "hypersim", "matrixcity", "MidAir", "Monkaa", "PointOdyssey",
    "Sintel", "Spring", "tartanair", "unreal4k", "VirtualKitti", "nav_20w",
}
MIDDLE_QUALITY_DATASETS = {
    "BlendedMVG", "blendedmvs", "DTU", "ETH3D", "scannet", "scannetpp",
    "taskonomy", "dl3dv", "omniworld", "mapfree", "ariasyn", "arkit_high",
}
INDOOR_DATASETS = {
    "hypersim", "scannet", "scannetpp", "taskonomy", "arkitscenes", "nav_20w",
}


def safe_norm(x, axis=-1):
    """L2 norm with a NaN-free gradient at exactly-zero vectors (masked
    entries are exact zeros; d|x|/dx would be 0/0 there)."""
    sq = jnp.sum(x * x, axis=axis)
    nz = sq > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)


def weighted_mean(x, w=None, axis=None, keepdims=False, eps=1e-7):
    if w is None:
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    w = w.astype(x.dtype)
    return jnp.mean(x * w, axis=axis, keepdims=keepdims) / (
        jnp.mean(w, axis=axis, keepdims=keepdims) + eps
    )


def _smooth(err, beta: float):
    """Huber-style smoothing (reference pi3_loss.py:29-34)."""
    if beta == 0:
        return err
    return jnp.where(err < beta, 0.5 * err * err / beta, err - 0.5 * beta)


def angle_diff_vec3(v1, v2, eps=1e-12):
    cross = safe_norm(jnp.cross(v1, v2), axis=-1)
    dot = jnp.sum(v1 * v2, axis=-1)
    return jnp.arctan2(cross + eps, dot)


# ---------------------------------------------------------------------------
# alignment (reference alignment.py:53-85 trunc=None branch + :233-249)
# ---------------------------------------------------------------------------

def align_scale_l1(x, y, w, eps=1e-7):
    """argmin_a sum_i w_i |a x_i - y_i| over the last axis; returns a (...)."""
    sign = jnp.sign(x)
    xs, ys = x * sign, y * sign
    ratio = ys / jnp.maximum(xs, eps)
    order = jnp.argsort(ratio, axis=-1)
    ratio_sorted = jnp.take_along_axis(ratio, order, axis=-1)
    wx = jnp.take_along_axis(xs * w, order, axis=-1)
    derivatives = 2 * jnp.cumsum(wx, axis=-1) - jnp.sum(wx, axis=-1, keepdims=True)
    # first index where derivative >= 0
    idx = jnp.argmax(derivatives >= 0, axis=-1)
    idx = jnp.where(jnp.any(derivatives >= 0, axis=-1), idx, derivatives.shape[-1] - 1)
    return jnp.take_along_axis(ratio_sorted, idx[..., None], axis=-1)[..., 0]


def align_points_scale(points_src, points_tgt, weight):
    """(..., N, 3) x2 + (..., N) -> scale (...)."""
    w3 = jnp.broadcast_to(weight[..., None], points_src.shape)
    return align_scale_l1(
        points_src.reshape(points_src.shape[:-2] + (-1,)),
        points_tgt.reshape(points_tgt.shape[:-2] + (-1,)),
        w3.reshape(w3.shape[:-2] + (-1,)),
    )


def prepare_roe(pts, mask, target_size: int = 4096):
    """Nearest-resample each batch's valid points to a fixed count (reference
    prepare_ROE, pi3_loss.py:67-84). pts (B, N, H, W, C), mask (B, N, H, W)
    -> (B, target_size, C)."""
    b = pts.shape[0]
    c = pts.shape[-1]
    flat_pts = pts.reshape(b, -1, c)
    flat_mask = mask.reshape(b, -1)
    # stable-sort valid points to the front, preserving scan order
    order = jnp.argsort(~flat_mask, axis=-1, stable=True)
    gathered = jnp.take_along_axis(flat_pts, order[..., None], axis=1)
    n_valid = jnp.sum(flat_mask, axis=-1)  # (B,)
    # torch nearest interpolate: out[i] = src[floor(i * n / target)]
    i = jnp.arange(target_size)
    idx = jnp.floor(i[None, :] * (n_valid[:, None] / target_size)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, jnp.maximum(n_valid[:, None] - 1, 0))
    out = jnp.take_along_axis(gathered, idx[..., None], axis=1)
    # empty batches -> ones (reference :80)
    return jnp.where((n_valid > 0)[:, None, None], out, jnp.ones_like(out))


# ---------------------------------------------------------------------------
# point / normal losses (reference PointLoss, pi3_loss.py:43-188)
# ---------------------------------------------------------------------------

def normal_loss(points, gt_points, mask):
    """Cross-product angular loss over 2x2 neighborhoods (reference
    noraml_loss, pi3_loss.py:86-117). points (B,N,H,W,3)."""
    not_edge = ~depth_edge(gt_points[..., 2], rtol=0.03)
    mask = mask & not_edge

    def corners(p):
        return (
            p[..., :-1, :-1, :],
            p[..., :-1, 1:, :],
            p[..., 1:, :-1, :],
            p[..., 1:, 1:, :],
        )

    lu, ru, ld, rd = corners(points)
    glu, gru, gld, grd = corners(gt_points)
    mlu, mru, mld, mrd = (
        mask[..., :-1, :-1],
        mask[..., :-1, 1:],
        mask[..., 1:, :-1],
        mask[..., 1:, 1:],
    )

    pairs = [
        (jnp.cross(ru - rd, ld - rd), jnp.cross(gru - grd, gld - grd), mru & mld & mrd),
        (jnp.cross(lu - ru, rd - ru), jnp.cross(glu - gru, grd - gru), mlu & mrd & mru),
        (jnp.cross(ld - lu, ru - lu), jnp.cross(gld - glu, gru - glu), mld & mru & mlu),
        (jnp.cross(rd - ld, lu - ld), jnp.cross(grd - gld, glu - gld), mrd & mlu & mld),
    ]
    min_a, max_a, beta = math.radians(1), math.radians(90), math.radians(3)
    loss = 0.0
    for v, gv, m in pairs:
        ang = jnp.clip(angle_diff_vec3(v, gv), min_a, max_a)
        loss = loss + m * _smooth(ang, beta)
    h, w = points.shape[-3], points.shape[-2]
    return jnp.mean(loss, axis=(1, 2, 3)) / (4 * max(h, w))  # per-batch (B,)


def point_loss(
    pred: Dict,
    gt: Dict,
    normal_batch_mask: Optional[jax.Array] = None,
    local_align_res: int = 4096,
) -> Tuple[jax.Array, Dict, jax.Array]:
    """Scale-invariant local+global point loss (reference PointLoss.forward,
    pi3_loss.py:119-188). Returns (loss, details, per-batch scale)."""
    pred_local = pred["local_points"].astype(jnp.float32)
    gt_local = gt["local_points"].astype(jnp.float32)
    masks = gt["valid_masks"]
    b, n, h, w, _ = pred_local.shape

    z = gt_local[..., 2]
    z_floor = 0.1 * weighted_mean(z, masks, axis=(-2, -1), keepdims=True)
    weights = 1.0 / (jnp.maximum(z, z_floor) + 1e-6)

    xyz_pred = jax.lax.stop_gradient(
        prepare_roe(pred_local, masks, local_align_res)
    )
    xyz_gt = jax.lax.stop_gradient(prepare_roe(gt_local, masks, local_align_res))
    xyz_w = jax.lax.stop_gradient(
        prepare_roe(weights[..., None], masks, local_align_res)
    )[..., 0]
    scale = align_points_scale(xyz_pred, xyz_gt, xyz_w)
    scale = jnp.abs(scale)  # flip non-positive solutions (reference :140)
    scale = jax.lax.stop_gradient(scale)

    aligned = scale[:, None, None, None, None] * pred_local

    mw = masks.astype(jnp.float32)
    denom = 3.0 * jnp.sum(mw) + 1e-12
    l1 = jnp.abs(aligned - gt_local) * weights[..., None]
    local_pts_loss = jnp.sum(l1 * mw[..., None]) / denom

    details = {"local_pts_loss": local_pts_loss}
    loss = local_pts_loss

    nl_per_batch = normal_loss(aligned, gt_local, masks)  # (B,)
    if normal_batch_mask is None:
        nl = jnp.mean(nl_per_batch)
    else:
        nb = normal_batch_mask.astype(jnp.float32)
        nl = jnp.sum(nl_per_batch * nb) / jnp.maximum(jnp.sum(nb), 1.0)
    loss = loss + nl
    details["normal_loss"] = nl

    if pred.get("global_points") is not None:
        pred_global = pred["global_points"].astype(jnp.float32) * scale[
            :, None, None, None, None
        ]
        gt_global = gt["global_points"].astype(jnp.float32)
        g_l1 = jnp.abs(pred_global - gt_global) * weights[..., None]
        global_pts_loss = jnp.sum(g_l1 * mw[..., None]) / denom
        loss = loss + global_pts_loss
        details["global_pts_loss"] = global_pts_loss

    if pred.get("conf") is not None and "conf_target_thresh" in gt:
        # BCE confidence loss (reference pi3_loss.py:146-163); the sky-mask
        # term needs the SegFormer output supplied in gt["sky_mask"].
        conf = pred["conf"][..., 0].astype(jnp.float32)
        per_px = jnp.sum(l1, axis=-1) / 3.0
        target = (per_px < gt["conf_target_thresh"]).astype(jnp.float32)
        bce = jnp.maximum(conf, 0) - conf * target + jnp.log1p(jnp.exp(-jnp.abs(conf)))
        conf_loss = jnp.sum(bce * mw) / (jnp.sum(mw) + 1e-12)
        if "sky_mask" in gt:
            sky = gt["sky_mask"] & ~masks
            sw = sky.astype(jnp.float32)
            sky_bce = jnp.maximum(conf, 0) + jnp.log1p(jnp.exp(-jnp.abs(conf)))
            conf_loss = conf_loss + jnp.sum(sky_bce * sw) / jnp.maximum(
                jnp.sum(sw), 1.0
            )
        loss = loss + 0.05 * conf_loss
        details["local_conf_loss"] = conf_loss

    return loss, details, scale


# ---------------------------------------------------------------------------
# camera loss (reference CameraLoss, pi3_loss.py:194-251)
# ---------------------------------------------------------------------------

def rotation_angle_error(r, r_gt, eps=1e-6):
    residual = jnp.swapaxes(r, -1, -2) @ r_gt
    trace = jnp.trace(residual, axis1=-2, axis2=-1)
    cosine = (trace - 1) / 2
    return jnp.arccos(jnp.clip(cosine, -1.0 + eps, 1.0 - eps))


def huber(x, y, delta: float):
    """torch.nn.functional.huber_loss element-wise (no delta normalization)."""
    d = jnp.abs(x - y)
    return jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta))


def camera_loss(pred_poses, gt_poses, scale, alpha: float = 100.0):
    """All-pairs relative pose loss. pred/gt (B, N, 4, 4), scale (B,)."""
    b, n = pred_poses.shape[:2]
    pred = pred_poses.astype(jnp.float32)
    pred = pred.at[..., :3, 3].multiply(scale[:, None, None])
    gt = gt_poses.astype(jnp.float32)

    pred_rel = jnp.einsum(
        "bnij,bmjk->bnmik", se3_inverse(pred), pred
    )
    gt_rel = jnp.einsum("bnij,bmjk->bnmik", se3_inverse(gt), gt)

    off_diag = ~jnp.eye(n, dtype=bool)
    m = off_diag[None, :, :].astype(jnp.float32)
    cnt = max(b * n * (n - 1), 1)  # n==1 has no pairs -> zero loss

    t_err = huber(pred_rel[..., :3, 3], gt_rel[..., :3, 3], delta=0.1)
    trans_loss = jnp.sum(t_err * m[..., None]) / (cnt * 3)

    r_err = rotation_angle_error(pred_rel[..., :3, :3], gt_rel[..., :3, :3])
    rot_loss = jnp.sum(r_err * m) / cnt

    total = alpha * trans_loss + rot_loss
    return total, {"trans_loss": trans_loss, "rot_loss": rot_loss}


# ---------------------------------------------------------------------------
# Pi3Loss (reference pi3_loss.py:257-356)
# ---------------------------------------------------------------------------

def prepare_gt(gt_raw: Dict) -> Dict:
    """World-frame GT -> first-camera frame + unit mean distance (reference
    Pi3Loss.prepare_gt :265-313; the bf16 casts of norm_factor there are an
    autocast artifact we keep in fp32)."""
    gt_pts = gt_raw["world_points"].astype(jnp.float32)
    masks = gt_raw["point_masks"]
    poses = gt_raw["extrinsics"].astype(jnp.float32)
    b, n = gt_pts.shape[:2]

    w2c0 = se3_inverse(poses[:, 0])
    gt_pts = jnp.einsum("bij,bnhwj->bnhwi", w2c0, homogenize_points(gt_pts))[..., :3]
    poses = jnp.einsum("bij,bnjk->bnik", w2c0, poses)

    mw = masks.astype(jnp.float32)
    dist = safe_norm(gt_pts * mw[..., None], axis=-1)
    norm_factor = jnp.sum(dist, axis=(1, 2, 3)) / (
        jnp.sum(mw, axis=(1, 2, 3)) + 1e-8
    )
    valid_batch = jnp.sum(mw, axis=(1, 2, 3)) > 0
    norm_factor = jnp.where(valid_batch, norm_factor, 1.0)
    gt_pts = gt_pts / norm_factor[:, None, None, None, None]
    poses = poses.at[..., :3, 3].divide(norm_factor[:, None, None])

    extr = se3_inverse(poses)
    gt_local = jnp.einsum("bnij,bnhwj->bnhwi", extr, homogenize_points(gt_pts))[
        ..., :3
    ]
    return dict(
        global_points=gt_pts,
        local_points=gt_local,
        valid_masks=masks,
        camera_poses=poses,
    )


def normalize_pred(pred: Dict, masks: jax.Array) -> Dict:
    """Scale predictions to unit mean valid-point distance (reference
    Pi3Loss.normalize_pred :315-337)."""
    local = pred["local_points"].astype(jnp.float32)
    mw = masks.astype(jnp.float32)
    dist = safe_norm(local * mw[..., None], axis=-1)
    norm_factor = jnp.sum(dist, axis=(1, 2, 3)) / (
        jnp.sum(mw, axis=(1, 2, 3)) + 1e-8
    )
    nf = norm_factor[:, None, None, None, None]
    out = dict(pred)
    out["local_points"] = local / nf
    if pred.get("global_points") is not None:
        out["global_points"] = pred["global_points"].astype(jnp.float32) / nf
    poses = pred["camera_poses"].astype(jnp.float32)
    out["camera_poses"] = poses.at[..., :3, 3].divide(
        norm_factor[:, None, None]
    )
    return out


def pi3_loss(
    pred: Dict,
    gt_raw: Dict,
    normal_batch_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict]:
    """Full loss: point + 0.2 * camera (reference Pi3Loss.forward :339-356)."""
    gt = prepare_gt(gt_raw)
    # conf supervision extras pass straight through (reference computes them
    # inside PointLoss from gt['imgs'], pi3_loss.py:146-163)
    for k in ("conf_target_thresh", "sky_mask"):
        if k in gt_raw:
            gt[k] = gt_raw[k]
    pred = normalize_pred(pred, gt["valid_masks"])

    p_loss, details, scale = point_loss(pred, gt, normal_batch_mask)
    c_loss, c_details = camera_loss(
        pred["camera_poses"], gt["camera_poses"], scale
    )
    details.update(c_details)
    return p_loss + 0.2 * c_loss, details
