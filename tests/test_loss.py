"""Parity: JAX Pi3 loss vs reference Pi3Loss (modeling/pi3/models/pi3_loss.py)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.models.pi3_heads import svd_orthogonalize
from g2vlm_tpu.train import loss as jloss


def _rand_poses(rng, b, n):
    r9 = rng.standard_normal((b * n, 9)).astype(np.float32)
    rot = np.asarray(svd_orthogonalize(jnp.asarray(r9)))
    poses = np.tile(np.eye(4, dtype=np.float32), (b * n, 1, 1))
    poses[:, :3, :3] = rot
    poses[:, :3, 3] = rng.standard_normal((b * n, 3))
    return poses.reshape(b, n, 4, 4)


def _near_identity_poses(rng, b, n, rot_eps=0.05, t_eps=0.2):
    r9 = (np.tile(np.eye(3).reshape(9), (b * n, 1))
          + rng.standard_normal((b * n, 9)) * rot_eps).astype(np.float32)
    rot = np.asarray(svd_orthogonalize(jnp.asarray(r9)))
    poses = np.tile(np.eye(4, dtype=np.float32), (b * n, 1, 1))
    poses[:, :3, :3] = rot
    poses[:, :3, 3] = rng.standard_normal((b * n, 3)) * t_eps
    return poses.reshape(b, n, 4, 4)


@pytest.fixture
def case(rng):
    """Realistic geometry: positive depths, near-identity cameras — the
    weighted-median scale solver is discontinuous, so adversarial random GT
    (negative depths -> unbounded 1/z weights) would make the comparison
    ill-posed rather than test correctness."""
    b, n, h, w = 2, 3, 14, 14
    local = np.abs(rng.standard_normal((b, n, h, w, 3))).astype(np.float32) + 0.1
    world = np.stack(
        [
            rng.standard_normal((b, n, h, w)) * 0.5,
            rng.standard_normal((b, n, h, w)) * 0.5,
            rng.random((b, n, h, w)) * 2.5 + 0.5,
        ],
        axis=-1,
    ).astype(np.float32)
    glob = rng.standard_normal((b, n, h, w, 3)).astype(np.float32)
    masks = rng.random((b, n, h, w)) < 0.8
    pred = dict(
        local_points=local,
        camera_poses=_near_identity_poses(rng, b, n),
        global_points=glob,
        conf=None,
    )
    gt = dict(
        world_points=world,
        point_masks=masks,
        extrinsics=_near_identity_poses(rng, b, n),
        images=rng.random((b, n, 3, h, w)).astype(np.float32),
        view_infos=[f"scannet/seq{i}" for i in range(b * n)],
    )
    return pred, gt


def test_pi3_loss_parity(case):
    from pi3.models.pi3_loss import Pi3Loss

    pred, gt = case
    ref_loss_mod = Pi3Loss(train_conf=False)
    t = lambda x: torch.from_numpy(np.asarray(x).copy())
    pred_t = {
        k: (t(v) if v is not None else None) for k, v in pred.items()
    }
    gt_t = {k: (t(v) if isinstance(v, np.ndarray) else v) for k, v in gt.items()}
    with torch.no_grad(), torch_ref.fp32_casts():
        ref_total, ref_details = ref_loss_mod(pred_t, gt_t)

    pred_j = {
        k: (jnp.asarray(v) if v is not None else None) for k, v in pred.items()
    }
    gt_j = {
        "world_points": jnp.asarray(gt["world_points"]),
        "point_masks": jnp.asarray(gt["point_masks"]),
        "extrinsics": jnp.asarray(gt["extrinsics"]),
    }
    names = [gt["view_infos"][i * 3].split("/")[0] for i in range(2)]
    nb_mask = jnp.asarray(
        [
            nm in jloss.HIGH_QUALITY_DATASETS | jloss.MIDDLE_QUALITY_DATASETS
            for nm in names
        ]
    )
    total, details = jloss.pi3_loss(pred_j, gt_j, nb_mask)

    np.testing.assert_allclose(
        float(total), float(ref_total), atol=1e-4, rtol=1e-3
    )
    for k in ("local_pts_loss", "normal_loss", "global_pts_loss", "trans_loss",
              "rot_loss"):
        np.testing.assert_allclose(
            float(details[k]), float(ref_details[k]), atol=1e-4, rtol=1e-3,
            err_msg=k,
        )


def test_align_points_scale_parity(rng):
    from pi3.utils.alignment import align_points_scale as ref_align

    src = rng.standard_normal((4, 64, 3)).astype(np.float32)
    tgt = (src * 2.5 + rng.standard_normal((4, 64, 3)) * 0.1).astype(np.float32)
    w = rng.random((4, 64)).astype(np.float32)
    ref = ref_align(
        torch.from_numpy(src), torch.from_numpy(tgt), torch.from_numpy(w)
    ).numpy()
    got = np.asarray(
        jloss.align_points_scale(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def _conf_case(rng):
    """Like `case` but 32x32: the SegFormer's stage-1 spatial-reduction conv
    (kernel 8 at stride-4 resolution) needs >=32px inputs."""
    b, n, h, w = 2, 2, 32, 32
    local = np.abs(rng.standard_normal((b, n, h, w, 3))).astype(np.float32) + 0.1
    world = np.stack(
        [
            rng.standard_normal((b, n, h, w)) * 0.5,
            rng.standard_normal((b, n, h, w)) * 0.5,
            rng.random((b, n, h, w)) * 2.5 + 0.5,
        ],
        axis=-1,
    ).astype(np.float32)
    glob = rng.standard_normal((b, n, h, w, 3)).astype(np.float32)
    masks = rng.random((b, n, h, w)) < 0.8
    pred = dict(
        local_points=local,
        camera_poses=_near_identity_poses(rng, b, n),
        global_points=glob,
        conf=None,
    )
    gt = dict(
        world_points=world,
        point_masks=masks,
        extrinsics=_near_identity_poses(rng, b, n),
        images=rng.random((b, n, 3, h, w)).astype(np.float32),
        view_infos=[f"scannet/seq{i}" for i in range(b * n)],
    )
    return pred, gt


def test_pi3_loss_parity_with_conf(rng, monkeypatch):
    """Full conf chain vs reference Pi3Loss(train_conf=True): BCE target from
    the aligned L1, sky-gated zero-conf term from the frozen SegFormer
    (pi3_loss.py:146-163) — prepare_segformer monkeypatched to shared random
    CPU weights (the real .pth load + .cuda() is env-bound, pi3_loss.py:55-61).
    """
    from pi3.models.pi3_loss import Pi3Loss, PointLoss
    from pi3.models.segformer.model import EncoderDecoder

    from g2vlm_tpu.models import segformer as jseg

    torch.manual_seed(4)
    seg = EncoderDecoder().eval()
    with torch.no_grad():
        for p in seg.parameters():
            p.uniform_(-0.05, 0.05)
        for m in seg.modules():
            if hasattr(m, "running_mean"):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    monkeypatch.setattr(
        PointLoss, "prepare_segformer",
        lambda self: setattr(self, "segformer", seg),
    )

    pred, gt = _conf_case(rng)
    b, n, h, w = gt["point_masks"].shape
    pred = dict(pred, conf=rng.standard_normal((b, n, h, w, 1)).astype(np.float32))

    ref_loss_mod = Pi3Loss(train_conf=True)
    t = lambda x: torch.from_numpy(np.asarray(x).copy())
    pred_t = {k: (t(v) if v is not None else None) for k, v in pred.items()}
    gt_t = {k: (t(v) if isinstance(v, np.ndarray) else v) for k, v in gt.items()}
    with torch.no_grad(), torch_ref.fp32_casts():
        ref_total, ref_details = ref_loss_mod(pred_t, gt_t)

    # ours: the sky mask comes from OUR segformer on the same weights — the
    # exact in-train path (train/trainer.py conf branch)
    seg_params = jseg.params_from_torch(seg.state_dict())
    imgs = gt["images"].reshape(b * n, 3, h, w)
    sky = np.asarray(
        jseg.predict_sky_mask(seg_params, jnp.asarray(imgs))
    ).reshape(b, n, h, w)

    pred_j = {k: (jnp.asarray(v) if v is not None else None) for k, v in pred.items()}
    gt_j = {
        "world_points": jnp.asarray(gt["world_points"]),
        "point_masks": jnp.asarray(gt["point_masks"]),
        "extrinsics": jnp.asarray(gt["extrinsics"]),
        "conf_target_thresh": 0.02,
        "sky_mask": jnp.asarray(sky),
    }
    names = [gt["view_infos"][i * n].split("/")[0] for i in range(b)]
    nb_mask = jnp.asarray(
        [nm in jloss.HIGH_QUALITY_DATASETS | jloss.MIDDLE_QUALITY_DATASETS
         for nm in names]
    )
    total, details = jloss.pi3_loss(pred_j, gt_j, nb_mask)

    np.testing.assert_allclose(
        float(details["local_conf_loss"]),
        float(ref_details["local_conf_loss"]),
        atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        float(total), float(ref_total), atol=1e-4, rtol=1e-3
    )
