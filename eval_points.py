#!/usr/bin/env python
"""Point-map evaluation harness: scale-aligned point errors of multi-view
reconstruction against GT depth/pose annotations (the quantitative eval the
reference leaves to its external paper).

Metrics per scene, after the same scale alignment the training loss uses
(weighted-L1 optimal scale, train/loss.align_points_scale):
  * local-abs-rel : mean |s*pred - gt| / |gt| over valid pixels (camera frame)
  * world-rmse    : RMSE of aligned world points in the first-camera frame

  python eval_points.py --jsonl scenes.jsonl --model_path ... --num_views 8
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", type=str, default=None,
                    help="annotated scenes (JsonlReconDataset row format); "
                    "omit with --tiny to use a synthetic scene")
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--num_views", type=int, default=8)
    ap.add_argument("--max_scenes", type=int, default=0)
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--new_width", type=int, default=None,
                    help="resize width (default 518; 140 under --tiny)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random-weight config (harness smoke)")
    ap.add_argument("--pseudo_gt_npz", type=str, default=None,
                    help="reference output cache (parity_fullsize --ref_cache"
                         ") whose world points serve as pseudo-GT (no depth "
                         "annotations exist for the bundled example scenes)")
    ap.add_argument("--pred_npz", type=str, default=None,
                    help="score saved predictions (parity --out_cache) "
                         "against --pseudo_gt_npz instead of running the "
                         "model")
    args = ap.parse_args()

    if args.pseudo_gt_npz:
        if not args.pred_npz:
            ap.error("--pseudo_gt_npz currently requires --pred_npz")
        import os

        import numpy as np

        # pure host-side scoring — never grab the TPU for this
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        from g2vlm_tpu.train.loss import align_points_scale
        import jax.numpy as jnp

        ref = dict(np.load(args.pseudo_gt_npz))
        pred_c = dict(np.load(args.pred_npz))
        gt = np.asarray(ref["points"], np.float32)[None]
        pred = np.asarray(pred_c["points"], np.float32)[None]
        assert gt.shape == pred.shape, (gt.shape, pred.shape)
        w = np.ones((1, gt[0, ..., 0].size), np.float32)
        scale = np.asarray(
            align_points_scale(
                jnp.asarray(pred.reshape(1, -1, 3)),
                jnp.asarray(gt.reshape(1, -1, 3)),
                jnp.asarray(w),
            )
        )[0]
        diff = np.linalg.norm(abs(scale) * pred[0] - gt[0], axis=-1)
        norm = np.linalg.norm(gt[0], axis=-1)
        print(f"views={gt.shape[1]} scale={scale:.6f}")
        print(f"local-abs-rel: {np.mean(diff / np.maximum(norm, 1e-6)):.6f}")
        print(f"world-rmse:    {np.sqrt(np.mean(diff ** 2)):.6f}")
        return

    if args.jsonl is None:
        if not args.tiny:
            ap.error("--jsonl is required (or pass --tiny for a synthetic scene)")
        import tempfile

        from g2vlm_tpu.data.synthetic import make_tiny_scene_jsonl

        args.jsonl = make_tiny_scene_jsonl(tempfile.mkdtemp(prefix="g2vlm_tiny_"))
    if args.new_width is None:
        args.new_width = 140 if args.tiny else 518

    import numpy as np
    import jax
    import jax.numpy as jnp

    from g2vlm_tpu.utils.jax_cache import enable as _cache, honor_platform_env

    honor_platform_env()
    _cache()

    from g2vlm_tpu.config import G2VLMConfig
    from g2vlm_tpu.data.recon_dataset import depth_to_world_points, load_depth
    from g2vlm_tpu.inference.pipeline import G2VLMPipeline
    from g2vlm_tpu.models import g2vlm as jg
    from g2vlm_tpu.train.loss import align_points_scale
    from g2vlm_tpu.utils.geometry import homogenize_points, se3_inverse
    from g2vlm_tpu.utils.image import resize_hw

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    tokenizer = new_token_ids = None
    if args.model_path:
        from g2vlm_tpu.weights import load_checkpoint
        from g2vlm_tpu.data.tokenizer import load_tokenizer

        params, cfg = load_checkpoint(args.model_path)
        tokenizer, new_token_ids, _ = load_tokenizer(args.model_path)
    else:
        print("no --model_path: random weights (harness smoke mode)")
        if args.tiny:
            from g2vlm_tpu.config import tiny_test_config

            cfg = tiny_test_config()
        else:
            cfg = G2VLMConfig(visual_und=False)
        params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    pipe = G2VLMPipeline(
        params, cfg, tokenizer=tokenizer, new_token_ids=new_token_ids,
        compute_dtype=dtype,
    )

    abs_rels, rmses = [], []
    n_scenes = 0
    with open(args.jsonl) as f:
        for line in f:
            if not line.strip():
                continue
            item = json.loads(line)
            frames = item["frames"][: args.num_views]
            if len(frames) < 2 or not all(fr.get("depth") for fr in frames):
                continue
            out = pipe.recon(
                [fr["image"] for fr in frames], new_width=args.new_width
            )
            pred_pts = np.asarray(out["points"], np.float32)  # (N, h, w, 3)
            n, ph, pw, _ = pred_pts.shape

            # GT world points in the first-camera frame, resized to pred res
            w2c0 = np.asarray(
                se3_inverse(jnp.asarray(frames[0]["extrinsics"], jnp.float32))
            )
            gts, masks = [], []
            for fr in frames:
                depth = load_depth(fr["depth"], fr.get("depth_scale", 1000.0))
                pts, valid = depth_to_world_points(
                    depth,
                    np.asarray(fr["intrinsics"], np.float32),
                    np.asarray(fr["extrinsics"], np.float32),
                )
                pts = pts @ w2c0[:3, :3].T + w2c0[:3, 3]
                pts_r = np.asarray(
                    resize_hw(
                        jnp.asarray(pts.transpose(2, 0, 1)), (ph, pw),
                        method="bilinear", antialias=True,
                    )
                ).transpose(1, 2, 0)
                valid_r = (
                    np.asarray(
                        resize_hw(
                            jnp.asarray(valid[None].astype(np.float32)),
                            (ph, pw), method="bilinear", antialias=True,
                        )
                    )[0]
                    > 0.99
                )
                gts.append(pts_r)
                masks.append(valid_r)
            gt = np.stack(gts)[None]
            mask = np.stack(masks)[None]
            pred = pred_pts[None]

            w = np.ones(mask.shape[1:]).reshape(1, -1)
            scale = np.asarray(
                align_points_scale(
                    jnp.asarray(pred.reshape(1, -1, 3) * mask.reshape(1, -1, 1)),
                    jnp.asarray(gt.reshape(1, -1, 3) * mask.reshape(1, -1, 1)),
                    jnp.asarray(w * mask.reshape(1, -1)),
                )
            )[0]
            aligned = abs(scale) * pred
            m = mask[0]
            diff = np.linalg.norm(aligned[0] - gt[0], axis=-1)[m]
            norm = np.linalg.norm(gt[0], axis=-1)[m]
            abs_rels.append(float(np.mean(diff / np.maximum(norm, 1e-6))))
            rmses.append(float(np.sqrt(np.mean(diff ** 2))))
            n_scenes += 1
            if args.max_scenes and n_scenes >= args.max_scenes:
                break

    print(f"scenes={n_scenes}")
    print(f"local-abs-rel: {np.mean(abs_rels):.4f}")
    print(f"world-rmse:    {np.mean(rmses):.4f}")


if __name__ == "__main__":
    main()
