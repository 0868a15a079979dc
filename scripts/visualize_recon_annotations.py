#!/usr/bin/env python
"""Point-cloud sanity visualizer for recon JSONL annotations (reference
data/preprocessing/points_visualize_scannet.py / points_visualize_scannetpp.py:
sample frames from one annotation row, unproject depth to world points, and
write a colored PLY to eyeball alignment).

Uses the SAME loading path as training (JsonlReconDataset frame records +
depth_to_world_points), so what this draws is what the point loss sees.

  python scripts/visualize_recon_annotations.py --jsonl ann.jsonl \
      [--row 0] [--frames 8] [--stride 1] [--out scene.ply]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from g2vlm_tpu.data.recon_dataset import depth_to_world_points, load_depth
from g2vlm_tpu.utils.ply import write_ply


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", required=True)
    ap.add_argument("--row", type=int, default=0)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--max_points_per_frame", type=int, default=50_000)
    ap.add_argument("--out", default="annotation_points.ply")
    args = ap.parse_args()

    with open(args.jsonl) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    item = rows[args.row]
    frames = item["frames"][:: args.stride][: args.frames]
    print(f"scene {item.get('scene_name')} seq {item.get('seq_name')}: "
          f"{len(frames)} of {len(item['frames'])} frames")

    rng = np.random.default_rng(0)
    all_pts, all_cols = [], []
    for fr in frames:
        depth = load_depth(fr["depth"], fr.get("depth_scale", 1000.0))
        K = np.asarray(fr["intrinsics"], np.float32)
        c2w = np.asarray(fr["extrinsics"], np.float32)
        pts, valid = depth_to_world_points(depth, K, c2w)
        pts = pts[valid]
        try:
            from PIL import Image

            img = np.asarray(Image.open(fr["image"]).convert("RGB"))
            if img.shape[:2] != depth.shape:
                img = np.asarray(
                    Image.fromarray(img).resize(
                        (depth.shape[1], depth.shape[0])
                    )
                )
            cols = img[valid]
        except Exception:
            cols = np.full((len(pts), 3), 200, np.uint8)
        if len(pts) > args.max_points_per_frame:
            sel = rng.choice(len(pts), args.max_points_per_frame, replace=False)
            pts, cols = pts[sel], cols[sel]
        all_pts.append(pts)
        all_cols.append(cols)

    pts = np.concatenate(all_pts)
    cols = np.concatenate(all_cols)
    write_ply(args.out, pts, cols)
    bbox = pts.min(0), pts.max(0)
    print(f"wrote {args.out}: {len(pts)} points, bbox {bbox[0]} .. {bbox[1]}")


if __name__ == "__main__":
    main()
