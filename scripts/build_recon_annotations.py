#!/usr/bin/env python
"""Build recon-dataset JSONL annotations from a directory tree of scenes.

Equivalent role to the reference's one-off preprocessing scripts
(data/preprocessing/process_tartanair.py etc.): scan scenes, pair RGB frames
with depth/pose/intrinsics files, and emit the JSONL rows JsonlReconDataset
consumes:

  {"scene_name": ..., "seq_name": ..., "frames": [
     {"image", "depth", "depth_scale", "extrinsics" (4x4 cam2world),
      "intrinsics" (3x3)}, ...]}

Expected scene layout (ScanNet-style, configurable via flags):
  <root>/<scene>/color/*.jpg  <root>/<scene>/depth/*.png
  <root>/<scene>/pose/*.txt   <root>/<scene>/intrinsic/intrinsic_depth.txt
"""

import argparse
import glob
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scene_name", default="scannet")
    ap.add_argument("--color_dir", default="color")
    ap.add_argument("--depth_dir", default="depth")
    ap.add_argument("--pose_dir", default="pose")
    ap.add_argument("--intrinsic_file", default="intrinsic/intrinsic_depth.txt")
    ap.add_argument("--depth_scale", type=float, default=1000.0)
    ap.add_argument("--max_frames", type=int, default=0)
    args = ap.parse_args()

    n_scenes = n_frames = 0
    with open(args.out, "w") as out:
        for scene in sorted(os.listdir(args.root)):
            sdir = os.path.join(args.root, scene)
            if not os.path.isdir(sdir):
                continue
            colors = sorted(
                glob.glob(os.path.join(sdir, args.color_dir, "*"))
            )
            if not colors:
                continue
            intr_path = os.path.join(sdir, args.intrinsic_file)
            intr = np.loadtxt(intr_path)[:3, :3] if os.path.exists(intr_path) else None
            frames = []
            for c in colors:
                stem = os.path.splitext(os.path.basename(c))[0]
                d = os.path.join(sdir, args.depth_dir, stem + ".png")
                p = os.path.join(sdir, args.pose_dir, stem + ".txt")
                if not (os.path.exists(d) and os.path.exists(p)):
                    continue
                pose = np.loadtxt(p)
                if pose.shape != (4, 4) or not np.isfinite(pose).all():
                    continue
                frames.append(
                    dict(
                        image=c,
                        depth=d,
                        depth_scale=args.depth_scale,
                        extrinsics=pose.tolist(),
                        intrinsics=(intr.tolist() if intr is not None else None),
                    )
                )
                if args.max_frames and len(frames) >= args.max_frames:
                    break
            if len(frames) >= 2:
                out.write(
                    json.dumps(
                        dict(
                            scene_name=args.scene_name,
                            seq_name=scene,
                            frames=frames,
                        )
                    )
                    + "\n"
                )
                n_scenes += 1
                n_frames += len(frames)
    print(f"wrote {n_scenes} scenes / {n_frames} frames to {args.out}")


if __name__ == "__main__":
    main()
