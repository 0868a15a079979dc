#!/usr/bin/env python
"""Data-pipeline throughput bench (BASELINE.md config 5: preprocessing
throughput — augmentation + packing + frame sampling).

Host-side only (no accelerator): measures the stages that gate training
input rate. Reference equivalents: pack_sequence (dataset_base.py:392-638),
VGGT transforms (transforms_vggt.py), frame sampling (video utils).

  python scripts/bench_data.py [--seconds 5]
"""

import argparse
import os
import random as pyrandom
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rate(name, fn, seconds, unit):
    fn()  # warm
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        n += fn()
    dt = time.perf_counter() - t0
    print(f"{name:34s} {n / dt:10.1f} {unit}/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=5.0)
    args = ap.parse_args()

    from g2vlm_tpu.data.packing import PackerConfig, SequencePacker
    from g2vlm_tpu.data.corruption import motion_blur, shuffle_patch
    from g2vlm_tpu.data.augment import random_color_augmentation
    from g2vlm_tpu.data.frame_sampling import compute_ranking
    from g2vlm_tpu.data.vit_preprocess import preprocess_vit_image

    rng = np.random.default_rng(0)
    ids = dict(
        bos_token_id=7, eos_token_id=8, start_of_image=11, end_of_image=12
    )

    # --- packing: recon samples (4 views x 16 tokens) into 8k packs ---
    h = w = 56
    hp = wp = 4

    def recon_sample(s):
        r = np.random.default_rng(s)
        views = [
            dict(
                image=r.random((h, w, 3), dtype=np.float32),
                world_points=r.random((h, w, 3), dtype=np.float32),
                point_masks=np.ones((h, w), bool),
                extrinsics=np.eye(4, dtype=np.float32),
            )
            for _ in range(4)
        ]
        return dict(
            plan=[{"type": "text"}, *[{"type": "dino_image"}] * 4],
            text_ids_list=[[5, 6, 9]],
            dino_views=views,
            num_tokens=3 + 4 * (hp * wp + 2),
        )

    pcfg = PackerConfig(
        expected_num_tokens=2048,
        max_num_tokens_per_sample=1024,
        max_num_tokens=2304,
        max_ce_slots=64,
        dino_patch_size=14,
    )

    state = {"i": 0}

    def pack_one():
        packer = SequencePacker(pcfg, ids)
        toks = 0
        while packer.curr < pcfg.expected_num_tokens:
            s = recon_sample(state["i"])
            state["i"] += 1
            packer.add_sample(s, pyrandom.Random(state["i"]))
            toks += s["num_tokens"]
        packer.to_batch(pyrandom.Random(0))
        return toks

    rate("packing (recon samples -> pack)", pack_one, args.seconds, "tok")

    # --- corruption augs (reference transforms.py:205-377, PIL domain) ---
    from PIL import Image

    img518 = Image.fromarray(
        (rng.random((294, 518, 3)) * 255).astype(np.uint8)
    )

    def corrupt_one():
        motion_blur(img518, kernel_size=15, angle=float(state["i"] % 180))
        shuffle_patch(img518, num_splits=(4, 4))
        state["i"] += 1
        return 1

    rate("corruption augs (294x518)", corrupt_one, args.seconds, "img")

    # --- color jitter (VGGT cojitter augmentation) ---
    view = rng.random((3, 294, 518)).astype(np.float32)

    def cojitter_one():
        random_color_augmentation(view, np.random.default_rng(state["i"]))
        state["i"] += 1
        return 1

    rate("color aug (294x518)", cojitter_one, args.seconds, "view")

    # --- vit preprocessing (smart_resize + patchify) ---
    img_arr = (rng.random((480, 640, 3)) * 255).astype(np.uint8)

    def vit_one():
        preprocess_vit_image(img_arr)
        return 1

    rate("vit preprocess (480x640)", vit_one, args.seconds, "img")

    # --- frame sampling: extrinsic-distance ranking over a 512-frame clip ---
    exts = np.tile(np.eye(4, dtype=np.float32), (512, 1, 1))
    exts[:, :3, 3] = rng.random((512, 3)).astype(np.float32)

    def sample_one():
        compute_ranking(exts)
        return 512

    rate("frame ranking (512 frames)", sample_one, args.seconds, "frame")


if __name__ == "__main__":
    main()
