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


RESNET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
RESNET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _e2e_make_iter(wid: int):
    """Production-shape producer: 8-view recon samples at 294x518 -> one
    9216-token pack. Per view, the real host work the dataset does after
    jpeg decode: bicubic resize from a 480x640 'decoded frame' + RESNET
    normalize (recon_dataset.py crop/resize path), then SequencePacker
    add_sample/to_batch. Module-level so ProcessPrefetchLoader can pickle it."""
    from PIL import Image

    from g2vlm_tpu.csrc import crop_resize_u8
    from g2vlm_tpu.data.packing import PackerConfig, SequencePacker

    ids = dict(
        bos_token_id=7, eos_token_id=8, start_of_image=11, end_of_image=12
    )
    h, w = 294, 518
    hp, wp = h // 14, w // 14
    per_view = hp * wp + 2
    pcfg = PackerConfig(
        expected_num_tokens=9216,
        max_num_tokens_per_sample=8 * per_view + 64,
        max_num_tokens=10240,
        max_ce_slots=64,
        dino_patch_size=14,
    )
    rng = np.random.default_rng(1000 + wid)
    frame = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
    i = 0
    while True:
        packer = SequencePacker(pcfg, ids)
        toks = 0
        while packer.curr + 8 * per_view + 8 < pcfg.expected_num_tokens:
            views = []
            for _ in range(8):
                # the real recon path: uint8 crop+resize here; /255 ->
                # cojitter -> RESNET normalize happen in the packer's
                # to_batch (the reference order, dataset_base.py:262-289)
                arr = crop_resize_u8(frame, None, (w, h), "bicubic")
                if arr is None:  # no toolchain: PIL fallback
                    arr = np.asarray(
                        Image.fromarray(frame).resize(
                            (w, h), Image.Resampling.BICUBIC
                        ),
                        np.uint8,
                    )
                views.append(
                    dict(
                        image=arr,
                        world_points=np.zeros((h, w, 3), np.float32),
                        point_masks=np.ones((h, w), bool),
                        extrinsics=np.eye(4, dtype=np.float32),
                    )
                )
            s = dict(
                plan=[{"type": "text"}, *[{"type": "dino_image"}] * 8],
                text_ids_list=[[5, 6, 9]],
                dino_views=views,
                num_tokens=3 + 8 * per_view,
            )
            packer.add_sample(s, pyrandom.Random(i))
            toks += s["num_tokens"]
            i += 1
        batch = packer.to_batch(pyrandom.Random(0))
        yield toks, batch


def bench_e2e(workers: int, seconds: float):
    """Aggregate packed-token throughput through ProcessPrefetchLoader — the
    number that must exceed the chips' training consumption (measured 4.1k
    tok/s/chip at the recon stage => a v5e-8 host needs ~33k tok/s
    aggregate). Producers are PROCESSES: the pure-Python packing stage does
    not scale in threads (GIL)."""
    from g2vlm_tpu.train.dataloader import ProcessPrefetchLoader

    loader = ProcessPrefetchLoader(_e2e_make_iter, num_workers=workers,
                                   prefetch=2 * workers)
    it = iter(loader)
    next(it)  # warm: process spawn + first pack
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        toks, _ = next(it)
        n += toks
    dt = time.perf_counter() - t0
    loader.close()
    print(f"e2e pack pipeline ({workers:2d} proc)     {n / dt:10.1f} tok/s",
          flush=True)
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--workers", type=int, nargs="*", default=None,
                    help="e2e multi-process pipeline bench: aggregate "
                         "packed tok/s for each worker count (e.g. "
                         "--workers 1 2 4 8)")
    args = ap.parse_args()

    if args.workers:
        for n in args.workers:
            bench_e2e(n, args.seconds)
        return

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

    rate("vit preprocess PIL (480x640)", vit_one, args.seconds, "img")

    # --- csrc fused vit preprocess (training path; G2VLM_NATIVE_VIT) ---
    from g2vlm_tpu.data.vit_preprocess import preprocess_vit_image_fast

    def vit_fast_one():
        preprocess_vit_image_fast(img_arr)
        return 1

    rate("vit preprocess csrc (480x640)", vit_fast_one, args.seconds, "img")

    # --- frame sampling: extrinsic-distance ranking over a 512-frame clip ---
    exts = np.tile(np.eye(4, dtype=np.float32), (512, 1, 1))
    exts[:, :3, 3] = rng.random((512, 3)).astype(np.float32)

    def sample_one():
        compute_ranking(exts)
        return 512

    rate("frame ranking (512 frames)", sample_one, args.seconds, "frame")


if __name__ == "__main__":
    main()
