"""Native C++ data-path kernels vs their Python fallbacks."""

import numpy as np
import pytest

from g2vlm_tpu import csrc
from g2vlm_tpu.data.recon_dataset import depth_to_world_points


@pytest.fixture(scope="module")
def lib():
    lib = csrc.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain")
    return lib


def test_depth_unproject_native(lib, rng):
    depth = (rng.random((37, 42)) * 3).astype(np.float32)
    depth[0, 0] = 0.0
    intr = np.array([[100.0, 0, 21], [0, 90.0, 18], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.2, -0.1, 0.4]
    pts, valid = csrc.depth_unproject(depth, intr, c2w)
    ref_pts, ref_valid = depth_to_world_points(depth, intr, c2w)
    np.testing.assert_allclose(pts, ref_pts, atol=1e-4, rtol=1e-5)
    np.testing.assert_array_equal(valid, ref_valid)


def test_resize_bilinear_native(lib, rng):
    import torch

    src = rng.random((30, 44)).astype(np.float32)
    out = csrc.resize_bilinear(src, (17, 23))
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(src)[None, None], (17, 23),
            mode="bilinear", align_corners=False,
        )
        .numpy()[0, 0]
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_build_sequence_metadata_matches_python(lib):
    """Native metadata builder == models/g2vlm.SequenceBuilder for a recon-
    style layout (text + 2 dino views)."""
    from g2vlm_tpu import csrc
    from g2vlm_tpu.models.g2vlm import SequenceBuilder

    soi, eoi = 11, 12
    prompt = [7, 23, 45]
    b = SequenceBuilder(soi, eoi)
    b.add_text(prompt)
    b.add_dino_images(2, 4, 3)
    py = b.build(pad_to=64)

    segs = np.asarray(
        [[0, len(prompt), 0, 0], [1, 4, 3, 0], [1, 4, 3, 0]], np.int32
    )
    nat = csrc.build_sequence_metadata(
        segs, 64, dino_fn=0, fn_start=1, soi=soi, eoi=eoi
    )
    np.testing.assert_array_equal(nat["doc_id"], py.doc_id)
    np.testing.assert_array_equal(nat["fn_id"], py.fn_id)
    np.testing.assert_array_equal(nat["pos"], py.pos)
    np.testing.assert_array_equal(nat["position_ids"], py.position_ids)
    np.testing.assert_array_equal(nat["is_geo"], py.is_geo)
    np.testing.assert_array_equal(nat["dino_indexes"], py.dino_indexes)
    np.testing.assert_array_equal(nat["text_indexes"], py.text_indexes)
    # fill caller slots and compare ids
    ids = nat["text_ids"].copy()
    ids[ids == -1] = prompt
    np.testing.assert_array_equal(ids, py.text_ids)
    assert nat["seq_len"] == py.seq_len
    assert nat["next_rope_pos"] == py.next_rope_pos


def test_vit_preprocess_native_matches_python(lib, rng):
    """Fused C++ preprocess (resize+normalize+patch rows) vs the PIL+numpy
    chain. The C++ path float-accumulates where PIL quantizes to uint8
    between passes, so agreement is ~1/255 pre-normalize (≈0.016 in CLIP-
    normalized units) — the training-path noise floor, far under cojitter."""
    from g2vlm_tpu.data.vit_preprocess import preprocess_vit_image

    img = (rng.random((300, 400, 3)) * 255).astype(np.uint8)
    ref_rows, ref_grid = preprocess_vit_image(img, target_hw=(112, 112))
    got_rows, got_grid = csrc.vit_preprocess(img, target_hw=(112, 112))
    assert got_grid == tuple(ref_grid)
    assert got_rows.shape == ref_rows.shape
    err = np.abs(got_rows - ref_rows).max()
    assert err < 3.5 / 255.0 / 0.26, f"max abs err {err}"  # ~3 uint8 steps
    # same merge-group row ordering: correlation per row must be ~1
    corr = np.sum(got_rows * ref_rows) / np.sqrt(
        np.sum(got_rows**2) * np.sum(ref_rows**2)
    )
    assert corr > 0.9999


def test_vit_preprocess_fast_dispatch(rng):
    """preprocess_vit_image_fast returns the same shapes through either
    backend and respects the opt-out env."""
    import os

    from g2vlm_tpu.data.vit_preprocess import preprocess_vit_image_fast

    img = (rng.random((150, 200, 3)) * 255).astype(np.uint8)
    rows, grid = preprocess_vit_image_fast(img, target_hw=(112, 112))
    os.environ["G2VLM_NATIVE_VIT"] = "0"
    try:
        rows2, grid2 = preprocess_vit_image_fast(img, target_hw=(112, 112))
    finally:
        os.environ.pop("G2VLM_NATIVE_VIT")
    assert rows.shape == rows2.shape and tuple(grid) == tuple(grid2)
    assert np.abs(rows - rows2).max() < 3.5 / 255.0 / 0.26


def test_crop_resize_u8_matches_pil(lib, rng):
    """Native crop+resize vs PIL, both filters, up and down scale, with and
    without a crop window: PIL's 8bpc path runs int16 fixed-point, ours fp32,
    so outputs may differ by 1 LSB — never more."""
    from PIL import Image

    img = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    cases = [
        (None, (110, 64), "bicubic", Image.Resampling.BICUBIC),
        (None, (110, 64), "lanczos", Image.Resampling.LANCZOS),
        (None, (220, 180), "bicubic", Image.Resampling.BICUBIC),
        ((13, 7, 150, 110), (96, 56), "lanczos", Image.Resampling.LANCZOS),
    ]
    for box, out_wh, filt, pilf in cases:
        pim = Image.fromarray(img)
        if box is not None:
            pim = pim.crop(box)
        ref = np.asarray(pim.resize(out_wh, pilf))
        got = csrc.crop_resize_u8(img, box, out_wh, filt)
        assert got.shape == ref.shape
        d = np.abs(ref.astype(int) - got.astype(int))
        assert d.max() <= 1, (box, out_wh, filt, d.max())


def test_crop_resize_u8_oob_crop_falls_back():
    """Out-of-bounds crops (PIL zero-pads) are not supported natively —
    the wrapper must return None so callers keep PIL semantics."""
    img = np.zeros((20, 20, 3), np.uint8)
    assert csrc.crop_resize_u8(img, (-2, 0, 10, 10), (8, 8)) is None
    assert csrc.crop_resize_u8(img, (0, 0, 25, 10), (8, 8)) is None


def test_color_jitter_native_matches_numpy(lib, rng):
    """Fused native ColorJitter vs the numpy fallback over many seeds (covers
    every op order, the jitter/grayscale gates, and the hue HSV round-trip).
    RNG draws happen before the dispatch so both paths see identical factors."""
    from g2vlm_tpu.data import augment

    x = rng.random((3, 48, 72)).astype(np.float32)
    orig = csrc.color_jitter
    try:
        for seed in range(24):
            a = augment.random_color_augmentation(
                x, np.random.default_rng(seed)
            )
            csrc.color_jitter = lambda *a_, **k_: None  # force numpy body
            b = augment.random_color_augmentation(
                x, np.random.default_rng(seed)
            )
            csrc.color_jitter = orig
            np.testing.assert_allclose(a, b, atol=2e-6, err_msg=f"seed {seed}")
    finally:
        csrc.color_jitter = orig


def test_packer_normalizes_dino_images(rng):
    """to_batch output must be RESNET-normalized (the reference order:
    /255 -> cojitter -> normalize, dataset_base.py:262-289) — TrainBatch
    consumes dino_images normalized."""
    import random as pyrandom

    from g2vlm_tpu.data.images import RESNET_MEAN, RESNET_STD
    from g2vlm_tpu.data.packing import PackerConfig, SequencePacker

    ids = dict(bos_token_id=7, eos_token_id=8, start_of_image=11,
               end_of_image=12)
    h = w = 28
    cfg = PackerConfig(
        expected_num_tokens=64, max_num_tokens_per_sample=64,
        max_num_tokens=128, max_ce_slots=8, dino_patch_size=14,
        cojitter_prob=0.0,
    )
    packer = SequencePacker(cfg, ids)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    views = [dict(image=img,
                  world_points=np.zeros((h, w, 3), np.float32),
                  point_masks=np.ones((h, w), bool),
                  extrinsics=np.eye(4, dtype=np.float32))]
    s = dict(plan=[{"type": "text"}, {"type": "dino_image"}],
             text_ids_list=[[5]], dino_views=views, num_tokens=1 + 6)
    packer.add_sample(s, pyrandom.Random(0))
    batch = packer.to_batch(None)  # rng None: no aug -> exact normalize check
    expect = (img.astype(np.float32) / 255.0 - RESNET_MEAN) / RESNET_STD
    np.testing.assert_allclose(
        batch["dino_images"][0], expect.transpose(2, 0, 1), atol=1e-6
    )
