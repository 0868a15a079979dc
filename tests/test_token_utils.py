"""Token/position utilities parity vs reference data_utils.py."""

import numpy as np
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.data import token_utils as tu


def test_patchify_parity(rng):
    from data.data_utils import patchify as ref_patchify

    img = rng.standard_normal((3, 28, 42)).astype(np.float32)
    ref = ref_patchify(torch.from_numpy(img), 14).numpy()
    got = tu.patchify(img, 14)
    np.testing.assert_array_equal(got, ref)


def test_flattened_position_ids_parity():
    from data.data_utils import (
        get_flattened_position_ids_extrapolate as ref_ex,
        get_flattened_position_ids_interpolate as ref_in,
    )

    for h, w in [(56, 84), (28, 28), (140, 70)]:
        np.testing.assert_array_equal(
            tu.get_flattened_position_ids_extrapolate(h, w, 14, 37),
            ref_ex(h, w, 14, 37).numpy(),
        )
        np.testing.assert_array_equal(
            tu.get_flattened_position_ids_interpolate(h, w, 14, 37),
            ref_in(h, w, 14, 37).numpy(),
        )


def test_rope_index_3d_parity():
    from data.data_utils import (
        get_rope_index_image_3D as ref_vit,
        get_rope_index_image_3D_dino as ref_dino,
    )

    grid = torch.tensor([1, 6, 8])
    ref_pos, ref_delta = ref_dino(grid, 17)
    got_pos, got_delta = tu.get_rope_index_image_3d((1, 6, 8), 17, merge=1)
    np.testing.assert_array_equal(got_pos, ref_pos.numpy())
    assert got_delta == int(ref_delta)

    ref_pos, ref_delta = ref_vit(grid, 5)
    got_pos, got_delta = tu.get_rope_index_image_3d((1, 6, 8), 5, merge=2)
    np.testing.assert_array_equal(got_pos, ref_pos.numpy())
    assert got_delta == int(ref_delta)


def test_chat_template_parity():
    from data.data_utils import (
        apply_template_qwenvl2 as ref_t,
        apply_template_qwenvl2_reconThenUnd as ref_rt,
    )

    q = "Look at <vit_image> and <dino_image> here."
    a = "The answer."
    ref = ref_t(q, a)
    got = tu.apply_template_qwenvl2(q, a)
    assert [r["type"] for r in ref] == [
        {"vit": "vit", "dino": "dino", "text": "text"}[g["type"]]
        for g in got
    ]
    assert [r["value"] for r in ref] == [g["value"] for g in got]
    assert [bool(r["loss"]) for r in ref] == [g["loss"] for g in got]

    ref = ref_rt(q, a)
    got = tu.apply_template_qwenvl2_recon_then_und(q, a)
    assert [r["value"] for r in ref] == [g["value"] for g in got]
