"""Alignment-solver family parity vs reference alignment.py."""

import numpy as np
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.utils import alignment as ja


def test_align_trunc_none(rng):
    from pi3.utils.alignment import align as ref_align

    x = rng.standard_normal((3, 64))
    y = 2.0 * x + rng.standard_normal((3, 64)) * 0.05
    w = rng.random((3, 64))
    ra, rl, _ = ref_align(torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(w))
    ga, gl, _ = ja.align(x, y, w)
    np.testing.assert_allclose(ga, ra.numpy(), atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(gl, rl.numpy(), atol=1e-6, rtol=1e-5)


def test_align_truncated(rng):
    from pi3.utils.alignment import align as ref_align

    x = np.abs(rng.standard_normal((2, 48))) + 0.1
    y = 1.5 * x + rng.standard_normal((2, 48)) * 0.1
    y[:, :5] *= 10  # outliers the truncation should ignore
    w = rng.random((2, 48)) + 0.1
    ra, rl, _ = ref_align(
        torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(w), trunc=0.5
    )
    ga, gl, _ = ja.align(x, y, w, trunc=0.5)
    np.testing.assert_allclose(gl, rl.numpy(), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(ga, ra.numpy(), atol=1e-6, rtol=1e-6)


def test_align_depth_affine(rng):
    from pi3.utils.alignment import align_depth_affine as ref_fn

    x = np.abs(rng.standard_normal((2, 40))) + 0.2
    y = 1.7 * x + 0.3 + rng.standard_normal((2, 40)) * 0.02
    w = rng.random((2, 40)) + 0.05
    rs, rsh = ref_fn(torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(w))
    gs, gsh = ja.align_depth_affine(x, y, w)
    np.testing.assert_allclose(gs, rs.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(gsh, rsh.numpy(), atol=1e-5, rtol=1e-5)


def test_align_affine_lstsq(rng):
    from pi3.utils.alignment import align_affine_lstsq as ref_fn

    x = rng.standard_normal((3, 50))
    y = 0.7 * x - 0.2 + rng.standard_normal((3, 50)) * 0.01
    ra, rb = ref_fn(torch.from_numpy(x), torch.from_numpy(y))
    ga, gb = ja.align_affine_lstsq(x, y)
    np.testing.assert_allclose(ga, ra.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(gb, rb.numpy(), atol=1e-5, rtol=1e-4)
