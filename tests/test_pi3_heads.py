"""Parity: Pi3 decoder heads vs reference torch modules
(modeling/pi3/models/layers/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.config import Pi3HeadConfig
from g2vlm_tpu.models import pi3_heads as ph
from g2vlm_tpu.utils import geometry as geo


CFG = Pi3HeadConfig(depth=2, num_heads=4)
DIM = 64


def _rand(model):
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.08, 0.08)
    return model.eval()


def test_point_decoder_parity(rng):
    from pi3.models.layers.transformer_head import Pi3TransformerDecoder
    from pi3.models.layers.pos_embed import RoPE2D, PositionGetter

    torch.manual_seed(0)
    ref = _rand(
        Pi3TransformerDecoder(
            in_dim=DIM, dec_embed_dim=DIM, dec_num_heads=4, out_dim=48,
            depth=CFG.depth, rope=RoPE2D(freq=100.0),
        )
    )
    bn, hp, wp = 6, 3, 4
    hidden = rng.standard_normal((bn, hp * wp, DIM)).astype(np.float32)
    pos = PositionGetter()(bn, hp, wp, "cpu")
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(hidden.copy()), xpos=pos).numpy()

    params = ph.decoder_params_from_torch(ref.state_dict(), CFG.depth)
    jpos = ph.patch_positions(bn, hp, wp)
    np.testing.assert_array_equal(np.asarray(jpos), pos.numpy())
    got = ph.decoder_forward(params, jnp.asarray(hidden), jpos, CFG)
    np.testing.assert_allclose(np.asarray(got), out_ref, atol=1e-5, rtol=1e-4)


def test_global_points_decoder_parity(rng):
    from pi3.models.layers.transformer_head import Pi3ContextTransformerDecoder
    from pi3.models.layers.pos_embed import RoPE2D, PositionGetter

    torch.manual_seed(0)
    ref = _rand(
        Pi3ContextTransformerDecoder(
            in_dim=DIM, dec_embed_dim=DIM, dec_num_heads=4, out_dim=48,
            depth=CFG.depth, rope=RoPE2D(freq=100.0),
        )
    )
    bn, hp, wp = 4, 3, 4
    hidden = rng.standard_normal((bn, hp * wp, DIM)).astype(np.float32)
    ctx = rng.standard_normal((bn, hp * wp, DIM)).astype(np.float32)
    pos = PositionGetter()(bn, hp, wp, "cpu")
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(hidden.copy()),
            torch.from_numpy(ctx.copy()),
            xpos=pos,
            ypos=pos,
        ).numpy()

    params = ph.decoder_params_from_torch(ref.state_dict(), CFG.depth)
    jpos = ph.patch_positions(bn, hp, wp)
    got = ph.decoder_forward(
        params, jnp.asarray(hidden), jpos, CFG,
        context=jnp.asarray(ctx), context_positions=jpos,
    )
    np.testing.assert_allclose(np.asarray(got), out_ref, atol=1e-5, rtol=1e-4)


def test_linear_pts3d_parity(rng):
    from pi3.models.layers.transformer_head import Pi3LinearPts3d

    torch.manual_seed(0)
    p = 14
    ref = _rand(Pi3LinearPts3d(patch_size=p, dec_embed_dim=48, output_dim=3))
    b, hp, wp = 2, 3, 4
    h, w = hp * p, wp * p
    toks = rng.standard_normal((b, hp * wp, 48)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref([torch.from_numpy(toks.copy())], (h, w)).numpy()

    params = ph.pts3d_params_from_torch(ref.state_dict())
    got = ph.linear_pts3d(params, jnp.asarray(toks), (h, w), p)
    np.testing.assert_allclose(np.asarray(got), out_ref, atol=1e-5, rtol=1e-4)


def test_camera_head_parity(rng):
    from pi3.models.layers.camera_head import Pi3CameraHead

    torch.manual_seed(0)
    ref = _rand(Pi3CameraHead(dim=32))
    bn, hp, wp = 5, 3, 4
    feat = rng.standard_normal((bn, hp * wp, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(feat.copy()), hp, wp).numpy()

    params = ph.camera_head_params_from_torch(ref.state_dict())
    got = ph.camera_head(params, jnp.asarray(feat), hp, wp)
    np.testing.assert_allclose(np.asarray(got), out_ref, atol=1e-4, rtol=1e-3)
    # proper rotations
    rots = np.asarray(got)[:, :3, :3]
    np.testing.assert_allclose(np.linalg.det(rots), 1.0, atol=1e-5)


def test_geometry_utils_parity(rng):
    from pi3.utils.geometry import se3_inverse as ref_se3_inverse
    from pi3.utils.geometry import homogenize_points as ref_homogenize

    # random SE(3)
    r9 = rng.standard_normal((4, 9)).astype(np.float32)
    rot = np.asarray(ph.svd_orthogonalize(jnp.asarray(r9)))
    mats = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    mats[:, :3, :3] = rot
    mats[:, :3, 3] = rng.standard_normal((4, 3))
    ref_inv = ref_se3_inverse(torch.from_numpy(mats)).numpy()
    got_inv = np.asarray(geo.se3_inverse(jnp.asarray(mats)))
    np.testing.assert_allclose(got_inv, ref_inv, atol=1e-5, rtol=1e-4)

    pts = rng.standard_normal((2, 3, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(geo.homogenize_points(jnp.asarray(pts))),
        ref_homogenize(torch.from_numpy(pts)).numpy(),
    )


def test_stacked_decoder_matches_sequential(rng):
    """stacked_decoder_forward (point/camera/conf fused into one K-stacked
    scan) must equal running decoder_forward per decoder: the K-batched
    GEMMs are block-diagonal and attention never mixes views."""
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 3)
    plist = [
        ph.init_decoder_params(CFG, k, DIM, out)
        for k, out in zip(ks, (48, 32, 16))
    ]
    bn, hp, wp = 5, 3, 5  # 15 tokens -> exercises the 8-multiple pad path
    hidden = jnp.asarray(rng.standard_normal((bn, hp * wp, DIM)), jnp.float32)
    pos = ph.patch_positions(bn, hp, wp)

    seq = [ph.decoder_forward(p, hidden, pos, CFG) for p in plist]
    stk = ph.stacked_decoder_forward(plist, hidden, pos, CFG)
    for a, b in zip(seq, stk):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_stacked_decoder_grads(rng):
    """The stacked path must be differentiable (it runs in training too)."""
    key = jax.random.PRNGKey(4)
    plist = [
        ph.init_decoder_params(CFG, k, DIM, 8)
        for k in jax.random.split(key, 2)
    ]
    hidden = jnp.asarray(rng.standard_normal((2, 12, DIM)), jnp.float32)
    pos = ph.patch_positions(2, 3, 4)

    def loss(ps):
        outs = ph.stacked_decoder_forward(ps, hidden, pos, CFG, remat=True)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    g = jax.grad(loss)(plist)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
