"""Factored-Adam optimizer (trainer.scale_by_factored_adam).

The claim under test: with factored second moments the update is EXACTLY
Adam whenever g^2 is rank-1 over the trailing two dims (Adafactor's
reconstruction v = r c / mean(r) is lossless there, Shazeer & Stern 2018
§3), and the state is ~0 bytes/param for nu. The reference has no
counterpart (its memory lever is CPU optimizer offload,
/root/reference/train/fsdp_utils.py:107-131)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from g2vlm_tpu.train import trainer


def _adam_updates(grads, params, steps, b1=0.9, b2=0.95, eps=1e-8):
    opt = optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0)
    s = opt.init(params)
    outs = []
    for g in grads:
        u, s = opt.update(g, s, params)
        outs.append(u)
    return outs


def test_rank1_grads_match_adam_exactly():
    """g = outer(a, b) each step => g^2 is rank-1 => factored v is exact
    and the update equals optax Adam's to fp32 roundoff."""
    rng = np.random.default_rng(0)
    p = {"w": jnp.zeros((256, 384), jnp.float32)}
    grads = []
    for i in range(4):
        a = rng.standard_normal((256, 1)).astype(np.float32)
        b = rng.standard_normal((1, 384)).astype(np.float32)
        grads.append({"w": jnp.asarray(a * b)})

    fopt = trainer.scale_by_factored_adam(b1=0.9, b2=0.95, eps=1e-8)
    fs = fopt.init(p)
    ref = _adam_updates(grads, p, 4)
    for i, g in enumerate(grads):
        fu, fs = fopt.update(g, fs, p)
        np.testing.assert_allclose(
            np.asarray(fu["w"]), np.asarray(ref[i]["w"]), rtol=2e-5, atol=2e-6
        )


def test_small_and_1d_leaves_use_full_nu():
    """Leaves below min_dim_size_to_factor keep an exact full fp32 nu —
    bit-for-bit Adam regardless of gradient structure."""
    rng = np.random.default_rng(1)
    p = {"b": jnp.zeros((64,), jnp.float32),
         "s": jnp.zeros((16, 16), jnp.float32)}
    grads = [
        {"b": jnp.asarray(rng.standard_normal(64).astype(np.float32)),
         "s": jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))}
        for _ in range(3)
    ]
    fopt = trainer.scale_by_factored_adam()
    fs = fopt.init(p)
    assert fs.nu_full["b"] is not None and fs.nu_row["b"] is None
    assert fs.nu_full["s"] is not None
    ref = _adam_updates(grads, p, 3)
    for i, g in enumerate(grads):
        fu, fs = fopt.update(g, fs, p)
        for k in p:
            np.testing.assert_allclose(
                np.asarray(fu[k]), np.asarray(ref[i][k]), rtol=1e-6, atol=1e-7
            )


def test_stacked_leading_axis_factored_per_slice():
    """(L, d1, d2) stacked-scan params (the MoT layout) factor the trailing
    two dims per leading slice: rank-1-per-slice grads reproduce Adam."""
    rng = np.random.default_rng(2)
    p = {"w": jnp.zeros((3, 128, 256), jnp.float32)}
    grads = []
    for _ in range(3):
        a = rng.standard_normal((3, 128, 1)).astype(np.float32)
        b = rng.standard_normal((3, 1, 256)).astype(np.float32)
        grads.append({"w": jnp.asarray(a * b)})
    fopt = trainer.scale_by_factored_adam()
    fs = fopt.init(p)
    assert fs.nu_row["w"].shape == (3, 128)
    assert fs.nu_col["w"].shape == (3, 256)
    ref = _adam_updates(grads, p, 3)
    for i, g in enumerate(grads):
        fu, fs = fopt.update(g, fs, p)
        np.testing.assert_allclose(
            np.asarray(fu["w"]), np.asarray(ref[i]["w"]), rtol=2e-5, atol=2e-6
        )


def test_general_grads_descend_and_state_is_small():
    """Non-rank-1 grads: factored Adam still minimizes a convex quadratic,
    and nu state is (d1+d2)/(d1*d2) of the param count."""
    d1, d2 = 256, 512
    rng = np.random.default_rng(3)
    tgt = jnp.asarray(rng.standard_normal((d1, d2)).astype(np.float32))
    p = {"w": jnp.zeros((d1, d2), jnp.float32)}
    opt = optax.chain(
        trainer.scale_by_factored_adam(mu_dtype=jnp.bfloat16),
        optax.scale_by_learning_rate(0.05),
    )
    s = opt.init(p)
    inner = s[0]
    assert inner.mu["w"].dtype == jnp.bfloat16
    nu_elems = inner.nu_row["w"].size + inner.nu_col["w"].size
    assert nu_elems == d1 + d2

    def loss(p):
        return jnp.mean((p["w"] - tgt) ** 2)

    l0 = float(loss(p))
    step = jax.jit(
        lambda p, s: (lambda g: optax.apply_updates(p, opt.update(g, s, p)[0]),
                      opt.update(jax.grad(loss)(p), s, p))[1]
    )
    for _ in range(60):
        g = jax.grad(loss)(p)
        u, s = opt.update(g, s, p)
        p = optax.apply_updates(p, u)
    assert float(loss(p)) < 0.05 * l0


def test_make_optimizer_factored_with_freeze_masks():
    """factored_v composes with the freeze multi_transform: frozen leaves
    get zero updates and no factored state blowup; trainable leaves move."""
    cfgp = {
        "llm": {"embed": jnp.ones((200, 128)),
                "q_geo": jnp.ones((160, 128)),
                "q_und": jnp.ones((160, 128))},
        "dino": {"w": jnp.ones((128, 128))},
    }
    # freeze_und freezes llm.* except embed/lm_head; geo keys stay trainable
    opt = trainer.make_optimizer(
        learning_rate=1e-2, freeze_und=True, params=cfgp,
        mu_dtype=jnp.bfloat16, factored_v=True,
    )
    s = opt.init(cfgp)
    g = jax.tree.map(jnp.ones_like, cfgp)
    u, s = opt.update(g, s, cfgp)
    assert float(jnp.abs(u["llm"]["q_und"]).sum()) == 0.0
    assert float(jnp.abs(u["llm"]["q_geo"]).sum()) > 0.0
    assert float(jnp.abs(u["dino"]["w"]).sum()) > 0.0
