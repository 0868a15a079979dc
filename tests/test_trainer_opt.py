"""Factored-Adam optimizer (trainer.scale_by_factored_adam).

What the factoring actually guarantees (Shazeer & Stern 2018 §3): the
reconstruction v = r c / mean(r) is lossless exactly when the nu EMA is
rank-1 over the trailing two dims. That holds at step 1 for any rank-1
g^2, and at every step when the gradients keep a FIXED outer-product
direction (g_t = s_t * a b^T with constant a, b — then each g_t^2 is
s_t^2 * a^2 (b^2)^T and the EMA stays rank-1). An EMA of rank-1 matrices
with *different* directions is not rank-1, so for general gradients the
update is an Adafactor-quality approximation of Adam, not Adam — tested
here as convergence on a convex quadratic plus state-size bounds. The
reference has no counterpart (its memory lever is CPU optimizer offload,
/root/reference/train/fsdp_utils.py:107-131)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from g2vlm_tpu.train import trainer


def _adam_updates(grads, params, b1=0.9, b2=0.95, eps=1e-8):
    opt = optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0)
    s = opt.init(params)
    outs = []
    for g in grads:
        u, s = opt.update(g, s, params)
        outs.append(u)
    return outs


def test_step1_rank1_grad_matches_adam_exactly():
    """At step 1 nu IS the (rank-1) g^2, so the factored update equals
    optax Adam's to fp32 roundoff for any rank-1 gradient."""
    rng = np.random.default_rng(0)
    p = {"w": jnp.zeros((256, 384), jnp.float32)}
    a = rng.standard_normal((256, 1)).astype(np.float32)
    b = rng.standard_normal((1, 384)).astype(np.float32)
    g = {"w": jnp.asarray(a * b)}

    fopt = trainer.scale_by_factored_adam(b1=0.9, b2=0.95, eps=1e-8)
    fs = fopt.init(p)
    ref = _adam_updates([g], p)[0]
    fu, fs = fopt.update(g, fs, p)
    np.testing.assert_allclose(
        np.asarray(fu["w"]), np.asarray(ref["w"]), rtol=2e-5, atol=2e-6
    )


def test_fixed_direction_grads_match_adam_every_step():
    """g_t = s_t * a b^T with fixed a, b: every g_t^2 = s_t^2 a^2 (b^2)^T
    shares one rank-1 direction, the nu EMA stays rank-1, and the factored
    update equals Adam's at EVERY step."""
    rng = np.random.default_rng(0)
    p = {"w": jnp.zeros((256, 384), jnp.float32)}
    a = rng.standard_normal((256, 1)).astype(np.float32)
    b = rng.standard_normal((1, 384)).astype(np.float32)
    scales = [1.0, -0.3, 2.7, 0.01]
    grads = [{"w": jnp.asarray(s * a * b)} for s in scales]

    fopt = trainer.scale_by_factored_adam(b1=0.9, b2=0.95, eps=1e-8)
    fs = fopt.init(p)
    ref = _adam_updates(grads, p)
    for i, g in enumerate(grads):
        fu, fs = fopt.update(g, fs, p)
        np.testing.assert_allclose(
            np.asarray(fu["w"]), np.asarray(ref[i]["w"]),
            rtol=2e-5, atol=2e-6,
        )


def test_varying_direction_grads_diverge_from_adam():
    """Regression guard on the honesty of the docstring: rank-1 grads with
    per-step DIFFERENT directions make the nu EMA full-rank, so from step 2
    the factored update must NOT equal Adam's (if this starts passing
    bit-for-bit, the implementation silently stopped factoring)."""
    rng = np.random.default_rng(0)
    p = {"w": jnp.zeros((256, 384), jnp.float32)}
    grads = []
    for _ in range(3):
        a = rng.standard_normal((256, 1)).astype(np.float32)
        b = rng.standard_normal((1, 384)).astype(np.float32)
        grads.append({"w": jnp.asarray(a * b)})
    fopt = trainer.scale_by_factored_adam(b1=0.9, b2=0.95, eps=1e-8)
    fs = fopt.init(p)
    ref = _adam_updates(grads, p)
    fu, fs = fopt.update(grads[0], fs, p)
    fu2, fs = fopt.update(grads[1], fs, p)
    rel = np.abs(np.asarray(fu2["w"]) - np.asarray(ref[1]["w"])) / (
        np.abs(np.asarray(ref[1]["w"])) + 1e-12
    )
    assert rel.max() > 1e-3  # genuinely approximate, not roundoff


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
    ref = _adam_updates(grads, p)
    for i, g in enumerate(grads):
        fu, fs = fopt.update(g, fs, p)
        for k in p:
            np.testing.assert_allclose(
                np.asarray(fu[k]), np.asarray(ref[i][k]), rtol=1e-6, atol=1e-7
            )


def test_stacked_leading_axis_factored_per_slice():
    """(L, d1, d2) stacked-scan params (the MoT layout) factor the trailing
    two dims per leading slice: fixed-direction rank-1 grads per slice
    reproduce Adam at every step, independently per slice."""
    rng = np.random.default_rng(2)
    p = {"w": jnp.zeros((3, 128, 256), jnp.float32)}
    a = rng.standard_normal((3, 128, 1)).astype(np.float32)
    b = rng.standard_normal((3, 1, 256)).astype(np.float32)
    scales = [1.0, 0.4, -1.9]
    grads = [{"w": jnp.asarray(s * a * b)} for s in scales]
    fopt = trainer.scale_by_factored_adam()
    fs = fopt.init(p)
    assert fs.nu_row["w"].shape == (3, 128)
    assert fs.nu_col["w"].shape == (3, 256)
    ref = _adam_updates(grads, p)
    for i, g in enumerate(grads):
        fu, fs = fopt.update(g, fs, p)
        np.testing.assert_allclose(
            np.asarray(fu["w"]), np.asarray(ref[i]["w"]), rtol=2e-5, atol=2e-6
        )


def test_general_grads_descend_and_state_is_small():
    """Non-rank-1 grads: factored Adam still minimizes a convex quadratic
    (run under jit so the None-leaf state is traced/donated like in
    train_step), and nu state is (d1+d2) elements, not d1*d2."""
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

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    l0 = float(loss(p))
    for _ in range(60):
        p, s = step(p, s)
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
