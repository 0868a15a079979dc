"""Pallas flash segment-attention kernel vs the dense reference, in
interpreter mode on CPU (the kernel itself runs compiled on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from g2vlm_tpu.ops.attention import segment_attention
from g2vlm_tpu.ops.flash_attention import flash_segment_attention
from g2vlm_tpu.ops.masks import TokenInfo, make_token_info_np


@pytest.mark.parametrize(
    "case",
    [
        dict(S=256, sample_lens=[256], split_lens=[256], modes=["causal"]),
        dict(
            S=256,
            sample_lens=[100, 156],
            split_lens=[40, 60, 56, 100],
            modes=["causal", "full", "causal", "full"],
        ),
    ],
)
def test_flash_kernel_matches_dense(rng, case):
    S, H, KVH, D = case["S"], 4, 2, 128
    q = rng.standard_normal((S, H, D)).astype(np.float32)
    k = rng.standard_normal((S, KVH, D)).astype(np.float32)
    v = rng.standard_normal((S, KVH, D)).astype(np.float32)
    info = make_token_info_np(case["sample_lens"], case["split_lens"], case["modes"])

    ref = segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info, impl="dense"
    )
    got = flash_segment_attention(
        jnp.asarray(q),
        jnp.asarray(k),
        jnp.asarray(v),
        info,
        info,
        block_q=128,
        block_kv=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_kernel_padding(rng):
    """Non-multiple sequence length exercises the padding path."""
    S, H, KVH, D = 200, 2, 2, 128
    q = rng.standard_normal((S, H, D)).astype(np.float32)
    k = rng.standard_normal((S, KVH, D)).astype(np.float32)
    v = rng.standard_normal((S, KVH, D)).astype(np.float32)
    info = make_token_info_np([S], [120, 80], ["causal", "full"])
    ref = segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info, impl="dense"
    )
    got = flash_segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info,
        block_q=128, block_kv=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "case",
    [
        dict(S=256, sample_lens=[256], split_lens=[256], modes=["causal"]),
        dict(
            S=256,
            sample_lens=[100, 156],
            split_lens=[40, 60, 56, 100],
            modes=["causal", "full", "causal", "full"],
        ),
    ],
)
def test_flash_kernel_backward_matches_dense(rng, case):
    """Custom-VJP Pallas backward (dq + GQA-reduced dk/dv) vs autodiff
    through the dense reference."""
    import jax

    S, H, KVH, D = case["S"], 4, 2, 128
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, KVH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((S, KVH, D)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    info = make_token_info_np(
        case["sample_lens"], case["split_lens"], case["modes"]
    )

    def loss_ref(q, k, v):
        o = segment_attention(q, k, v, info, info, impl="dense")
        return jnp.sum(o * co)

    def loss_flash(q, k, v):
        o = flash_segment_attention(
            q, k, v, info, info, block_q=128, block_kv=128, interpret=True
        )
        return jnp.sum(o * co)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name}",
        )


def test_flash_kernel_backward_padding(rng):
    import jax

    S, H, KVH, D = 200, 2, 2, 128
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, KVH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((S, KVH, D)), jnp.float32)
    info = make_token_info_np([S], [120, 80], ["causal", "full"])

    def loss(impl):
        def f(q, k, v):
            if impl == "dense":
                o = segment_attention(q, k, v, info, info, impl="dense")
            else:
                o = flash_segment_attention(
                    q, k, v, info, info, block_q=128, block_kv=128,
                    interpret=True,
                )
            return jnp.sum(jnp.tanh(o))

        return f

    g_ref = jax.grad(loss("dense"), argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss("flash"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )


def test_block_codes_classification():
    """The tile classifier must mark the recon-prefill layout (text prefix +
    big full-attention dino span) as mostly FULL, strictly-above-diagonal
    causal text tiles as SKIP, and boundary tiles as PARTIAL."""
    from g2vlm_tpu.ops.flash_attention import (
        BLOCK_FULL, BLOCK_PARTIAL, BLOCK_SKIP, _block_codes, _pack_meta,
    )

    S, B = 512, 128
    # doc 0 everywhere; tokens [0,256) causal text (fn -1), [256,512) full
    info = make_token_info_np([S], [256, 256], ["causal", "full"])
    qm = _pack_meta(info)
    km = np.asarray(qm).T
    codes = np.asarray(_block_codes(qm, jnp.asarray(km), B, B))
    # diagonal text tiles: partial (causal within)
    assert codes[0, 0] == BLOCK_PARTIAL and codes[1, 1] == BLOCK_PARTIAL
    # below-diagonal text tile: fully causal-visible
    assert codes[1, 0] == BLOCK_FULL
    # above-diagonal text-vs-text: provably invisible
    assert codes[0, 1] == BLOCK_SKIP
    # dino-vs-dino tiles: same fn -> full
    assert codes[2, 2] == BLOCK_FULL and codes[3, 2] == BLOCK_FULL
    # dino rows see text history causally (pos below) -> full
    assert codes[2, 0] == BLOCK_FULL
    # text rows vs later dino keys: fq=-1 can never full-match and causal is
    # impossible (pk > pq) -> provably invisible
    assert codes[0, 2] == BLOCK_SKIP

    # two documents: cross-doc tiles are SKIP
    info2 = make_token_info_np([256, 256], [256, 256], ["causal", "causal"])
    qm2 = _pack_meta(info2)
    codes2 = np.asarray(
        _block_codes(qm2, jnp.asarray(np.asarray(qm2).T), B, B)
    )
    assert codes2[0, 2] == BLOCK_SKIP and codes2[2, 0] == BLOCK_SKIP


def test_batched_flash_matches_dense(rng):
    """Batched (per-view) kernel: self + cross lengths, fwd and bwd, in
    interpreter mode."""
    import jax

    from g2vlm_tpu.ops.attention import dense_attention
    from g2vlm_tpu.ops.flash_attention import flash_batched_attention

    B, S, M, H, D = 2, 200, 140, 4, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, M, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, M, H, D)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)

    ref = dense_attention(q, k, v)
    got = flash_batched_attention(
        q, k, v, block_q=128, block_kv=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
    )

    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(dense_attention(q, k, v) * co),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_fl = jax.grad(
        lambda q, k, v: jnp.sum(
            flash_batched_attention(
                q, k, v, block_q=128, block_kv=128, interpret=True
            ) * co
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_fl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )


def test_flash_kernel_under_vmap(rng):
    """The trainer vmaps the packed forward over the dp-batch axis; the
    kernel must be correct under vmap (pallas prepends a grid dim)."""
    import jax

    S, H, KVH, D = 256, 4, 2, 128
    B = 2
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, KVH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, KVH, D)), jnp.float32)
    info = make_token_info_np([100, 156], [100, 156], ["causal", "full"])

    single = lambda q, k, v: flash_segment_attention(
        q, k, v, info, info, block_q=128, block_kv=128, interpret=True
    )
    got = jax.vmap(single)(q, k, v)
    for i in range(B):
        ref = segment_attention(q[i], k[i], v[i], info, info, impl="dense")
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    # grads under vmap (the actual trainer pattern)
    def loss(q, k, v):
        return jnp.sum(jax.vmap(single)(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            jax.vmap(
                lambda q, k, v: segment_attention(
                    q, k, v, info, info, impl="dense"
                )
            )(q, k, v) ** 2
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3
        )


def test_static_max_matches_online(rng):
    """The static-bound exp2 softmax shift is exact (shift invariance):
    static_max=True and =False agree, including rows with large-norm
    outliers and fully-masked padding rows."""
    S, H, KVH, D = 256, 4, 2, 128
    q = rng.standard_normal((S, H, D)).astype(np.float32)
    k = rng.standard_normal((S, KVH, D)).astype(np.float32)
    q[7] *= 30.0  # large-norm rows stress the bound
    k[11] *= 30.0
    v = rng.standard_normal((S, KVH, D)).astype(np.float32)
    info = make_token_info_np(
        [100, 156], [40, 60, 56, 100], ["causal", "full", "causal", "full"],
        pad_to=256,
    )
    kw = dict(block_q=128, block_kv=128, interpret=True)
    a = flash_segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info,
        static_max=True, **kw,
    )
    b = flash_segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info,
        static_max=False, **kw,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                               rtol=1e-4)


def test_static_max_extreme_logits_finite(rng):
    """Un-qk-normed callers can in principle produce logits past the 40-nat
    static-max cap; the saturated-exponent path must stay finite (no
    exp2 -> inf -> NaN) and still match the shift-invariant softmax when the
    extreme scores are ties (ADVICE r2: overflow past ~101 nats)."""
    S, H, KVH, D = 128, 2, 2, 128
    v0 = rng.standard_normal(D).astype(np.float32)
    v0 /= np.linalg.norm(v0)
    # all scores equal and enormous (~28k nats): cap engages, s-m >> 100
    q = np.tile(50.0 * v0, (S, H, 1)).astype(np.float32)
    k = np.tile(50.0 * v0, (S, KVH, 1)).astype(np.float32)
    v = rng.standard_normal((S, KVH, D)).astype(np.float32)
    info = make_token_info_np([S], [S], ["full"])
    out = flash_segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info,
        block_q=128, block_kv=128, interpret=True, static_max=True,
    )
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # uniform softmax over the S visible keys = per-head mean of v
    want = np.broadcast_to(v.mean(axis=0)[None], (S, KVH, D))
    want = np.repeat(want, H // KVH, axis=1)
    np.testing.assert_allclose(out, want, atol=1e-4, rtol=1e-4)

    # mixed case: one extreme row among normal ones must not poison others
    q2 = rng.standard_normal((S, H, D)).astype(np.float32)
    k2 = rng.standard_normal((S, KVH, D)).astype(np.float32)
    q2[7] = 60.0 * v0
    k2[11] = 60.0 * v0
    out2 = np.asarray(flash_segment_attention(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v), info, info,
        block_q=128, block_kv=128, interpret=True, static_max=True,
    ))
    assert np.isfinite(out2).all()


def test_pipelined_kernel_matches_plain(rng, monkeypatch):
    """The staged 2-stage pipeline variant (G2VLM_ATTN_PIPE=1, non-default:
    measured slower on v5e, see BENCH_NOTES negative results) must stay
    numerically identical to the plain shiftless kernel — fwd and grads."""
    import jax

    S, H, KVH, D = 256, 4, 2, 128
    q = rng.standard_normal((S, H, D)).astype(np.float32)
    k = rng.standard_normal((S, KVH, D)).astype(np.float32)
    v = rng.standard_normal((S, KVH, D)).astype(np.float32)
    info = make_token_info_np(
        [100, 156], [40, 60, 56, 100], ["causal", "full", "causal", "full"]
    )

    def run():
        def f(q_, k_, v_):
            return flash_segment_attention(
                q_, k_, v_, info, info, block_q=128, block_kv=128,
                interpret=True, static_max=True,
            ).sum()

        out = flash_segment_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info,
            block_q=128, block_kv=128, interpret=True, static_max=True,
        )
        grads = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
        )
        return out, grads

    monkeypatch.setenv("G2VLM_ATTN_PIPE", "0")
    plain_out, plain_grads = run()
    monkeypatch.setenv("G2VLM_ATTN_PIPE", "1")
    pipe_out, pipe_grads = run()

    np.testing.assert_allclose(
        np.asarray(pipe_out), np.asarray(plain_out), atol=1e-6, rtol=1e-6
    )
    for pg, gg in zip(pipe_grads, plain_grads):
        np.testing.assert_allclose(
            np.asarray(pg), np.asarray(gg), atol=1e-5, rtol=1e-5
        )


@pytest.mark.parametrize(
    "case",
    [
        dict(S=256, sample_lens=[256], split_lens=[256], modes=["causal"]),
        dict(
            S=256,
            sample_lens=[100, 156],
            split_lens=[40, 60, 56, 100],
            modes=["causal", "full", "causal", "full"],
        ),
        dict(S=256, sample_lens=[256], split_lens=[256], modes=["causal"],
             outliers=True),
    ],
)
def test_int8_qk_matches_dense(rng, case):
    """Inference int8 QK^T path (per-token q/k scales + Hadamard
    pre-rotation): mask semantics identical to the fp kernel, output within
    quantization noise of the dense reference (served-path budget is 3e-2
    rel). The outlier case (amplified channels + tokens, the regime that
    broke the r3 per-head-q quantizer) must also stay inside 2e-2."""
    S, H, KVH, D = case["S"], 4, 2, 128
    q = rng.standard_normal((S, H, D)).astype(np.float32) * 0.3
    k = rng.standard_normal((S, KVH, D)).astype(np.float32) * 0.3
    if case.get("outliers"):
        q[..., :4] *= 8
        k[..., :4] *= 8
        q[::37] *= 5
        k[::53] *= 5
    v = rng.standard_normal((S, KVH, D)).astype(np.float32)
    info = make_token_info_np(case["sample_lens"], case["split_lens"], case["modes"])

    ref = segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info, impl="dense"
    )
    got = flash_segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info,
        block_q=128, block_kv=128, interpret=True, int8_qk=True,
    )
    err = np.abs(np.asarray(got) - np.asarray(ref)).max() / np.abs(ref).max()
    assert err < 2e-2, f"int8 qk rel err {err:.3e}"
    # the masked (causal/full/doc) structure must be exact: fully-masked
    # rows/pads behave identically
    assert np.isfinite(np.asarray(got)).all()


def test_int8_qk_not_differentiable():
    """Training must not silently flow through quantization noise: taking a
    grad through the int8 path raises instead."""
    import jax

    S, H, KVH, D = 128, 2, 2, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, KVH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((S, KVH, D)), jnp.float32)
    info = make_token_info_np([S], [S], ["causal"])

    def loss(q):
        out = flash_segment_attention(
            q, k, v, info, info, block_q=128, block_kv=128,
            interpret=True, int8_qk=True,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    with pytest.raises(Exception):
        jax.grad(loss)(q)


def test_int8_kmean_softmax_invariance_and_accuracy(rng, monkeypatch):
    """K channel-mean subtraction (SageAttention-style smoothing) is exactly
    softmax-invariant — dense attention with K and K - mean(K) agree — and
    it rescues int8 accuracy when keys carry a large common-mode offset
    (the regime real qk-normed layers live in)."""
    S, H, KVH, D = 256, 2, 2, 128
    q = rng.standard_normal((S, H, D)).astype(np.float32)
    k = rng.standard_normal((S, KVH, D)).astype(np.float32)
    # strong common-mode component: channel bias shared by every token,
    # 8x the token-varying signal — inflates the per-token |k| max and
    # hence the int8 rounding step
    k = k + 8.0 * rng.standard_normal((1, KVH, D)).astype(np.float32)
    v = rng.standard_normal((S, KVH, D)).astype(np.float32)
    info = make_token_info_np([S], [128, 128], ["causal", "full"])

    # 1) the math: subtracting any fixed vector from every key is a
    # row-constant score shift -> identical softmax output
    km = k.mean(axis=0, keepdims=True)
    ref = segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info,
        impl="dense",
    )
    ref_shift = segment_attention(
        jnp.asarray(q), jnp.asarray(k - km), jnp.asarray(v), info, info,
        impl="dense",
    )
    np.testing.assert_allclose(
        np.asarray(ref_shift), np.asarray(ref), atol=5e-5, rtol=1e-4
    )

    # 2) the int8 kernel: kmean on (default) vs off under the common-mode K
    def run_int8():
        out = flash_segment_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), info, info,
            block_q=128, block_kv=128, interpret=True, int8_qk=True,
        )
        return np.abs(np.asarray(out) - np.asarray(ref)).max() / np.abs(ref).max()

    monkeypatch.setenv("G2VLM_ATTN_INT8_KMEAN", "0")
    err_off = run_int8()
    monkeypatch.setenv("G2VLM_ATTN_INT8_KMEAN", "1")
    err_on = run_int8()
    assert err_on < 2e-2, f"int8+kmean rel err {err_on:.3e}"
    assert err_on < err_off / 2, (
        f"kmean should cut the common-mode error: on={err_on:.3e} "
        f"off={err_off:.3e}"
    )
