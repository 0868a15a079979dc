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
