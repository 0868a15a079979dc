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
