"""Multichip sharding: recon forward and train step over a virtual 8-device
mesh (the driver separately exercises __graft_entry__.dryrun_multichip)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from g2vlm_tpu.config import tiny_test_config
from g2vlm_tpu.inference.pipeline import G2VLMPipeline
from g2vlm_tpu.models import g2vlm as jg
from g2vlm_tpu.parallel import mesh as meshlib


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_recon_forward_fsdp_sharded(rng):
    cfg = tiny_test_config()
    params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ref_pipe = G2VLMPipeline(params, cfg, compute_dtype=jnp.float32)
    views = rng.random((2, 3, 56, 56)).astype(np.float32)
    ref = np.asarray(ref_pipe.recon_from_views(views)["points"])

    mesh = meshlib.make_mesh(8, dp=1, fsdp=4, tp=2)
    sharded, _ = meshlib.shard_params(params, mesh)
    with mesh:
        pipe = G2VLMPipeline(sharded, cfg, compute_dtype=jnp.float32)
        got = np.asarray(pipe.recon_from_views(views)["points"])
    # sharded collectives reorder fp32 reductions; tiny drift is expected
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_param_sharding_actually_shards():
    cfg = tiny_test_config()
    params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = meshlib.make_mesh(8, dp=1, fsdp=8, tp=1)
    sharded, specs = meshlib.shard_params(params, mesh)
    # the embedding table must actually be partitioned
    emb = sharded["llm"]["embed"]
    assert len(emb.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in emb.addressable_shards}
    assert all(np.prod(s) < np.prod(emb.shape) for s in shard_shapes)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_sharding_is_physical():
    """tp is a physical layout (Megatron column/row parallel), not metadata:
    per-device shards of QKV / o / MLP weights shrink by the tp factor."""
    cfg = tiny_test_config()
    params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = meshlib.make_mesh(8, dp=2, fsdp=2, tp=2)
    sharded, specs = meshlib.shard_params(params, mesh)
    lay = sharded["llm"]["layers"]

    def shard_shape(a):
        return a.addressable_shards[0].data.shape

    L, din, dout = lay["q"]["w"].shape
    assert shard_shape(lay["q"]["w"]) == (L, din // 2, dout // 2)  # col ∥
    L, din, dout = lay["o"]["w"].shape
    assert shard_shape(lay["o"]["w"]) == (L, din // 2, dout // 2)  # row ∥
    L, din, dout = lay["mlp"]["down"]["w"].shape
    assert shard_shape(lay["mlp"]["down"]["w"]) == (L, din // 2, dout // 2)
    # column-parallel bias follows its weight
    L, dout = lay["q"]["b"].shape
    assert shard_shape(lay["q"]["b"]) == (L, dout // 2)

    # vs a tp=1 mesh the decoder's per-device footprint halves
    mesh1 = meshlib.make_mesh(8, dp=4, fsdp=2, tp=1)
    sharded1, _ = meshlib.shard_params(params, mesh1)
    b2 = meshlib.addressable_param_bytes({"layers": sharded["llm"]["layers"]})
    b1 = meshlib.addressable_param_bytes({"layers": sharded1["llm"]["layers"]})
    assert b2 < 0.75 * b1, (b2, b1)


def test_sequence_parallel_attention_matches_single(rng):
    """SP attention (q sharded over 8 devices, KV all-gathered) == the
    single-device segment attention, bit-for-pattern across mask regimes."""
    import jax
    from jax.sharding import Mesh

    from g2vlm_tpu.ops.attention import segment_attention
    from g2vlm_tpu.ops.masks import make_token_info_np
    from g2vlm_tpu.parallel.sequence import sequence_parallel_attention

    S, H, KVH, D = 256, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, KVH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((S, KVH, D)), jnp.float32)
    info = make_token_info_np(
        [100, 156], [40, 60, 56, 100], ["causal", "full", "causal", "full"]
    )

    ref = segment_attention(q, k, v, info, info, impl="dense")

    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("sp",))
    got = sequence_parallel_attention(
        q, k, v, info, info, mesh, axis_name="sp", impl="dense"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
