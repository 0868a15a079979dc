"""Sequence-parallel (context-parallel) segment attention.

The reference has NO sequence parallelism of any kind (SURVEY.md §2.3: long
multi-view context is handled single-device via token packing + varlen flash
attention). On TPU, sequences beyond one chip's HBM/compute scale naturally
over the ICI mesh: shard the QUERY sequence axis across devices and
all-gather the (small, GQA) KV stream once per layer.

Why KV all-gather instead of ring attention: G2VLM's GQA ratio is 6:1
(12 q heads, 2 kv heads, qwen2vl text_config), so the full KV for a
25k-token prefill is just 25088 x 2 x 128 x 2 layers' worth ≈ 12.8 MB per
layer pass in bf16 — one cheap ICI all-gather, after which every device
runs the ordinary segment-masked kernel (Pallas or blockwise-XLA) on its
local query shard. Ring attention would save that gather at the cost of
n_dev pipeline steps; at these KV sizes the gather wins on v5e ICI
(~45 GB/s/link: ~0.3 ms vs the kernel's tens of ms).

Use inside shard_map (manual mode), e.g.:

    from jax import shard_map
    attn = shard_map(
        functools.partial(sp_segment_attention, axis_name="fsdp"),
        mesh=mesh,
        in_specs=(P("fsdp"), P("fsdp"), P("fsdp"),
                  TokenInfo(*([P("fsdp")] * 4)), TokenInfo(*([P("fsdp")] * 4))),
        out_specs=P("fsdp"),
    )

or call `sequence_parallel_attention` which wraps the shard_map for you.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import segment_attention
from ..ops.masks import TokenInfo


def sp_segment_attention(
    q: jax.Array,  # (S_q/n, H, D) local query shard
    k: jax.Array,  # (S_kv/n, KVH, D) local kv shard
    v: jax.Array,
    q_info: TokenInfo,  # fields (S_q/n,)
    kv_info: TokenInfo,  # fields (S_kv/n,)
    axis_name: str,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Per-device body: all-gather KV (+ its metadata) along `axis_name`,
    then run the ordinary segment-masked attention on the local q shard.

    Correctness does not depend on how tokens were assigned to shards: the
    mask rule reads per-token metadata (doc/fn/noise/pos), so a contiguous
    split of the packed sequence keeps exactly the same attention pattern.
    """
    kg = jax.lax.all_gather(k, axis_name, axis=0, tiled=True)
    vg = jax.lax.all_gather(v, axis_name, axis=0, tiled=True)
    ig = TokenInfo(
        *(
            jax.lax.all_gather(f, axis_name, axis=0, tiled=True)
            for f in kv_info
        )
    )
    return segment_attention(q, kg, vg, q_info, ig, scale=scale, impl=impl)


def sequence_parallel_attention(
    q: jax.Array,  # (S_q, H, D) global
    k: jax.Array,  # (S_kv, KVH, D) global
    v: jax.Array,
    q_info: TokenInfo,
    kv_info: TokenInfo,
    mesh: Mesh,
    axis_name: str = "fsdp",
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """shard_map wrapper: shards the sequence axis of q/k/v/metadata over
    `axis_name`, computes attention sequence-parallel, returns the global
    result (sharded on the same axis). Sequence lengths must divide the axis
    size — the packer's fixed max_num_tokens makes that a config choice."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis_name]
    assert q.shape[0] % n == 0 and k.shape[0] % n == 0, (
        f"sequence lengths {q.shape[0]}/{k.shape[0]} must divide "
        f"{axis_name}={n}"
    )
    seq = P(axis_name)
    info_spec = TokenInfo(seq, seq, seq, seq)
    kwargs = dict(
        mesh=mesh,
        in_specs=(seq, seq, seq, info_spec, info_spec),
        out_specs=seq,
    )
    # jax>=0.8 renamed check_rep -> check_vma; pass whichever exists
    import inspect
    params = inspect.signature(shard_map).parameters
    if "check_vma" in params:
        kwargs["check_vma"] = False
    elif "check_rep" in params:
        kwargs["check_rep"] = False
    fn = shard_map(
        functools.partial(
            sp_segment_attention, axis_name=axis_name, scale=scale, impl=impl
        ),
        **kwargs,
    )
    return fn(q, k, v, q_info, kv_info)
