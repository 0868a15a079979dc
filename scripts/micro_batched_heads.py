#!/usr/bin/env python
"""Micro-sweep of the Pi3-head batched attention at its production shape
(32 views x 784 tokens, 16 heads x 96): the r4 profile put the current
kernel at ~7% MXU (8.6 ms for 121 GFLOP), the single largest inefficiency
in the heads. Variants isolate per-step overhead (hb), lane padding
(d 96 vs 128), dot forms, and XLA baselines.

  python scripts/micro_batched_heads.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from g2vlm_tpu.utils.jax_cache import enable as enable_cache

enable_cache()

from g2vlm_tpu.ops.flash_attention import _batched_fwd, flash_batched_attention
from g2vlm_tpu.ops.attention import dense_attention

B, S, H, D = 32, 784, 16, 96
FLOPS = 2 * 2 * B * H * S * S * D  # qk + pv


def _sync(x):
    # block_until_ready does not sync through the axon tunnel; a
    # single-element device fetch does (same as profile_recon)
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    ms = min(ts) * 1e3
    print(f"{name:44s} {ms:8.2f} ms  {FLOPS/ms/1e9:6.1f} TF/s", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
    q, k, v = jax.device_put((q, k, v))
    jax.block_until_ready((q, k, v))

    # baseline: production dispatch
    timeit("flash_batched (production)", jax.jit(flash_batched_attention), q, k, v)

    # hb sweep through the kernel directly (head-major, pre-padded)
    def prep(x):
        return jnp.swapaxes(x, 1, 2)

    scale = D ** -0.5
    for hb in (1, 2, 4, 8, 16):
        f = jax.jit(functools.partial(
            _batched_fwd, scale=scale, block_q=784, block_kv=784,
            s_real=S, interpret=False, with_lse=False, hb=hb,
        ))
        g = jax.jit(lambda q, k, v, f=f: f(prep(q), prep(k), prep(v)))
        timeit(f"kernel hb={hb:2d} (incl transpose)", g, q, k, v)

    # pre-transposed inputs: kernel time without the layout prep
    qp, kp, vp = jax.device_put((prep(q), prep(k), prep(v)))
    jax.block_until_ready((qp, kp, vp))
    for hb in (1, 4, 8, 16):
        f = jax.jit(functools.partial(
            _batched_fwd, scale=scale, block_q=784, block_kv=784,
            s_real=S, interpret=False, with_lse=False, hb=hb,
        ))
        timeit(f"kernel hb={hb:2d} (head-major inputs)", f, qp, kp, vp)

    # d padded to 128 lanes
    def pad_d(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - D)))

    for hb in (4, 8):
        f = jax.jit(functools.partial(
            _batched_fwd, scale=scale, block_q=784, block_kv=784,
            s_real=S, interpret=False, with_lse=False, hb=hb,
        ))
        g = jax.jit(
            lambda q, k, v, f=f:
            f(prep(pad_d(q)), prep(pad_d(k)), prep(pad_d(v)))[..., :D]
        )
        timeit(f"kernel hb={hb:2d} d->128 (incl pad+transpose)", g, q, k, v)

    # fused-sum variant: d padded to 128 with a ones column appended to V —
    # the row sum rides the PV matmul (free in the padding lanes) instead of
    # a cross-lane VPU reduce; no separate l scratch
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SAT = 100.0
    LOG2E = 1.4426950408889634

    def fused_kernel(q_ref, k_ref, v_ref, o_ref, *, hb):
        for hh in range(hb):
            s = jax.lax.dot_general(
                q_ref[0, hh], k_ref[0, hh],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp2(jnp.minimum(s, SAT))
            acc = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, hh],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BQ, 128): cols [:96]=pv, col 96=row sum
            o_ref[0, hh] = (
                acc / jnp.maximum(acc[:, D:D+1], 1e-30)
            ).astype(o_ref.dtype)

    def fused(q, k, v, hb):
        b, s, h, d = q.shape
        qp = jnp.swapaxes(
            jnp.pad(q * (scale * LOG2E), ((0,0),(0,0),(0,0),(0,128-d))), 1, 2)
        kp = jnp.swapaxes(jnp.pad(k, ((0,0),(0,0),(0,0),(0,128-d))), 1, 2)
        ones = jnp.ones((b, s, h, 1), v.dtype)
        vp = jnp.swapaxes(
            jnp.concatenate([v, ones, jnp.zeros((b, s, h, 127-d), v.dtype)],
                            axis=-1), 1, 2)
        spec = pl.BlockSpec((1, hb, s, 128), lambda bb, hh: (bb, hh, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            ft.partial(fused_kernel, hb=hb),
            out_shape=jax.ShapeDtypeStruct((b, h, s, 128), v.dtype),
            grid=(b, h // hb),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(qp, kp, vp)
        return jnp.swapaxes(out, 1, 2)[..., :d]

    for hb in (1, 2, 4, 8):
        timeit(f"fused-sum ones-col hb={hb} (incl pad)",
               jax.jit(ft.partial(fused, hb=hb)), q, k, v)

    # lane-clean variant: KV padded to a 128-multiple (784 -> 896) so score
    # tiles have whole lanes; pad keys masked; d -> 128; ones-col fused sum
    SKV = 896

    def fused2_kernel(q_ref, k_ref, v_ref, o_ref, *, hb):
        key_ok = jax.lax.broadcasted_iota(jnp.int32, (1, SKV), 1) < S
        for hh in range(hb):
            s = jax.lax.dot_general(
                q_ref[0, hh], k_ref[0, hh],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (784, 896)
            p = jnp.where(key_ok, jnp.exp2(jnp.minimum(s, SAT)), 0.0)
            acc = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, hh],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, hh] = (
                acc / jnp.maximum(acc[:, D:D+1], 1e-30)
            ).astype(o_ref.dtype)

    def fused2(q, k, v, hb):
        b, s, h, d = q.shape
        qp = jnp.swapaxes(
            jnp.pad(q * (scale * LOG2E), ((0,0),(0,0),(0,0),(0,128-d))), 1, 2)
        kp = jnp.swapaxes(
            jnp.pad(k, ((0,0),(0,SKV-s),(0,0),(0,128-d))), 1, 2)
        ones = jnp.ones((b, s, h, 1), v.dtype)
        vp = jnp.swapaxes(
            jnp.pad(
                jnp.concatenate(
                    [v, ones, jnp.zeros((b, s, h, 127-d), v.dtype)], axis=-1
                ),
                ((0,0),(0,SKV-s),(0,0),(0,0)),
            ), 1, 2)
        qspec = pl.BlockSpec((1, hb, s, 128), lambda bb, hh: (bb, hh, 0, 0),
                             memory_space=pltpu.VMEM)
        kvspec = pl.BlockSpec((1, hb, SKV, 128), lambda bb, hh: (bb, hh, 0, 0),
                              memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            ft.partial(fused2_kernel, hb=hb),
            out_shape=jax.ShapeDtypeStruct((b, h, s, 128), v.dtype),
            grid=(b, h // hb),
            in_specs=[qspec, kvspec, kvspec],
            out_specs=qspec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(qp, kp, vp)
        return jnp.swapaxes(out, 1, 2)[..., :d]

    for hb in (1, 2, 4, 8):
        timeit(f"lane-clean kv896 d128 hb={hb} (incl pad)",
               jax.jit(ft.partial(fused2, hb=hb)), q, k, v)

    # B-scaling: does the batched-flash time grow with B, or is it a
    # per-call wall? (decides whether stacking the three head decoders into
    # one B=96 call amortizes the ~5 ms attention cost)
    for bb in (32, 64, 96):
        kq2, kk2, kv2 = jax.random.split(jax.random.PRNGKey(bb), 3)
        qb = jax.random.normal(kq2, (bb, S, H, D), jnp.bfloat16)
        kb = jax.random.normal(kk2, (bb, S, H, D), jnp.bfloat16)
        vb = jax.random.normal(kv2, (bb, S, H, D), jnp.bfloat16)
        qb, kb, vb = jax.device_put((qb, kb, vb))
        jax.block_until_ready((qb, kb, vb))
        out = jax.jit(flash_batched_attention)(qb, kb, vb)
        _sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = jax.jit(flash_batched_attention)(qb, kb, vb)
            _sync(out)
            ts.append((time.perf_counter() - t0) / 10)
        ms = min(ts) * 1e3
        fl = 2 * 2 * bb * H * S * S * D
        print(f"{'flash_batched B=%d' % bb:44s} {ms:8.2f} ms  "
              f"{fl/ms/1e9:6.1f} TF/s", flush=True)

    # numeric check of the lane-clean variant vs dense reference
    ref = dense_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    got = jax.jit(ft.partial(fused2, hb=4))(q, k, v).astype(jnp.float32)
    err = jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref))
    print(f"lane-clean max rel err vs fp32 dense: {float(err):.2e}")

    # pure GEMM calibration: what the chip actually sustains on big bf16
    # matmuls (chained so XLA can't CSE)
    a = jax.random.normal(kq, (25088, 1536), jnp.bfloat16)
    w1 = jax.random.normal(kk, (1536, 6144), jnp.bfloat16)
    w2 = jax.random.normal(kv, (6144, 1536), jnp.bfloat16)

    def gemm_chain(a, w1, w2):
        for _ in range(4):
            a = ((a @ w1) @ w2)
        return a

    gflop = 4 * 2 * 2 * 25088 * 1536 * 6144 / 1e9
    out = jax.jit(gemm_chain)(a, w1, w2)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = jax.jit(gemm_chain)(a, w1, w2)
    _sync(out)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{'pure GEMM chain (25088x1536x6144)':44s} {ms:8.2f} ms  "
          f"{gflop/ms:6.1f} TF/s")

    # XLA dense attention at the same shape (materialized fp32 scores)
    timeit("dense XLA (bshd)", jax.jit(dense_attention), q, k, v)

    # XLA dense, head-major einsum form
    def dense_hm(q, k, v):
        qh, kh, vh = prep(q), prep(k), prep(v)
        s = jnp.einsum("bhsd,bhmd->bhsm", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhsm,bhmd->bhsd", p.astype(v.dtype), vh)
        return jnp.swapaxes(o, 1, 2)

    timeit("dense XLA head-major fp32 softmax", jax.jit(dense_hm), q, k, v)

    # jax.nn.dot_product_attention (XLA's fused path if any)
    f = jax.jit(functools.partial(jax.nn.dot_product_attention))
    timeit("jax.nn.dot_product_attention", f, q, k, v)


if __name__ == "__main__":
    main()
