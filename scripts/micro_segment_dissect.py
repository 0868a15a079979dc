#!/usr/bin/env python
"""Dissect the segment flash kernel's time at the 32-view prefill shape.

Variants isolate which unit bounds the kernel (all FULL tiles, the recon
prefill's ~97% case):
  full       — production body: QK dot -> exp2 -> sum -> PV dot
  noexp      — exp2 replaced by identity (VPU transcendental cost)
  nosum      — drop the l running sum (VPU reduce cost)
  dotsonly   — QK dot -> PV dot directly (pure MXU + pipeline floor)
  novpu      — QK dot only, accumulate scores (HBM/DMA + one-dot floor)

Roofline at 25088 tokens, H=12 KVH=2 D=128: 2 dots = 2*2*S^2*D*H
= 3.87 TFLOP -> 19.6 ms at 197 TFLOP/s (v5e bf16).

  python scripts/micro_segment_dissect.py [--views 32] [--iters 10]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bq", type=int, default=512)
    ap.add_argument("--bk", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from g2vlm_tpu.utils.jax_cache import enable as enable_cache

    enable_cache()
    from g2vlm_tpu.config import G2VLMConfig

    cfg = G2VLMConfig(visual_und=False)
    hp, wp = 294 // 14, 518 // 14
    s = args.views * (hp * wp + 2) + 7
    h, kvh, d = cfg.llm.num_attention_heads, cfg.llm.num_key_value_heads, 128
    g = h // kvh
    bq, bk = args.bq, args.bk
    sp = -(-s // bq) * bq
    skv = -(-s // bk) * bk
    print(f"tokens={s} padded q={sp} kv={skv} H={h} KVH={kvh} G={g} "
          f"BQ={bq} BK={bk}")
    flops = 2 * 2 * s * s * d * h
    print(f"2-dot FLOPs {flops/1e12:.2f}T -> roofline "
          f"{flops/197e12*1e3:.1f} ms")

    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.device_put(jax.random.normal(kq, (kvh, g, sp, d), jnp.bfloat16))
    k = jax.device_put(jax.random.normal(kk, (kvh, skv, d), jnp.bfloat16))
    v = jax.device_put(jax.random.normal(kv_, (kvh, skv, d), jnp.bfloat16))
    jax.block_until_ready((q, k, v))
    n_q, n_kv = sp // bq, skv // bk

    SAT = 100.0

    def body(q_ref, k_ref, v_ref, o_ref, l_scr, acc_scr, *, variant):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        qv = q_ref[0].reshape(g * bq, d)
        s_ = jax.lax.dot_general(
            qv, k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if variant == "novpu":
            acc_scr[:] += s_[:, :d]
        else:
            if variant == "full":
                p = jnp.exp2(jnp.minimum(s_, SAT))
                l_scr[:, :1] += jnp.sum(p, axis=1, keepdims=True)
            elif variant == "noexp":
                p = jnp.minimum(s_, SAT)
                l_scr[:, :1] += jnp.sum(p, axis=1, keepdims=True)
            elif variant == "nosum":
                p = jnp.exp2(jnp.minimum(s_, SAT))
            else:  # dotsonly
                p = s_
            acc_scr[:] += jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(j == n_kv - 1)
        def _():
            if variant in ("nosum", "dotsonly", "novpu"):
                o_ref[0] = acc_scr[:].reshape(g, bq, d).astype(o_ref.dtype)
            else:
                l = l_scr[:, :1]
                o_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).reshape(
                    g, bq, d
                ).astype(o_ref.dtype)

    def run(variant):
        kern = functools.partial(body, variant=variant)
        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((kvh, g, sp, d), jnp.bfloat16),
            grid=(kvh, n_q, n_kv),
            in_specs=[
                pl.BlockSpec((1, g, bq, d), lambda hh, i, j: (hh, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, d), lambda hh, i, j: (hh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, d), lambda hh, i, j: (hh, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, g, bq, d), lambda hh, i, j: (hh, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((g * bq, 128), jnp.float32),
                pltpu.VMEM((g * bq, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )
        f = jax.jit(fn)

        def sync(x):
            # block_until_ready does not sync through the axon tunnel;
            # a single-element device fetch does (same as profile_recon)
            np.asarray(x.ravel()[0])

        out = f(q, k, v)
        sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(q, k, v)
            sync(out)
            ts.append((time.perf_counter() - t0) / args.iters)
        dt = min(ts) * 1e3
        print(f"{variant:9s} {dt:7.2f} ms   ({flops/(min(ts))/1e12:.0f} "
              f"TFLOP/s-equiv)")
        return dt

    for variant in ("full", "noexp", "nosum", "dotsonly", "novpu"):
        run(variant)

    # ---- int8 QK^T variant: q/k quantized per-(kv-head) with global
    # scalar scales; the int32 scores convert+rescale in one fma. The v5e
    # MXU runs int8 at 2x bf16, and the QK dot is ~half the kernel's MXU
    # time, so the ceiling is ~25% per layer. PV stays bf16.
    qs = 127.0 / jnp.max(jnp.abs(q.astype(jnp.float32)))
    ks = 127.0 / jnp.max(jnp.abs(k.astype(jnp.float32)))
    q8 = jnp.clip(
        jnp.round(q.astype(jnp.float32) * qs), -127, 127
    ).astype(jnp.int8)
    k8 = jnp.clip(
        jnp.round(k.astype(jnp.float32) * ks), -127, 127
    ).astype(jnp.int8)
    alpha = np.float32(1.4426950408889634 * (d ** -0.5) / float(qs * ks))
    q8, k8 = jax.device_put((q8, k8))
    jax.block_until_ready((q8, k8))

    def body8(q_ref, k_ref, v_ref, o_ref, l_scr, acc_scr):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        qv = q_ref[0].reshape(g * bq, d)
        s32 = jax.lax.dot_general(
            qv, k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s_ = s32.astype(jnp.float32) * alpha
        p = jnp.exp2(jnp.minimum(s_, SAT))
        l_scr[:, :1] += jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] += jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == n_kv - 1)
        def _():
            l = l_scr[:, :1]
            o_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).reshape(
                g, bq, d
            ).astype(o_ref.dtype)

    fn8 = pl.pallas_call(
        body8,
        out_shape=jax.ShapeDtypeStruct((kvh, g, sp, d), jnp.bfloat16),
        grid=(kvh, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, g, bq, d), lambda hh, i, j: (hh, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda hh, i, j: (hh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda hh, i, j: (hh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, g, bq, d), lambda hh, i, j: (hh, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((g * bq, 128), jnp.float32),
            pltpu.VMEM((g * bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    f8 = jax.jit(lambda a, b, c: fn8(a, b, c))
    out8 = f8(q8, k8, v)
    np.asarray(out8.ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out8 = f8(q8, k8, v)
        np.asarray(out8.ravel()[0])
        ts.append((time.perf_counter() - t0) / args.iters)
    dt = min(ts) * 1e3
    print(f"{'int8qk':9s} {dt:7.2f} ms   ({flops/(min(ts))/1e12:.0f} "
          f"TFLOP/s-equiv)")

    # accuracy vs the fp32 reference softmax on the first kv head
    import jax.nn as jnn

    qf = q[0].astype(jnp.float32)  # (g, sp, d)
    kf = k[0].astype(jnp.float32)
    vf = v[0].astype(jnp.float32)
    sc = d ** -0.5
    sref = jnp.einsum("gqd,kd->gqk", qf[:, :512], kf) * sc
    oref = jnp.einsum(
        "gqk,kd->gqd", jnn.softmax(sref[..., :s], axis=-1), vf[:s]
    )
    got = out8[0, :, :512].astype(jnp.float32)
    ref_bf = jnp.einsum(
        "gqk,kd->gqd",
        jnn.softmax(
            (jnp.einsum("gqd,kd->gqk", q[0, :, :512].astype(jnp.float32),
                        kf) * sc)[..., :s], axis=-1
        ),
        vf[:s],
    )
    err8 = jnp.max(jnp.abs(got - oref)) / jnp.max(jnp.abs(oref))
    errbf = jnp.max(jnp.abs(ref_bf - oref)) / jnp.max(jnp.abs(oref))
    print(f"int8qk max rel err vs fp32 softmax: {float(err8):.2e} "
          f"(bf16-input baseline {float(errbf):.2e})")


if __name__ == "__main__":
    main()
