#!/usr/bin/env python
"""Round-5 follow-up on the Pi3-head batched-attention gap (VERDICT r4 #4).

r4 micro (scripts/micro_batched_heads.py): every whole-view-tile kernel
variant lands 5.2-6.0 ms at (32 views x 784 x 16h x 96d) vs a ~1.5 ms
executed-FLOP floor, with per-step overhead, lane raggedness and the
cross-lane row sum ruled out. Remaining hypotheses, isolated here:

  1. dots-only: same structure minus exp2/mask/div -> measures the pure
     MXU share. If this lands ~1.5 ms the gap is the VPU softmax pass and
     its (784x896) fp32 score-tile VMEM round-trip, serialized against the
     dots (the known v5e Mosaic behavior from the segment-kernel pipelining
     negative result).
  2. kv-sliced: the score tile is produced/consumed in (784,128) strips by
     an unrolled in-kernel loop instead of one (784,896) tile -> strips can
     live in vregs, and the j+1 dot has no data dependence on the j exp2,
     giving Mosaic an interleavable instruction stream.

  python scripts/micro_heads_r5.py
"""

import functools as ft
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from g2vlm_tpu.utils.jax_cache import enable as enable_cache

enable_cache()

from g2vlm_tpu.ops.attention import dense_attention
from g2vlm_tpu.ops.flash_attention import flash_batched_attention

B, S, H, D = 32, 784, 16, 96
SKV = 896  # kv padded to a lane multiple; pad keys masked
FLOPS = 2 * 2 * B * H * S * S * D  # useful qk + pv
SAT = 100.0
LOG2E = 1.4426950408889634


def _sync(x):
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
    print(f"{name:48s} {ms:8.2f} ms  {FLOPS/ms/1e9:6.1f} TF/s", flush=True)
    return out


def _prep(q, k, v):
    """head-major, d->128, kv->896, softmax scale+log2e folded into q,
    ones column in V lane D for the fused row sum."""
    scale = D ** -0.5
    qp = jnp.swapaxes(
        jnp.pad(q.astype(jnp.float32) * (scale * LOG2E),
                ((0, 0), (0, 0), (0, 0), (0, 128 - D))).astype(q.dtype),
        1, 2)
    kp = jnp.swapaxes(
        jnp.pad(k, ((0, 0), (0, SKV - S), (0, 0), (0, 128 - D))), 1, 2)
    ones = jnp.ones((B, S, H, 1), v.dtype)
    vp = jnp.swapaxes(
        jnp.pad(
            jnp.concatenate(
                [v, ones, jnp.zeros((B, S, H, 127 - D), v.dtype)], axis=-1),
            ((0, 0), (0, SKV - S), (0, 0), (0, 0))), 1, 2)
    return qp, kp, vp


def _call(kernel, hb, qp, kp, vp):
    qspec = pl.BlockSpec((1, hb, S, 128), lambda bb, hh: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, hb, SKV, 128), lambda bb, hh: (bb, hh, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        ft.partial(kernel, hb=hb),
        out_shape=jax.ShapeDtypeStruct((B, H, S, 128), vp.dtype),
        grid=(B, H // hb),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qp, kp, vp)


# ---- 1. dots-only: whole-view tile, no softmax ----
def dots_only_kernel(q_ref, k_ref, v_ref, o_ref, *, hb):
    for hh in range(hb):
        s = jax.lax.dot_general(
            q_ref[0, hh], k_ref[0, hh],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, hh] = jax.lax.dot_general(
            s.astype(v_ref.dtype), v_ref[0, hh],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


# ---- 2. kv-sliced: (784,128) score strips, unrolled kv loop ----
def kv_sliced_kernel(q_ref, k_ref, v_ref, o_ref, *, hb, softmax=True):
    nblk = SKV // 128
    for hh in range(hb):
        qh = q_ref[0, hh]
        acc = jnp.zeros((S, 128), jnp.float32)
        for j in range(nblk):
            ks = k_ref[0, hh, j * 128:(j + 1) * 128, :]
            vs = v_ref[0, hh, j * 128:(j + 1) * 128, :]
            s = jax.lax.dot_general(
                qh, ks, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (784, 128)
            if softmax:
                p = jnp.exp2(jnp.minimum(s, SAT))
                if (j + 1) * 128 > S:  # last strip holds the pad keys
                    ok = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                          + j * 128) < S
                    p = jnp.where(ok, p, 0.0)
            else:
                p = s
            acc = acc + jax.lax.dot_general(
                p.astype(vs.dtype), vs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if softmax:
            acc = acc / jnp.maximum(acc[:, D:D + 1], 1e-30)
        o_ref[0, hh] = acc.astype(o_ref.dtype)


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
    q, k, v = jax.device_put((q, k, v))
    jax.block_until_ready((q, k, v))

    timeit("flash_batched (production baseline)",
           jax.jit(flash_batched_attention), q, k, v)

    qp, kp, vp = jax.device_put(jax.jit(_prep)(q, k, v))
    jax.block_until_ready((qp, kp, vp))

    for hb in (4, 8):
        timeit(f"dots-only whole-tile hb={hb} (head-major in)",
               jax.jit(ft.partial(_call, dots_only_kernel, hb)), qp, kp, vp)
    for hb in (1, 2, 4, 8):
        timeit(f"kv-sliced 128-strips hb={hb} (head-major in)",
               jax.jit(ft.partial(_call, kv_sliced_kernel, hb)), qp, kp, vp)
    for hb in (4,):
        timeit(f"kv-sliced dots-only hb={hb} (head-major in)",
               jax.jit(ft.partial(
                   _call, ft.partial(kv_sliced_kernel, softmax=False), hb)),
               qp, kp, vp)

    # numeric gate for the kv-sliced softmax variant
    ref = dense_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    got = jnp.swapaxes(
        jax.jit(ft.partial(_call, kv_sliced_kernel, 4))(qp, kp, vp), 1, 2
    )[..., :D].astype(jnp.float32)
    err = jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref))
    print(f"kv-sliced max rel err vs fp32 dense: {float(err):.2e}")


if __name__ == "__main__":
    main()
