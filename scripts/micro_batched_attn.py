#!/usr/bin/env python
"""Micro-benchmark of the batched per-view flash kernel at encoder shapes.

Times the inference (static-max) forward at dino-large shapes to separate
kernel time from the surrounding QKV projections when tuning layouts."""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(name, f, *args, iters=20):
    import jax
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms (median {np.median(ts)*1e3:.2f})")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--s", type=int, default=782)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from g2vlm_tpu.utils.jax_cache import enable, honor_platform_env
    honor_platform_env(); enable()
    from g2vlm_tpu.ops.flash_attention import flash_batched_attention

    key = jax.random.PRNGKey(0)
    shape = (args.b, args.s, args.h, args.d)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), shape,
                                 jnp.bfloat16) for i in range(3))

    fa = jax.jit(lambda q, k, v: flash_batched_attention(q, k, v))
    timeit("flash_batched_attention fwd", fa, q, k, v, iters=args.iters)

    # XLA reference for comparison
    def xla_attn(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (args.d ** -0.5)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    timeit("xla dense attention fwd", jax.jit(xla_attn), q, k, v,
           iters=args.iters)


if __name__ == "__main__":
    main()
