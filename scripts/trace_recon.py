#!/usr/bin/env python
"""Capture a jax.profiler trace of the recon stages (prefill / heads / dino)
for xprof_summary.py op-bucket analysis.

  python scripts/trace_recon.py --stage heads --out /tmp/jaxtrace_heads
"""

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=(294, 518))
    ap.add_argument("--stage", type=str, default="heads",
                    choices=["heads", "prefill", "dino"])
    ap.add_argument("--out", type=str, default="/tmp/jaxtrace")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from g2vlm_tpu.utils.jax_cache import enable as enable_cache

    enable_cache()
    from g2vlm_tpu.config import G2VLMConfig
    from g2vlm_tpu.models import g2vlm as jg

    cfg = G2VLMConfig(visual_und=False)
    params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.tree.map(jax.device_put, params)
    jax.block_until_ready(params)

    n = args.views
    h, w = args.hw
    p = cfg.dino_patch_size
    hp, wp = h // p, w // p
    hw_tok = hp * wp
    key = jax.random.PRNGKey(1)
    imgs = jax.device_put(jax.random.normal(key, (n, 3, h, w), jnp.float32) * 0.2)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    dt = jnp.bfloat16
    builder = jg.SequenceBuilder(151652, 151653)
    builder.add_text([151644] + [200] * 6)
    builder.add_dino_images(n, hp, wp)
    prefill = builder.build()

    if args.stage == "dino":
        f = jax.jit(functools.partial(jg.encode_dino_to_llm, cfg=cfg,
                                      compute_dtype=dt))
        fargs = (params, imgs)
    elif args.stage == "prefill":
        f = jax.jit(lambda pr, im: jg.prefill_hidden(
            pr, prefill, im, cfg, compute_dtype=dt)[0])
        fargs = (params, imgs)
    else:
        hidden = jax.jit(lambda pr, im: jg.prefill_hidden(
            pr, prefill, im, cfg, compute_dtype=dt)[0])(params, imgs)
        dino_hidden = jax.device_put(
            hidden[jnp.asarray(prefill.dino_indexes)].reshape(n, hw_tok, -1))
        sync(dino_hidden)
        f = jax.jit(lambda pr, dh: jg.pi3_predict(pr, dh, (h, w), cfg,
                                                  compute_dtype=dt))
        fargs = (params, dino_hidden)

    out = f(*fargs)  # compile + warm
    sync(out)
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            out = f(*fargs)
        sync(out)
    print("trace written to", args.out)


if __name__ == "__main__":
    main()
