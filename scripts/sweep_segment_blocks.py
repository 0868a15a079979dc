#!/usr/bin/env python
"""Block-size sweep of the segment flash kernel at the 32-view recon
prefill shape, with the real SequenceBuilder metadata (so visibility-code
skip/partial/full mix matches production). Times fwd only — that is the
inference bench path. Results recorded in docs/BENCH_NOTES.md.

  python scripts/sweep_segment_blocks.py [--views 32] [--iters 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--blocks",
        type=str,
        default="512:1024,512:1536,512:2048,1024:1024,1024:1536,256:1536,768:1536",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from g2vlm_tpu.utils.jax_cache import enable as enable_cache

    enable_cache()
    from g2vlm_tpu.config import G2VLMConfig
    from g2vlm_tpu.models.g2vlm import SequenceBuilder
    from g2vlm_tpu.ops.flash_attention import flash_segment_attention

    cfg = G2VLMConfig(visual_und=False)
    n = args.views
    hp, wp = 294 // 14, 518 // 14
    builder = SequenceBuilder(151652, 151653)
    builder.add_text([151644] + [200] * 6)
    builder.add_dino_images(n, hp, wp)
    prefill = builder.build()
    info = prefill.token_info()
    s = info.seq_len
    h, kvh, d = cfg.llm.num_attention_heads, cfg.llm.num_key_value_heads, 128
    print(f"prefill tokens={s} H={h} KVH={kvh} D={d}")

    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.device_put(jax.random.normal(kq, (s, h, d), jnp.bfloat16))
    k = jax.device_put(jax.random.normal(kk, (s, kvh, d), jnp.bfloat16))
    v = jax.device_put(jax.random.normal(kv_, (s, kvh, d), jnp.bfloat16))
    info = jax.tree.map(jax.device_put, info)
    jax.block_until_ready((q, k, v, info))

    ref = None
    for pair in args.blocks.split(","):
        bq, bk = (int(x) for x in pair.split(":"))
        try:
            f = jax.jit(
                lambda q, k, v, info, bq=bq, bk=bk: flash_segment_attention(
                    q, k, v, info, info, block_q=bq, block_kv=bk
                )
            )
            out = f(q, k, v, info)
            jax.block_until_ready(out)
        except Exception as e:  # VMEM overflow etc.
            print(f"BQ={bq:5d} BK={bk:5d}  FAILED: {type(e).__name__}")
            continue
        if ref is None:
            ref = np.asarray(out[:64, 0]).astype(np.float32)
        else:
            err = np.max(
                np.abs(np.asarray(out[:64, 0]).astype(np.float32) - ref)
            )
            assert err < 1e-2, (bq, bk, err)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = f(q, k, v, info)
            np.asarray(out.ravel()[0])
            ts.append(time.perf_counter() - t0)
        print(f"BQ={bq:5d} BK={bk:5d}  {min(ts)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
