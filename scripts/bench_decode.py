#!/usr/bin/env python
"""Decode throughput bench: tok/s vs KV-context length (the chat_with_recon
serving case — reference g2vlm.py:1305-1410 decodes after a multi-view
recon prefill; at 32 views that is a ~25k-token cache).

  python scripts/bench_decode.py [--contexts 2176,25600] [--batch 1,8]
  (cache contents are random — decode throughput is independent of values)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contexts", type=str, default="2176,25600")
    ap.add_argument("--batch", type=str, default="1,8")
    ap.add_argument("--new_tokens", type=int, default=64)
    ap.add_argument("--kv", type=str, default="bf16", choices=["bf16", "int8"],
                    help="KV cache storage: bf16 or int8 (per-row absmax "
                    "quantized; halves cache HBM + read bandwidth)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from g2vlm_tpu.utils.jax_cache import enable as enable_cache

    enable_cache()
    from g2vlm_tpu.config import G2VLMConfig
    from g2vlm_tpu.inference import decoding
    from g2vlm_tpu.models import mot_decoder

    cfg = G2VLMConfig(visual_und=False).llm
    params = mot_decoder.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    params = jax.tree.map(jax.device_put, params)
    jax.block_until_ready(params)
    n_new = args.new_tokens

    for ctx in [int(x) for x in args.contexts.split(",")]:
        capacity = -(-(ctx + n_new + 8) // 128) * 128
        for b in [int(x) for x in args.batch.split(",")]:
            key = jax.random.PRNGKey(1)

            def mk_cache():
                c = decoding.make_cache(
                    cfg, capacity, dtype=jnp.bfloat16,
                    quantized=(args.kv == "int8"),
                )
                pre = {
                    # fill_cache takes prefill layout (L, S, KVH, HD)
                    "k": jax.random.normal(
                        key,
                        (c.k.shape[0], capacity, c.k.shape[1], c.k.shape[3]),
                        jnp.bfloat16,
                    ) * 0.1,
                }
                pre["v"] = pre["k"] * 0.7 + 0.01
                return decoding.fill_cache(c, pre, ctx)

            if b == 1:
                def run():
                    toks, num, _ = decoding.generate(
                        params, mk_cache(),
                        jnp.asarray(198, jnp.int32),
                        jnp.asarray(ctx, jnp.int32),
                        eos_token_id=-1,  # never fires: fixed token count
                        cfg=cfg, max_new_tokens=n_new,
                        compute_dtype=jnp.bfloat16,
                    )
                    return toks, num
            else:
                def run(b=b):
                    caches = jax.tree.map(
                        lambda x: jnp.broadcast_to(x[None], (b,) + x.shape),
                        mk_cache(),
                    )
                    toks, num, _ = decoding.generate_batched(
                        params, caches,
                        jnp.full((b,), 198, jnp.int32),
                        jnp.full((b,), ctx, jnp.int32),
                        eos_token_id=-1,
                        cfg=cfg, max_new_tokens=n_new,
                        compute_dtype=jnp.bfloat16,
                    )
                    return toks, num

            toks, _ = run()
            np.asarray(jax.tree.leaves(toks)[0].ravel()[0])  # compile+sync
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                toks, _ = run()
                np.asarray(jax.tree.leaves(toks)[0].ravel()[0])
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            tps = b * n_new / dt
            print(
                f"ctx={ctx:6d} B={b} kv={args.kv}  {tps:8.1f} tok/s "
                f"({dt/n_new*1e3:.2f} ms/step)",
                flush=True,
            )


if __name__ == "__main__":
    main()
