#!/usr/bin/env python
"""A/B the int8-QK prefill against the fp Pallas path on real frames, same
weights, same TPU: isolates the quantization delta of the serving default
(G2VLM_ATTN_INT8). Combined with the recorded bf16-vs-CPU-fp32 parity
(docs/PARITY_FULLSIZE.md, 1.4e-2 of 3e-2), a small delta here bounds the
int8 served path by the triangle inequality; scripts/parity_tpu_bf16.py
re-runs the direct comparison once a reference cache exists.

  python scripts/ab_int8.py --views 16 --images /root/reference/examples/dl3dv
"""

import argparse
import glob as globlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--images", type=str,
                    default="/root/reference/examples/dl3dv")
    ap.add_argument("--new_width", type=int, default=518)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from g2vlm_tpu.utils.jax_cache import enable as enable_cache

    enable_cache()
    from g2vlm_tpu.config import G2VLMConfig
    from g2vlm_tpu.inference.pipeline import G2VLMPipeline
    from g2vlm_tpu.models import g2vlm as jg

    cfg = G2VLMConfig(visual_und=False)
    params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.tree.map(jax.device_put, params)
    jax.block_until_ready(params)

    paths = sorted(
        globlib.glob(f"{args.images}/*.png") + globlib.glob(f"{args.images}/*.jpg")
    )[: args.views]
    assert len(paths) == args.views, (len(paths), args.views)

    outs = {}
    for impl in ("pallas", "pallas_int8"):
        pipe = G2VLMPipeline(params, cfg, attn_impl=impl)
        out = pipe.recon(paths, new_width=args.new_width)
        outs[impl] = {k: np.asarray(v, np.float32) for k, v in out.items()}
        print(f"{impl}: done", flush=True)

    ok = True
    for k in ("local_points", "camera_poses", "global_points", "points"):
        a, b = outs["pallas_int8"][k], outs["pallas"][k]
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        tol = 1.5e-2
        ok &= rel < tol
        print(f"{k:14s} int8-vs-fp max rel {rel:.3e} (tol {tol})"
              f"{'' if rel < tol else '  FAIL'}")
    print("A/B", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
