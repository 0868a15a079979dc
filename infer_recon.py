#!/usr/bin/env python
"""Multi-view 3D reconstruction CLI — mirrors reference inference_recon.py:
image folder -> .ply point cloud with the G2VLM-2B-MoT checkpoint.

Usage:
  python infer_recon.py --image_folder examples/dl3dv \
      --model_path /path/to/G2VLM-2B-MoT --save_path results/out.ply
Without --model_path, runs the full-size architecture with random weights
(pipeline smoke mode).
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_folder", type=str, required=True)
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--save_path", type=str, default="results/result.ply")
    ap.add_argument("--prompt", type=str, default="Reconstruct the 3D scene.")
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--new_width", type=int, default=518)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random-weight config (harness smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from g2vlm_tpu.utils.jax_cache import enable as enable_jax_cache, honor_platform_env

    honor_platform_env()
    enable_jax_cache()

    from g2vlm_tpu.config import G2VLMConfig
    from g2vlm_tpu.inference.pipeline import G2VLMPipeline
    from g2vlm_tpu.models import g2vlm as jg
    from g2vlm_tpu.utils.ply import save_ply_visualization

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    tokenizer = new_token_ids = None
    if args.model_path:
        from g2vlm_tpu.weights import load_checkpoint
        from g2vlm_tpu.data.tokenizer import load_tokenizer

        params, cfg = load_checkpoint(args.model_path)
        tokenizer, new_token_ids, _ = load_tokenizer(args.model_path)
    else:
        print("no --model_path: using random weights (smoke mode)")
        if args.tiny:
            from g2vlm_tpu.config import tiny_test_config

            cfg = tiny_test_config()
        else:
            cfg = G2VLMConfig(visual_und=False)
        params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)

    pipe = G2VLMPipeline(
        params, cfg, tokenizer=tokenizer, new_token_ids=new_token_ids,
        compute_dtype=dtype,
    )

    names = sorted(
        os.path.join(args.image_folder, f)
        for f in os.listdir(args.image_folder)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    print(f"reconstructing {len(names)} views...")
    pred = pipe.recon(names, prompt=args.prompt, new_width=args.new_width)

    os.makedirs(os.path.dirname(args.save_path) or ".", exist_ok=True)
    stats = save_ply_visualization(pred, args.save_path)
    print(f"wrote {args.save_path}: {stats}")


if __name__ == "__main__":
    main()
