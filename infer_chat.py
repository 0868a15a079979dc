#!/usr/bin/env python
"""Spatial-QA chat CLI — mirrors reference inference_chat.py: image(s) +
question -> answer, with the 3D reconstruction natively in-context.

Usage:
  python infer_chat.py --image examples/25_0.jpg \
      --question "How far is the red point from the blue point?" \
      --model_path /path/to/G2VLM-2B-MoT
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", type=str, nargs="+", default=None)
    ap.add_argument("--video", type=str, default=None,
                    help="video file or frame dir (navigation-style demo, "
                         "mirrors inference_chat.ipynb)")
    ap.add_argument("--num_frames", type=int, default=8)
    ap.add_argument(
        "--question",
        type=str,
        default=(
            "The red point and blue point in the image mark two positions. "
            "Which one is closer to the camera?"
        ),
    )
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--max_length", type=int, default=100)
    ap.add_argument("--do_sample", action="store_true")
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random-weight config (harness smoke)")
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from g2vlm_tpu.utils.jax_cache import enable as enable_jax_cache, honor_platform_env

    honor_platform_env()
    enable_jax_cache()

    from g2vlm_tpu.config import G2VLMConfig
    from g2vlm_tpu.inference.pipeline import G2VLMPipeline
    from g2vlm_tpu.models import g2vlm as jg

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
            cfg = G2VLMConfig()
        params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)

    pipe = G2VLMPipeline(
        params, cfg, tokenizer=tokenizer, new_token_ids=new_token_ids,
        compute_dtype=dtype,
    )
    if args.video:
        from g2vlm_tpu.data.video import sample_video_frames

        inputs = sample_video_frames(args.video, args.num_frames)
    else:
        assert args.image, "--image or --video required"
        inputs = args.image
    answer = pipe.chat(
        inputs,
        args.question,
        max_new_tokens=args.max_length,
        do_sample=args.do_sample,
        temperature=args.temperature,
    )
    print(answer)


if __name__ == "__main__":
    main()
