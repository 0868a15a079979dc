#!/usr/bin/env python
"""Served-path numeric validation: TPU bf16 + Pallas + GEO_MAIN vs the cached
CPU-fp32 PyTorch reference outputs (VERDICT r2 weak #1 / next #2b).

All round-2 parity ran CPU fp32 with chunked attention; what actually serves
(bf16, the static-max exp2 Pallas kernel, GEO_MAIN routing, fused uint8
preprocess) only ever produced random-weight checksums. This runs the REAL
weights-from-torch forward on the TPU in bf16 against a reference cache
produced by scripts/parity_fullsize.py --ref_cache, at a bf16-justified
tolerance.

Two comparisons:
  model   — recon_from_views on the SAME host-preprocessed frames the
            reference consumed (isolates model numerics: bf16+Pallas+routing)
  served  — recon_from_frames on raw uint8 frames (adds the fused device
            resize/normalize path, i.e. the full serving pipeline)

  python scripts/parity_tpu_bf16.py --views 16 \
      --images /root/reference/examples/dl3dv \
      --ref_cache results/ref_dl3dv_16v.npz
"""

import argparse
import glob as globlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def report(tag, got, ref):
    ok = True
    for k in ("local_points", "camera_poses", "global_points", "points"):
        a = np.asarray(got[k], np.float32)
        b = np.asarray(ref[k], np.float32)
        err = np.abs(a - b).max()
        # bf16 has ~3 decimal digits; points scale O(1..10) after norm
        scale = np.abs(b).max()
        rel = err / max(scale, 1e-6)
        tol = 3e-2
        print(f"[{tag}] {k}: max abs err {err:.3e} (rel {rel:.3e}, "
              f"ref scale {scale:.2f}, tol {tol:g} rel)", flush=True)
        ok &= rel < tol
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--images", type=str,
                    default="/root/reference/examples/dl3dv")
    ap.add_argument("--ref_cache", type=str, required=True)
    ap.add_argument("--new_width", type=int, default=518)
    ap.add_argument("--out_cache", type=str, default=None,
                    help="save OUR TPU-bf16 outputs here (feeds the "
                         "eval_camera/eval_points --pred_npz harness runs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from g2vlm_tpu.utils.jax_cache import enable as enable_cache, honor_platform_env

    honor_platform_env()
    enable_cache()

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import torch_ref

    torch_ref.install()

    from g2vlm_tpu.config import G2VLMConfig
    from g2vlm_tpu.data.images import load_views
    from g2vlm_tpu.models import g2vlm as jg

    ref = dict(np.load(args.ref_cache))
    cfg = G2VLMConfig(visual_und=False)

    # the same seed-deterministic reference weights parity_fullsize.py built
    # (torch manual_seed(0) + uniform_): rebuild WITHOUT running the torch
    # forward, map to our pytree, cast to bf16
    from modeling.g2vlm.qwen2vl import Qwen2VLConfig, Qwen2VLForCausalLM
    from modeling.dinov2_with_registers.configuration_dinov2_with_registers import (
        Dinov2WithRegistersConfig,
    )
    from modeling.g2vlm.dinov2_model import Dinov2WithRegistersModel
    from modeling.g2vlm.g2vlm import G2VLM, G2VLMConfig as RefG2VLMConfig

    t0 = time.time()
    llm_cfg = Qwen2VLConfig(
        vocab_size=cfg.llm.vocab_size,
        hidden_size=cfg.llm.hidden_size,
        intermediate_size=cfg.llm.intermediate_size,
        num_hidden_layers=cfg.llm.num_hidden_layers,
        num_attention_heads=cfg.llm.num_attention_heads,
        num_key_value_heads=cfg.llm.num_key_value_heads,
        qk_norm=True,
        layer_module="Qwen2VLMoTDecoderLayer",
        attn_implementation="eager",
        rope_scaling={"type": "mrope",
                      "mrope_section": list(cfg.llm.mrope_section)},
    )
    dino_cfg = Dinov2WithRegistersConfig(
        hidden_size=cfg.dino.hidden_size,
        num_hidden_layers=cfg.dino.num_hidden_layers,
        num_attention_heads=cfg.dino.num_attention_heads,
        image_size=cfg.dino.image_size,
        patch_size=cfg.dino.patch_size,
        num_register_tokens=cfg.dino.num_register_tokens,
        attn_implementation="eager",
    )
    ref_cfg = RefG2VLMConfig(
        visual_und=False, visual_recon=True,
        llm_config=llm_cfg, vit_config=None, dino_config=dino_cfg,
    )
    torch.manual_seed(0)
    with torch.no_grad():
        model = G2VLM(
            Qwen2VLForCausalLM(llm_cfg), None,
            Dinov2WithRegistersModel(dino_cfg), ref_cfg,
        ).eval()
        for p in model.parameters():
            p.uniform_(-0.02, 0.02)
    # map on HOST: the fp32 tree is ~9GB — built on the TPU it would sit
    # next to the bf16 copy and starve the forward of HBM
    with jax.default_device(jax.devices("cpu")[0]):
        params = jg.params_from_torch(model.state_dict(), cfg)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    del model
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    print(f"[{time.time()-t0:.0f}s] weights mapped to bf16 on "
          f"{jax.devices()[0].platform}", flush=True)

    paths = sorted(
        globlib.glob(os.path.join(args.images, "*.png"))
        + globlib.glob(os.path.join(args.images, "*.jpg"))
    )[: args.views]
    assert len(paths) == args.views

    # the parity prefill uses the SAME seeded random prompt ids as
    # parity_fullsize.py (rng(0): 6 ints in [100, 5000))
    rng = np.random.default_rng(0)
    prompt_ids = [151644] + [int(x) for x in rng.integers(100, 5000, 6)]

    views = load_views(paths, new_width=args.new_width)  # fp32 [0,1] (N,3,H,W)
    n, _, h, w = views.shape
    p = cfg.dino_patch_size

    from g2vlm_tpu.data.images import resnet_normalize

    builder = jg.SequenceBuilder(151652, 151653)
    builder.add_text(prompt_ids)
    builder.add_dino_images(n, h // p, w // p)
    prefill = builder.build()

    # jit with the prefill metadata closed over (static routing), exactly as
    # the serving pipeline does (inference/pipeline.py _make_recon_fn) —
    # eager dispatch would hold every layer activation in HBM and OOM
    @jax.jit
    def recon_fn(p_, images):
        return jg.recon_forward(
            p_, prefill, images, cfg, compute_dtype=jnp.bfloat16,
            attn_impl="auto",
        )

    normed = jnp.asarray(resnet_normalize(views), jnp.bfloat16)
    got = recon_fn(params, normed)
    got = {k: np.asarray(v, np.float32) for k, v in got.items()
           if hasattr(v, "shape")}
    print(f"[{time.time()-t0:.0f}s] TPU bf16 forward done", flush=True)
    if args.out_cache:
        np.savez(args.out_cache, **got)
        print(f"saved outputs to {args.out_cache}", flush=True)
    ok = report("model: bf16+Pallas on host-preprocessed frames", got, ref)

    # full served path: raw uint8 frames -> fused device preprocess (the
    # recon_from_frames input stage), then the same parity prefill
    from PIL import Image

    frames = np.stack(
        [np.asarray(Image.open(pa).convert("RGB")) for pa in paths]
    )
    from g2vlm_tpu.data.device_preprocess import (
        preprocess_views_device, target_hw,
    )

    th, tw = target_hw(frames.shape[1], frames.shape[2], args.new_width, p)
    dev_views = preprocess_views_device(jnp.asarray(frames), (th, tw))
    got2 = recon_fn(params, dev_views.astype(jnp.bfloat16))
    got2 = {k: np.asarray(v, np.float32) for k, v in got2.items()
            if hasattr(v, "shape")}
    print(f"[{time.time()-t0:.0f}s] served uint8 path done", flush=True)
    ok2 = report("served: uint8 fused preprocess", got2, ref)

    print("TPU BF16 PARITY OK" if (ok and ok2) else "TPU BF16 PARITY FAIL")
    sys.exit(0 if (ok and ok2) else 1)


if __name__ == "__main__":
    main()
