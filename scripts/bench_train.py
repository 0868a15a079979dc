#!/usr/bin/env python
"""Full-scale training-step benchmark on one chip (VERDICT r2 #6).

The real thing: 28-layer 2B MoT + DINOv2-L + Qwen ViT branch, a 36864-token
pack (reference max_num_tokens, dataset_base.py:64-66), remat on the layer
scan, Pallas flash fwd+bwd. Reports ms/step, tokens/s/chip and an MFU
estimate with the stage split.

Single-chip memory note: a 2.4B AdamW step (params+grads+m+v) needs ~25GB
and belongs on an fsdp-sharded mesh (params/device scales 1/N — the driver
dryrun proves that path). Here the fwd+bwd (the compute that defines MFU) is
timed at full scale, and the AdamW+EMA update is timed on a tree slice and
scaled linearly (it is purely elementwise/bandwidth-bound, so the
extrapolation is exact to first order); both numbers are reported separately.

  python scripts/bench_train.py [--tokens 36864] [--views 40]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=36864)
    ap.add_argument("--views", type=int, default=40)
    ap.add_argument("--hw", type=int, nargs=2, default=(294, 518))
    ap.add_argument("--no_vit", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--remat_group", type=int, default=1,
                    help="checkpoint every N layers in the MoT scan "
                         "(sqrt-remat: /N carry memory, +~fwd/4 recompute)")
    ap.add_argument("--no_remat", action="store_true",
                    help="disable gradient checkpointing entirely (right-"
                         "sized small packs leave the HBM headroom; kills "
                         "the ~1.35x recompute tax)")
    ap.add_argument("--no_inner_remat", action="store_true",
                    help="with --remat_group N: keep only the GROUP "
                         "checkpoint; the group recompute saves layer "
                         "internals instead of re-rematting per layer "
                         "(one less fwd pass, + one group's internals HBM)")
    ap.add_argument("--dino_remat_group", type=int, default=1,
                    help="same sqrt-remat for the 24-layer dino scan "
                         "(must divide 24)")
    ap.add_argument("--mu_dtype", type=str, default=None,
                    choices=[None, "bfloat16"],
                    help="AdamW first moment dtype for the opt/EMA slice "
                         "timing (train.py --mu_dtype production option)")
    ap.add_argument("--factored_v", action="store_true",
                    help="Adafactor-style factored second moments for the "
                         "opt slice timing (train.py --factored_v): nu "
                         "drops from 4 bytes/param to ~0")
    ap.add_argument("--no_ema", action="store_true",
                    help="skip the EMA update in the opt slice (EMA adds "
                         "2-4 bytes/param of state + one elementwise pass)")
    ap.add_argument("--vit_images", type=int, default=1,
                    help="number of 768-budget semantic images in the pack "
                         "(und-SFT packs with >1 image raise the pack fill "
                         "and amortize the weight-grad pass)")
    ap.add_argument("--head_view_chunk", type=int, default=8,
                    help="Pi3-head view chunk (lax.map) bounding the head "
                         "backward arena; 0 = all views at once")
    ap.add_argument("--freeze_und", action="store_true",
                    help="recon-stage step: grad only wrt the geo partition "
                         "(ViT + und expert frozen, no dW buffers — the "
                         "memory-real form of the reference freeze flags)")
    ap.add_argument("--freeze_recon", action="store_true",
                    help="und-SFT-stage step: grad only wrt ViT + und expert")
    ap.add_argument("--freeze_text", action="store_true",
                    help="also freeze embed/lm_head (pure recon stage: "
                         "dino + geo expert + Pi3 heads trainable)")
    ap.add_argument("--xla_opt", action="append", default=[],
                    help="k=v TPU compiler option (forwarded per-compile "
                         "via lower().compile(compiler_options=...), e.g. "
                         "xla_tpu_enable_latency_hiding_scheduler=false)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config smoke (CPU; validates plumbing only)")
    args = ap.parse_args()
    if args.tiny:
        args.tokens, args.views, args.hw = 256, 2, (56, 56)

    import jax
    import jax.numpy as jnp

    from g2vlm_tpu.utils.jax_cache import enable as enable_cache, honor_platform_env

    honor_platform_env()
    enable_cache()

    import optax

    from g2vlm_tpu.config import G2VLMConfig, tiny_test_config
    from g2vlm_tpu.models import g2vlm as jg
    from g2vlm_tpu.train import trainer

    cfg = (tiny_test_config(visual_und=not args.no_vit) if args.tiny
           else G2VLMConfig(visual_und=not args.no_vit))
    params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.tree.map(jax.device_put, params)
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e9:.2f}B "
          f"({sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))/1e9:.1f} GB bf16)",
          flush=True)

    # ---- build one full-size packed batch ----
    h, w = args.hw
    p = cfg.dino_patch_size
    hp, wp = h // p, w // p
    hw_tok = hp * wp
    n = args.views
    rng = np.random.default_rng(0)

    # sorted [und | geo] layout (packing.py sorted_layout): text + ViT first,
    # dino spans last -> static geo_start drives the SPLIT expert mode
    # (contiguous single-expert matmuls, 1x FLOPs — the production training
    # configuration, train.py --sorted_layout)
    b = jg.SequenceBuilder(151652, 151653)
    b.add_text([151644] + list(rng.integers(100, 5000, 6)))
    vit_payload = {}
    if not args.no_vit:
        from g2vlm_tpu.models.qwen_vit import pack_views

        # N 768-budget semantic images (grid 2x54x54 -> 729 merged tokens
        # each); und-SFT packs with several images raise pack fill
        gh = gw = 4 if args.tiny else 54
        views = []
        for _ in range(args.vit_images):
            pats = rng.standard_normal(
                (gh * gw, cfg.vit.in_channels * 2 * cfg.vit.patch_size ** 2)
            ).astype(np.float32)
            views.append({"patches": pats, "grid_thw": (1, gh, gw)})
        vit_patches, vit_coords, vit_seg, n_merged = pack_views(
            views, pad_to=args.vit_images * gh * gw
        )
        for _ in range(args.vit_images):
            b.add_vit_image(gh // 2, gw // 2)
        vit_payload = dict(
            vit_patches=jnp.asarray(vit_patches),
            vit_coords=jnp.asarray(vit_coords),
            vit_seg=jnp.asarray(vit_seg),
        )
    q_ids = list(rng.integers(100, 5000, 24))
    b.add_text(q_ids)
    n_ce = 16
    ce_idx = np.arange(b.curr - n_ce, b.curr)
    geo_start = b.curr  # [und | geo] boundary (padding rows land geo-side)
    b.add_dino_images(n, hp, wp)
    assert b.curr <= args.tokens, (b.curr, args.tokens)
    pre = b.build(pad_to=args.tokens)
    print(f"pack: {pre.seq_len} real tokens (pad to {args.tokens}), "
          f"{n} views @ {h}x{w}, geo_start={geo_start}", flush=True)
    batch = trainer.TrainBatch(
        text_ids=jnp.asarray(pre.text_ids, jnp.int32),
        text_indexes=jnp.asarray(pre.text_indexes, jnp.int32),
        dino_indexes=jnp.asarray(pre.dino_indexes, jnp.int32),
        vit_indexes=jnp.asarray(
            pre.vit_indexes if not args.no_vit else np.zeros((0,), np.int32),
            jnp.int32,
        ),
        is_geo=jnp.asarray(pre.is_geo),
        position_ids=jnp.asarray(pre.position_ids),
        doc_id=jnp.asarray(pre.doc_id),
        fn_id=jnp.asarray(pre.fn_id),
        noise_id=jnp.asarray(pre.noise_id),
        pos=jnp.asarray(pre.pos),
        ce_indexes=jnp.asarray(ce_idx, jnp.int32),
        ce_labels=jnp.asarray(
            rng.integers(0, cfg.llm.vocab_size, n_ce), jnp.int32
        ),
        ce_weights=jnp.ones((n_ce,), jnp.float32),
        dino_images=jnp.asarray(
            rng.standard_normal((n, 3, h, w)), jnp.float32
        ),
        world_points=jnp.asarray(
            rng.standard_normal((1, n, h, w, 3)), jnp.float32
        ),
        point_masks=jnp.asarray(rng.random((1, n, h, w)) < 0.9),
        extrinsics=jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (1, n, 1, 1))
        ),
        normal_batch_mask=jnp.ones((1,), bool),
        **vit_payload,
    )
    jax.block_until_ready(jax.tree.leaves(batch))

    # ---- fwd+bwd at full scale ----
    def loss_fn(p):
        total, details = trainer.train_forward(
            p, batch, cfg, compute_dtype=jnp.bfloat16, attn_impl="auto",
            remat=not args.no_remat, geo_start=geo_start,
            remat_group=args.remat_group,
            remat_inner=not args.no_inner_remat,
            dino_remat_group=args.dino_remat_group,
            head_view_chunk=(args.head_view_chunk
                             if args.views % max(args.head_view_chunk, 1) == 0
                             else 0),
        )
        return total, details

    # consume grads INSIDE the program (global-norm reduction): a full bf16
    # grad tree as program OUTPUT is another 9.35G next to 9.35G params +
    # temps, which exceeds single-chip HBM. Production training shards
    # params/grads over fsdp (the driver dryrun path); the fwd+bwd compute
    # measured here is identical — XLA just frees each grad buffer at its
    # reduction instead of keeping it live to the end.
    #
    # Full-JOINT single-chip is physically out: 9.35G bf16 params + ~9G
    # simultaneously-live stacked layer grads > 15.75G HBM before any
    # activation. The staged configs below (reference stage training /
    # freeze flags, trainer.freeze_labels) take the grad ONLY wrt the
    # trainable partition, so frozen towers contribute no dW buffers —
    # the memory-real form of the freeze flags (multi_transform zeroes
    # updates but still materializes full grads).
    import jax.tree_util as jtu

    if args.freeze_und or args.freeze_recon:
        labels = trainer.freeze_labels(
            params, args.freeze_und, args.freeze_recon
        )
        if args.freeze_text:
            flat_pl, ldef = jtu.tree_flatten_with_path(labels)
            lab = []
            for path, l in flat_pl:
                keys = [p.key for p in path if hasattr(p, "key")]
                if keys[0] == "llm" and keys[1] in ("embed", "lm_head"):
                    l = "frozen"
                lab.append(l)
            labels = jtu.tree_unflatten(ldef, lab)
        flat_p, treedef = jtu.tree_flatten(params)
        flat_l = jtu.tree_leaves(labels)
        assert len(flat_p) == len(flat_l)
        train_idx = [i for i, l in enumerate(flat_l) if l == "train"]
        frozen_idx = [i for i, l in enumerate(flat_l) if l == "frozen"]
        train_list = [flat_p[i] for i in train_idx]
        frozen_list = [flat_p[i] for i in frozen_idx]
        n_train = sum(x.size for x in train_list)
        print(f"trainable: {n_train/1e9:.2f}B of {n_params/1e9:.2f}B "
              f"(freeze_und={args.freeze_und} freeze_recon={args.freeze_recon})",
              flush=True)

        def rebuild(tl, fl):
            out = [None] * len(flat_l)
            for i, x in zip(train_idx, tl):
                out[i] = x
            for i, x in zip(frozen_idx, fl):
                out[i] = x
            return jtu.tree_unflatten(treedef, out)

        def step_fn(tl, fl):
            (loss, details), grads = jax.value_and_grad(
                lambda t: loss_fn(rebuild(t, fl)), has_aux=True
            )(tl)
            gnorm = optax.global_norm(grads)
            return loss, details, gnorm

        grad_fn = jax.jit(step_fn)
        grad_args = (train_list, frozen_list)
        opt_scale_n = n_train
    else:
        def step_fn(p):
            (loss, details), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p)
            gnorm = optax.global_norm(grads)
            return loss, details, gnorm

        grad_fn = jax.jit(step_fn)
        grad_args = (params,)
        opt_scale_n = n_params
    if os.environ.get("G2VLM_LOWER_ONLY"):
        txt = grad_fn.lower(*grad_args).as_text()
        import re

        sizes = {}
        for m in re.finditer(r"tensor<([0-9x]+)x(f32|bf16|i32|i8)>", txt):
            dims = [int(x) for x in m.group(1).split("x")]
            b = int(np.prod(dims)) * (4 if m.group(2) in ("f32", "i32")
                                      else 2 if m.group(2) == "bf16" else 1)
            sizes[m.group(0)] = b
        for k, v in sorted(sizes.items(), key=lambda kv: -kv[1])[:20]:
            print(f"{v/1e9:8.2f} GB  {k}")
        return
    t0 = time.perf_counter()
    if args.xla_opt:
        opts = dict(kv.split("=", 1) for kv in args.xla_opt)
        print(f"compiler_options: {opts}", flush=True)
        grad_fn = grad_fn.lower(*grad_args).compile(compiler_options=opts)
    loss, details, gnorm = grad_fn(*grad_args)
    np.asarray(gnorm.ravel()[0])
    print(f"compile+first step: {time.perf_counter()-t0:.0f}s "
          f"loss={float(loss):.3f} grad_norm={float(gnorm):.3f}", flush=True)
    ts = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        loss, details, gnorm = grad_fn(*grad_args)
        np.asarray(gnorm.ravel()[0])
        ts.append(time.perf_counter() - t0)
    fwd_bwd = min(ts)

    # ---- optimizer+EMA on a tree slice, scaled (elementwise/bandwidth) ----
    # a ~0.3B slice: AdamW+EMA is elementwise/bandwidth-bound so the linear
    # scale-up is exact to first order; the full param tree is freed first
    # (grad timing is done) so slice p+m+v+ema+g has the chip to itself
    slice_tree = {"dino": jax.tree.map(jnp.copy, params["dino"])}
    jax.block_until_ready(slice_tree)
    del params, grad_args, grad_fn
    if args.freeze_und or args.freeze_recon:
        del train_list, frozen_list, flat_p
    slice_n = sum(x.size for x in jax.tree.leaves(slice_tree))
    opt = trainer.make_optimizer(
        learning_rate=1e-4, b1=0.9, b2=0.95, weight_decay=0.05,
        mu_dtype=jnp.bfloat16 if args.mu_dtype else None,
        factored_v=args.factored_v,
    )
    opt_state = jax.jit(opt.init)(slice_tree)
    state_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(opt_state)
        if hasattr(x, "dtype")
    )
    print(f"opt state: {state_bytes / slice_n:.2f} bytes/param on the slice "
          f"(factored_v={args.factored_v}, mu_dtype={args.mu_dtype}, "
          f"ema={not args.no_ema})", flush=True)

    @jax.jit
    def opt_step(p, s, g, ema):
        upd, s = opt.update(g, s, p)
        p = optax.apply_updates(p, upd)
        if ema is not None:
            ema = jax.tree.map(lambda e, q: e * 0.9999 + q * 0.0001, ema, p)
        return p, s, ema

    g_slice = jax.tree.map(lambda x: x * 0.0, slice_tree)
    ema = None if args.no_ema else jax.tree.map(jnp.copy, slice_tree)
    out = opt_step(slice_tree, opt_state, g_slice, ema)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = opt_step(slice_tree, opt_state, g_slice, ema)
        np.asarray(jax.tree.leaves(out[0])[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    opt_t = min(ts) * (opt_scale_n / slice_n)

    step = fwd_bwd + opt_t
    toks_s = args.tokens / step

    # MFU: fwd matmul FLOPs = 2 * active_params_in_path * S (SPLIT routing
    # runs ONE expert per token) + attention 4*S^2*D*H_layers; bwd = 2x fwd.
    s_real = pre.seq_len
    d, L = cfg.llm.hidden_size, cfg.llm.num_hidden_layers
    per_layer = (
        d * d + 2 * d * (cfg.llm.num_key_value_heads * cfg.llm.head_dim)
        + d * d + 3 * d * cfg.llm.intermediate_size
    )
    llm_flops = 2 * s_real * (L * per_layer + 2 * d * cfg.llm.vocab_size * 0)
    attn_flops = 4 * s_real * s_real * d * L
    dino_p = 0.3e9
    dino_flops = 2 * (n * (hw_tok + 5)) * dino_p
    heads_flops = 2 * (n * hw_tok) * 0.2e9
    # ViT tower (und-SFT stages execute it on every step — useful model
    # FLOPs the r3 estimate silently dropped, understating und-SFT MFU):
    # 32 layers at PRE-merge length + quadratic per-image attention +
    # the PatchMerger MLP at merged length.
    vit_flops = 0.0
    if not args.no_vit:
        vd, vdep = cfg.vit.embed_dim, cfg.vit.depth
        vit_layer_params = vdep * 12 * vd * vd            # qkvo + 4x MLP
        m2 = cfg.vit.spatial_merge_size ** 2
        merger_params = (vd * m2) ** 2 + vd * m2 * cfg.vit.hidden_size
        s_img = gh * gw                                    # pre-merge/image
        p_premerge = args.vit_images * s_img
        vit_flops = (
            2 * p_premerge * vit_layer_params
            + 4 * args.vit_images * s_img * s_img * vd * vdep
            + 2 * (p_premerge // m2) * merger_params
        )
    fwd_flops = llm_flops + attn_flops + dino_flops + heads_flops + vit_flops
    # bwd = dX (1x fwd) + dW GEMMs only for the trainable partition
    dw_frac = opt_scale_n / n_params
    total_flops = (2 + dw_frac) * fwd_flops
    mfu = total_flops / step / 197e12
    print(
        f"fwd+bwd {fwd_bwd*1e3:.0f} ms + optimizer/EMA {opt_t*1e3:.0f} ms "
        f"(measured on {slice_n/1e9:.2f}B slice, scaled) = {step*1e3:.0f} ms/step",
        flush=True,
    )
    print(
        f"tokens/s/chip {toks_s:,.0f} (real {s_real/step:,.0f})  "
        f"est. MFU {mfu*100:.0f}% "
        f"(~{total_flops/1e12:.1f} TFLOP/step of which ViT "
        f"{ (2 + dw_frac) * vit_flops/1e12:.1f}, v5e peak 197 TF bf16)",
        flush=True,
    )
    print(f"details: { {k: round(float(v), 4) for k, v in details.items()} }",
          flush=True)


if __name__ == "__main__":
    main()
