#!/usr/bin/env python
"""Training entry point — the loop the reference never released (its train/
holds only FSDP utilities, README.md:54). Joint CE + Pi3 3D training over a
(dp, fsdp, tp) mesh with EMA, Orbax checkpointing, data_status resume, and
profiler hooks.

Usage (smoke, synthetic data):
  python train.py --synthetic --steps 10 --tiny

Real data:
  python train.py --data_config data/configs/joint_train.yaml \
      --checkpoint_dir ckpts --model_path /path/to/G2VLM-2B-MoT
"""

import argparse
import os


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_config", type=str, default=None)
    ap.add_argument("--tokenizer_path", type=str, default=None,
                    help="tokenizer dir (vocab.json/merges.txt) when training "
                         "without a full --model_path checkpoint — text in "
                         "--data_config datasets is encoded with it instead "
                         "of the hash-stub fallback")
    ap.add_argument("--model_path", type=str, default=None,
                    help="init from reference checkpoint dir")
    ap.add_argument("--bootstrap_moe", action="store_true",
                    help="copy base-expert weights into geo experts "
                         "(dense ckpt -> MoT, reference init_moe)")
    ap.add_argument("--checkpoint_dir", type=str, default="ckpts")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--weight_decay", type=float, default=0.05)
    ap.add_argument("--ema_decay", type=float, default=0.9999)
    ap.add_argument("--mu_dtype", type=str, default=None,
                    choices=[None, "float32", "bfloat16"],
                    help="AdamW first-moment storage dtype; bfloat16 saves "
                         "2 bytes/trainable param of optimizer state "
                         "(~4.2 GB at the 2.1B recon stage)")
    ap.add_argument("--factored_v", action="store_true",
                    help="Adafactor-style factored second moments — an "
                         "APPROXIMATION of Adam's nu (without the flag you "
                         "get plain Adam): nu drops from 4 bytes/param to "
                         "~0 — with --mu_dtype bfloat16 the optimizer "
                         "state is ~2 bytes/trainable param, which is what "
                         "fits the single-chip recon stage (the reference's "
                         "lever here is CPU offload, fsdp_utils.py:107-131)")
    ap.add_argument("--ckpt_every", type=int, default=500)
    ap.add_argument("--keep_ckpts", type=int, default=2)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--sequence_parallel", action="store_true",
                    help="shard the packed token axis over the fsdp mesh "
                         "axis for attention (context parallelism; "
                         "parallel/sequence.py)")
    ap.add_argument("--max_num_tokens", type=int, default=36864)
    ap.add_argument("--expected_num_tokens", type=int, default=None,
                    help="packer emit threshold (default 8/9 of "
                         "--max_num_tokens, the reference ratio)")
    ap.add_argument("--image_num_range", type=int, nargs=2, default=(2, 24),
                    help="per-step random view-count range the packer draws "
                         "(reference dataset_base.py:115)")
    ap.add_argument("--max_vit_patches", type=int, default=0,
                    help="fixed ViT patch-row slots per pack (0 = no vit "
                         "branch; required >0 for joint recon+und data)")
    ap.add_argument("--train_conf", action="store_true",
                    help="train the Pi3 confidence head with sky-gated BCE "
                    "(reference train_conf_pi3, pi3_loss.py:146-163); the "
                    "frozen SegFormer supervises from --segformer_pth, the "
                    "checkpoint's Pi3Loss.* keys, or random init")
    ap.add_argument("--segformer_pth", type=str, default=None,
                    help="reference segformer.b0.512x512.ade.160k.pth for "
                    "real sky supervision")
    ap.add_argument("--freeze_und", action="store_true",
                    help="freeze the und expert + semantic ViT")
    ap.add_argument("--freeze_recon", action="store_true",
                    help="freeze the geo expert + recon towers/heads")
    ap.add_argument("--split_layout", action="store_true",
                    help="SPLIT expert layout: packer sorts tokens [und|geo] "
                         "and the MoT runs contiguous single-expert matmuls "
                         "(1x FLOPs vs MIXED's 2x)")
    ap.add_argument("--geo_start_bucket", type=int, default=256)
    ap.add_argument("--remat_group", type=int, default=1,
                    help="checkpoint every N layers of the MoT scan "
                         "(sqrt-remat: /N activation carry, ~+fwd/4 "
                         "recompute; N must divide the layer count)")
    ap.add_argument("--dino_remat_group", type=int, default=1,
                    help="same sqrt-remat for the dino encoder scan "
                         "(N must divide its 24 layers)")
    ap.add_argument("--no_inner_remat", action="store_true",
                    help="with --remat_group N: keep only the GROUP "
                         "checkpoint (the group recompute saves layer "
                         "internals for bwd instead of re-rematting each "
                         "layer — one less fwd pass per step, + one "
                         "group's layer internals of HBM)")
    ap.add_argument("--head_view_chunk", type=int, default=0,
                    help="run Pi3 head decoders over view chunks of this "
                         "size (lax.map) to bound the backward arena; the "
                         "view count must divide evenly (0 = off)")
    ap.add_argument("--tiny", action="store_true", help="tiny config (tests)")
    ap.add_argument("--synthetic", action="store_true",
                    help="synthetic data (no datasets needed)")
    ap.add_argument("--profile_dir", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    return ap.parse_args()


def synthetic_batches(cfg, dp, seed=0):
    """Endless synthetic TrainBatch stream (shapes as the packer emits)."""
    import numpy as np

    from g2vlm_tpu.models.g2vlm import SequenceBuilder
    from g2vlm_tpu.train.trainer import TrainBatch

    n, h, w = 2, 56, 56
    p = cfg.dino_patch_size
    hp = wp = h // p

    def one(s):
        rng = np.random.default_rng(s)
        b = SequenceBuilder(11, 12)
        b.add_text([7, 23, 45])
        b.add_dino_images(n, hp, wp)
        b.add_text(list(rng.integers(20, 400, 5)))
        pre = b.build(pad_to=64)
        ce_idx = np.asarray([pre.seq_len - 3, pre.seq_len - 2, pre.seq_len - 1])
        return TrainBatch(
            text_ids=pre.text_ids.astype(np.int32),
            text_indexes=pre.text_indexes.astype(np.int32),
            dino_indexes=pre.dino_indexes.astype(np.int32),
            vit_indexes=np.zeros((0,), np.int32),
            is_geo=pre.is_geo,
            position_ids=pre.position_ids,
            doc_id=pre.doc_id,
            fn_id=pre.fn_id,
            noise_id=pre.noise_id,
            pos=pre.pos,
            ce_indexes=ce_idx.astype(np.int32),
            ce_labels=rng.integers(0, cfg.llm.vocab_size, 3).astype(np.int32),
            ce_weights=np.ones(3, np.float32),
            dino_images=rng.standard_normal((n, 3, h, w)).astype(np.float32),
            world_points=rng.standard_normal((1, n, h, w, 3)).astype(np.float32),
            point_masks=(rng.random((1, n, h, w)) < 0.9),
            extrinsics=np.tile(np.eye(4, dtype=np.float32), (1, n, 1, 1)),
            normal_batch_mask=np.ones((1,), bool),
        )

    import itertools
    import jax

    for step in itertools.count():
        batches = [one(seed + step * dp + i) for i in range(dp)]
        yield jax.tree.map(lambda *xs: np.stack(xs), *batches)


def packer_batches(args, cfg, new_token_ids, tokenizer, data_status):
    """Real data: YAML config -> dataset groups -> packer -> TrainBatch."""
    import numpy as np

    from g2vlm_tpu.data.packing import PackedIterableDataset, PackerConfig
    from g2vlm_tpu.data.registry import build_groups_from_config, load_yaml_config
    from g2vlm_tpu.train.trainer import TrainBatch

    groups = build_groups_from_config(
        load_yaml_config(args.data_config),
        tokenizer=tokenizer,
        data_status=data_status,
    )
    if new_token_ids is None:
        # no checkpoint tokenizer: special tokens sit at the top of the
        # vocab, like add_special_tokens appends them (reference
        # data/data_utils.py:278-313)
        v = cfg.llm.vocab_size
        new_token_ids = dict(
            bos_token_id=v - 4, eos_token_id=v - 3,
            start_of_image=v - 2, end_of_image=v - 1,
        )
    expected = args.expected_num_tokens or args.max_num_tokens * 8 // 9
    packed = PackedIterableDataset(
        groups,
        new_token_ids,
        PackerConfig(
            expected_num_tokens=expected,
            max_num_tokens_per_sample=min(16384, args.max_num_tokens // 2),
            max_num_tokens=args.max_num_tokens,
            image_num_range=tuple(args.image_num_range),
            sorted_layout=args.split_layout,
            geo_start_bucket=args.geo_start_bucket,
            max_vit_patches=args.max_vit_patches,
        ),
    )
    for b in iter(packed):
        tb = TrainBatch(
            text_ids=b["text_ids"], text_indexes=b["text_indexes"],
            dino_indexes=b["dino_indexes"], vit_indexes=b["vit_indexes"],
            is_geo=b["is_geo"], position_ids=b["position_ids"],
            doc_id=b["doc_id"], fn_id=b["fn_id"], noise_id=b["noise_id"],
            pos=b["pos"], ce_indexes=b["ce_indexes"], ce_labels=b["ce_labels"],
            ce_weights=b["ce_weights"],
            dino_images=b["dino_images"],
            world_points=b["world_points"][None],
            point_masks=b["point_masks"][None],
            extrinsics=b["extrinsics"][None],
            normal_batch_mask=np.ones((1,), bool),
            vit_patches=b.get("vit_patches"),
            vit_coords=b.get("vit_coords"),
            vit_seg=b.get("vit_seg"),
        )
        yield (
            __import__("jax").tree.map(lambda x: x[None], tb),  # dp axis
            b.get("geo_start"),
            b.get("data_indexes", []),
        )


def main():
    args = parse_args()
    import jax

    # The axon TPU plugin force-overrides JAX_PLATFORMS; honor an explicit
    # cpu request (virtual-mesh runs) by re-applying it.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    from g2vlm_tpu.utils.jax_cache import enable as enable_jax_cache

    enable_jax_cache()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from g2vlm_tpu.config import G2VLMConfig, tiny_test_config
    from g2vlm_tpu.models import g2vlm as jg
    from g2vlm_tpu.parallel import mesh as meshlib
    from g2vlm_tpu.train import trainer
    from g2vlm_tpu.train.checkpoint import CheckpointManager
    from g2vlm_tpu.train.logging import (
        StepTimer, create_logger, format_metrics, maybe_profile,
    )

    logger = create_logger(args.checkpoint_dir)
    cfg = (
        tiny_test_config()
        if args.tiny
        else G2VLMConfig(visual_und=args.max_vit_patches > 0)
    )
    if args.train_conf:
        import dataclasses

        cfg = dataclasses.replace(cfg, train_conf_pi3=True)

    n_dev = len(jax.devices())
    fsdp = n_dev // (args.dp * args.tp)
    mesh = meshlib.make_mesh(n_dev, dp=args.dp, fsdp=fsdp, tp=args.tp)
    logger.info(f"mesh: dp={args.dp} fsdp={fsdp} tp={args.tp}")

    tokenizer = new_token_ids = None
    if args.model_path:
        from g2vlm_tpu.weights import load_checkpoint, init_moe_from_dense
        from g2vlm_tpu.data.tokenizer import load_tokenizer

        ckpt_cfg = G2VLMConfig.from_checkpoint_dir(
            args.model_path, train_conf_pi3=args.train_conf
        )
        params, cfg = load_checkpoint(args.model_path, cfg=ckpt_cfg)
        if args.bootstrap_moe:
            params = init_moe_from_dense(params)
        tokenizer, new_token_ids, _ = load_tokenizer(args.model_path)
    else:
        params = jg.init_params(cfg, jax.random.PRNGKey(args.seed), jnp.float32)
        if args.tokenizer_path:
            from g2vlm_tpu.data.tokenizer import load_tokenizer

            tokenizer, new_token_ids, _ = load_tokenizer(args.tokenizer_path)
            assert len(tokenizer) <= cfg.llm.vocab_size, (
                f"tokenizer vocab {len(tokenizer)} exceeds model vocab "
                f"{cfg.llm.vocab_size}"
            )
    if cfg.train_conf_pi3:
        # fill any conf pieces the checkpoint lacked (an un-conf-trained
        # reference ckpt has no conf_decoder/conf_head/Pi3Loss.* keys)
        from g2vlm_tpu.models import pi3_heads, segformer as segf

        ks = iter(jax.random.split(jax.random.PRNGKey(args.seed + 7), 3))
        if "conf_decoder" not in params:
            params["conf_decoder"] = pi3_heads.init_decoder_params(
                cfg.pi3, next(ks), cfg.llm.hidden_size, cfg.pi3.point_out_dim
            )
            params["conf_head"] = pi3_heads.init_pts3d_params(
                next(ks), cfg.pi3.point_out_dim, cfg.dino_patch_size, 1
            )
        if args.segformer_pth:
            from g2vlm_tpu.weights import load_segformer_pth

            params["segformer"] = load_segformer_pth(args.segformer_pth)
            logger.info(f"segformer weights from {args.segformer_pth}")
        elif "segformer" not in params:
            params["segformer"] = segf.init_params(next(ks))
            logger.info(
                "WARNING: no segformer weights (checkpoint or "
                "--segformer_pth) — sky supervision uses RANDOM weights"
            )
    params, _ = meshlib.shard_params(params, mesh)

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1)
    )
    optimizer = trainer.make_optimizer(
        schedule=schedule, weight_decay=args.weight_decay,
        freeze_und=args.freeze_und, freeze_recon=args.freeze_recon,
        params=params,
        mu_dtype=jnp.bfloat16 if args.mu_dtype == "bfloat16" else None,
        factored_v=args.factored_v,
    )
    state = trainer.init_train_state(params, optimizer, ema=True)
    mgr = CheckpointManager(args.checkpoint_dir, keep=args.keep_ckpts)
    data_status = None
    if args.resume and mgr.latest_step() is not None:
        state, data_status = mgr.restore(state)
        logger.info(
            f"resumed at step {int(state.step)} "
            f"data_status={data_status}"
        )

    # one jitted program per geo_start bucket (geo_start is a static arg;
    # the packer buckets it so in practice there are only a few)
    import functools

    sp = (mesh, "fsdp") if args.sequence_parallel and fsdp > 1 else None
    if args.sequence_parallel and sp is None:
        logger.info("--sequence_parallel ignored: fsdp axis is 1")

    @functools.lru_cache(maxsize=8)
    def get_step_fn(geo_start):
        return jax.jit(
            trainer.make_train_step(
                cfg, optimizer,
                compute_dtype=jnp.float32 if args.tiny else jnp.bfloat16,
                ema_decay=args.ema_decay,
                geo_start=geo_start,
                sp=sp,
                head_view_chunk=args.head_view_chunk,
                remat_group=args.remat_group,
                dino_remat_group=args.dino_remat_group,
                remat_inner=not args.no_inner_remat,
            )
        )

    if args.synthetic:
        batches = (
            (b, None, []) for b in synthetic_batches(cfg, args.dp, args.seed)
        )
    else:
        batches = packer_batches(args, cfg, new_token_ids, tokenizer, data_status)

    from g2vlm_tpu.data.packing import fold_data_status

    # running resume cursors, folded per consumed batch and persisted with
    # each checkpoint (reference per-rank data_status, fsdp_utils.py:478-530)
    status = dict(data_status or {})
    timer = StepTimer()
    with mesh:
        for step, (batch, geo_start, dixs) in enumerate(
            batches, start=int(state.step)
        ):
            if step >= args.steps:
                break
            fold_data_status(status, dixs)
            with maybe_profile(args.profile_dir, step, 5, 3):
                state, metrics = get_step_fn(geo_start)(state, batch)
            if step % args.log_every == 0:
                jax.block_until_ready(metrics)
                dt = timer.tick()
                logger.info(format_metrics(step, metrics, timer.avg_step_time))
            if step > 0 and step % args.ckpt_every == 0:
                mgr.save(step, state, data_status=status or None)
                logger.info(f"checkpointed step {step}")
    mgr.save(int(state.step), state, data_status=status or None)
    mgr.wait()
    logger.info("done")


if __name__ == "__main__":
    main()
