#!/usr/bin/env python
"""Stage-level TPU profile of the 32-view recon forward.

Times each pipeline stage as its own jitted program with device-resident
inputs and single-element syncs (whole-array fetches through the tunnel cost
~0.5s and must not be timed). Used to target kernel work; results recorded
in docs/BENCH_NOTES.md.

  python scripts/profile_recon.py [--views 32] [--stages dino,prefill,heads]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(name, fn, *args, sync, iters=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=(294, 518))
    ap.add_argument(
        "--stages", type=str, default="dino,prefill,heads,heads_sub"
    )
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    from g2vlm_tpu.utils.jax_cache import enable as enable_cache

    enable_cache()
    from g2vlm_tpu.config import G2VLMConfig
    from g2vlm_tpu.models import g2vlm as jg
    from g2vlm_tpu.models import pi3_heads

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
    imgs = jax.device_put(
        jax.random.normal(key, (n, 3, h, w), jnp.float32) * 0.2
    )
    jax.block_until_ready(imgs)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    dt = jnp.bfloat16

    if "dino" in stages:
        f = jax.jit(
            functools.partial(jg.encode_dino_to_llm, cfg=cfg, compute_dtype=dt)
        )
        timeit("dino encode + proj", f, params, imgs, sync=sync)

    builder = jg.SequenceBuilder(151652, 151653)
    builder.add_text([151644] + [200] * 6)
    builder.add_dino_images(n, hp, wp)
    prefill = builder.build()

    if "prefill" in stages:
        f = jax.jit(
            lambda pr, im: jg.prefill_hidden(
                pr, prefill, im, cfg, compute_dtype=dt
            )[0]
        )
        hidden = timeit("full prefill (dino+MoT)", f, params, imgs, sync=sync)
    else:
        hidden = jax.jit(
            lambda pr, im: jg.prefill_hidden(
                pr, prefill, im, cfg, compute_dtype=dt
            )[0]
        )(params, imgs)
    dino_hidden = jax.device_put(
        hidden[jnp.asarray(prefill.dino_indexes)].reshape(n, hw_tok, -1)
    )
    jax.block_until_ready(dino_hidden)

    if "heads" in stages:
        f = jax.jit(
            lambda pr, dh: jg.pi3_predict(pr, dh, (h, w), cfg, compute_dtype=dt)
        )
        timeit("pi3 heads (all)", f, params, dino_hidden, sync=sync)

    if "heads_sub" in stages:
        pos = pi3_heads.patch_positions(n, hp, wp)

        f = jax.jit(
            lambda pr, dh: pi3_heads.decoder_forward(
                pr["point_decoder"], dh, pos, cfg.pi3, compute_dtype=dt
            )
        )
        ph = timeit("  point decoder (5 blk)", f, params, dino_hidden, sync=sync)

        f = jax.jit(
            lambda pr, dh: pi3_heads.decoder_forward(
                pr["global_decoder"], dh, pos, cfg.pi3,
                context=jnp.broadcast_to(dh[:1], dh.shape),
                context_positions=pos, compute_dtype=dt,
            )
        )
        timeit("  global decoder (ctx b=N)", f, params, dino_hidden, sync=sync)

        # the REAL in-model form: batch-1 frame-0 context, K/V projected once
        f = jax.jit(
            lambda pr, dh: pi3_heads.decoder_forward(
                pr["global_decoder"], dh, pos, cfg.pi3,
                context=dh[:1], context_positions=pos[:1], compute_dtype=dt,
            )
        )
        timeit("  global decoder (ctx b=1)", f, params, dino_hidden, sync=sync)

        f = jax.jit(
            lambda pr, x: pi3_heads.linear_pts3d(
                pr["point_head"], x.astype(jnp.float32), (h, w), p
            )
        )
        timeit("  linear_pts3d", f, params, ph, sync=sync)

        ch = jax.jit(
            lambda pr, dh: pi3_heads.decoder_forward(
                pr["camera_decoder"], dh, pos, cfg.pi3, compute_dtype=dt
            )
        )
        chid = timeit("  camera decoder (5 blk)", ch, params, dino_hidden,
                      sync=sync)

        f = jax.jit(
            lambda pr, x: pi3_heads.camera_head(
                pr["camera_head"], x.astype(jnp.float32), hp, wp
            )
        )
        timeit("  camera head", f, params, chid, sync=sync)

    if "pi3_micro" in stages:
        # one pi3 block decomposed: matmuls / rope / attention / layernorm
        from g2vlm_tpu.ops.flash_attention import flash_batched_attention
        from g2vlm_tpu.ops.norms import layer_norm
        from g2vlm_tpu.ops.rope import apply_rope2d_bshd, rope2d_cos_sin

        d = dino_hidden.shape[-1]
        nhh = cfg.pi3.num_heads
        hdd = d // nhh
        pos = pi3_heads.patch_positions(n, hp, wp)
        cos, sin = rope2d_cos_sin(pos, hdd, cfg.pi3.rope_freq)
        bp = jax.tree.map(lambda x: x[0], params["point_decoder"]["blocks"])
        x = dino_hidden.astype(dt)

        def matmuls5(lp, x):
            # chained so XLA can't CSE the 5 repetitions
            acc = x.reshape(-1, d)
            for _ in range(5):
                qkv = acc @ lp["attn"]["qkv"]["w"].astype(dt)
                o = qkv[:, :d] @ lp["attn"]["proj"]["w"].astype(dt)
                h1 = o @ lp["mlp"]["fc1"]["w"].astype(dt)
                acc = h1 @ lp["mlp"]["fc2"]["w"].astype(dt)
            return acc

        timeit("    block matmuls x5", jax.jit(matmuls5), bp, x, sync=sync)

        q = jax.random.normal(key, (n, hw_tok, nhh, hdd), dt)

        def rope10(q):
            out = q
            for _ in range(10):
                out = apply_rope2d_bshd(out, cos, sin)
            return out

        timeit("    rope2d x10", jax.jit(rope10), q, sync=sync)

        def attn5(q):
            out = q
            for _ in range(5):
                out = flash_batched_attention(out, out, out)
            return out

        timeit("    batched attention x5", jax.jit(attn5), q, sync=sync)

        w = jnp.ones((d,), jnp.float32)

        def ln15(x):
            out = x
            for _ in range(15):
                out = layer_norm(out, w, w, 1e-6)
            return out

        timeit("    layer_norm x15", jax.jit(ln15), x, sync=sync)

    if "dino_split" in stages:
        # dino encode with attention stubbed to identity: isolates the
        # matmul/LN/gelu share vs the batched-attention share in context
        import g2vlm_tpu.ops.flash_attention as fa

        orig = fa.flash_batched_attention
        fa.flash_batched_attention = lambda q, k, v, **kw: v
        try:
            f = jax.jit(functools.partial(
                jg.encode_dino_to_llm, cfg=cfg, compute_dtype=dt
            ))
            timeit("    dino encode NO-ATTN", f, params, imgs, sync=sync)
        finally:
            fa.flash_batched_attention = orig

    if "dino_micro" in stages:
        # dino layer pieces: attention at (32,782,16,64), matmul chain at
        # d=1024, gelu
        from g2vlm_tpu.ops.flash_attention import flash_batched_attention

        dd, nhd, hdd = 1024, 16, 64
        sv = 782
        q = jax.random.normal(key, (n, sv, nhd, hdd), dt)

        def attn5(q):
            out = q
            for _ in range(5):
                out = flash_batched_attention(out, out, out)
            return out

        timeit("    dino attention x5", jax.jit(attn5), q, sync=sync)

        x = jax.random.normal(key, (n, sv, dd), dt)
        wq = jax.random.normal(key, (dd, 3 * dd), dt) * 0.02
        wo = jax.random.normal(key, (3 * dd, dd), dt) * 0.02

        def mm5(x):
            acc = x
            for _ in range(5):
                acc = (acc @ wq) @ wo
            return acc

        timeit("    dino matmuls x5 (qkv+o-ish)", jax.jit(mm5), x, sync=sync)

        def gelu15(x):
            out = x
            for _ in range(15):
                out = jax.nn.gelu(out, approximate=False)
            return out

        timeit("    gelu exact x15", jax.jit(gelu15), x, sync=sync)

    if "ln_micro" in stages:
        # layer_norm variants at (32,777,1536) bf16: current vs matmul-stats
        from g2vlm_tpu.ops.norms import layer_norm

        x = jax.random.normal(key, (n, hw_tok, 1536), dt)
        w = jnp.ones((1536,), jnp.float32)

        def chain(f, reps=15):
            def run(x):
                out = x
                for _ in range(reps):
                    out = f(out)
                return out
            return run

        timeit("    ln current x15", jax.jit(chain(
            lambda x: layer_norm(x, w, w, 1e-6))), x, sync=sync)

        dmod = 1536
        ones = jnp.full((dmod, 1), 1.0 / dmod, jnp.float32)

        def ln_mm(x):
            xf = x.astype(jnp.float32)
            x2d = xf.reshape(-1, dmod)
            m1 = x2d @ ones  # (N,1) mean via MXU
            m2 = (x2d * x2d) @ ones
            var = jnp.maximum(m2 - m1 * m1, 0.0)
            y = (x2d - m1) * jax.lax.rsqrt(var + 1e-6)
            return (y * w + w).reshape(x.shape).astype(x.dtype)

        timeit("    ln matmul-stats x15", jax.jit(chain(ln_mm)), x, sync=sync)

        def rms15(x):
            out = x
            for _ in range(15):
                xf = out.astype(jnp.float32)
                r = jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-6)
                out = (xf * r).astype(out.dtype)
            return out

        timeit("    rms-style x15", jax.jit(rms15), x, sync=sync)

    if "act_micro" in stages:
        # activation/elementwise variants at the heads' mlp-hidden shape
        # (32,784,6144) bf16: exact erf gelu vs tanh vs sigmoid gelu vs silu,
        # plus fp32-vs-bf16 rope-mix and residual add
        x = jax.random.normal(key, (n, 784, 6144), dt)

        def chain(f, reps=10):
            def run(x):
                out = x
                for _ in range(reps):
                    out = f(out) * 0.3  # keep magnitudes bounded
                return out
            return run

        timeit("    gelu exact x10", jax.jit(chain(
            lambda x: jax.nn.gelu(x, approximate=False))), x, sync=sync)
        timeit("    gelu tanh  x10", jax.jit(chain(
            lambda x: jax.nn.gelu(x, approximate=True))), x, sync=sync)
        timeit("    gelu sigm  x10", jax.jit(chain(
            lambda x: x * jax.nn.sigmoid(1.702 * x))), x, sync=sync)
        timeit("    silu       x10", jax.jit(chain(jax.nn.silu)), x, sync=sync)
        timeit("    gelu exact fp32 x10", jax.jit(chain(
            lambda x: jax.nn.gelu(
                x.astype(jnp.float32), approximate=False
            ).astype(jnp.bfloat16))), x, sync=sync)

        # rope-mix at the heads' (32,784,16,96) shape: fp32 vs bf16 math
        q = jax.random.normal(key, (n, 784, cfg.pi3.num_heads, 96), dt)
        pos = pi3_heads.patch_positions(n, 294 // 14, 518 // 14)
        pos = jnp.pad(pos, ((0, 0), (0, 784 - pos.shape[1]), (0, 0)))
        from g2vlm_tpu.ops.rope import rope2d_cos_sin

        cos, sin = rope2d_cos_sin(pos, 96, cfg.pi3.rope_freq)

        def mix_fp32(q):
            out = q
            for _ in range(10):
                c = cos[:, :, None, :]
                s = sin[:, :, None, :]
                out = (out.astype(jnp.float32) * c
                       + out.astype(jnp.float32) * s).astype(dt)
            return out

        def mix_bf16(q):
            out = q
            cb = cos.astype(dt)[:, :, None, :]
            sb = sin.astype(dt)[:, :, None, :]
            for _ in range(10):
                out = out * cb + out * sb
            return out

        timeit("    rope-mix fp32 x10", jax.jit(mix_fp32), q, sync=sync)
        timeit("    rope-mix bf16 x10", jax.jit(mix_bf16), q, sync=sync)

    if "exp_micro" in stages:
        # raw exp2 throughput in VMEM (EUP): fp32 vs bf16, plus mult for
        # reference. 100 chained applications on a (512,1024) tile.
        import functools as ft

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def expk(x_ref, o_ref, *, op, reps):
            x = x_ref[...]
            for _ in range(reps):
                x = op(x)
            o_ref[...] = x

        for name, dtp, op in (
            ("exp2 fp32", jnp.float32, lambda x: jnp.exp2(x * 0.5)),
            ("exp2 bf16", jnp.bfloat16, lambda x: jnp.exp2(x * 0.5)),
            ("mult fp32", jnp.float32, lambda x: x * 0.99),
        ):
            x = jax.random.normal(key, (512, 1024), dtp)
            fn = pl.pallas_call(
                ft.partial(expk, op=op, reps=100),
                out_shape=jax.ShapeDtypeStruct((512, 1024), dtp),
                grid=(64,),
                in_specs=[pl.BlockSpec((512, 1024), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((512, 1024), lambda i: (0, 0)),
            )
            j = jax.jit(fn)
            sync(j(x))
            import time as _t

            t0 = _t.perf_counter()
            sync(j(x))
            dt_s = _t.perf_counter() - t0
            n_ops = 512 * 1024 * 100 * 64
            print(f"    {name}: {n_ops/dt_s/1e12:.2f} T elem-ops/s",
                  flush=True)

    if "mot_micro" in stages:
        # MoT layer pieces at the 32-view prefill shape (S~25088 packed)
        from g2vlm_tpu.models.g2vlm import SequenceBuilder
        from g2vlm_tpu.ops.attention import segment_attention
        from g2vlm_tpu.ops.norms import rms_norm
        from g2vlm_tpu.ops.rope import apply_mrope, mrope_cos_sin

        lcfg = cfg.llm
        s_tok = len(prefill.doc_id)
        nh_l, kvh, hd_l = (
            lcfg.num_attention_heads, lcfg.num_key_value_heads, lcfg.head_dim,
        )
        q = jax.random.normal(key, (s_tok, nh_l, hd_l), dt)
        kk = jax.random.normal(key, (s_tok, kvh, hd_l), dt)
        cos, sin = mrope_cos_sin(
            jnp.asarray(prefill.position_ids), hd_l, lcfg.rope_theta,
            lcfg.mrope_section,
        )
        info = prefill.token_info()

        def mrope5(q, kk):
            for _ in range(5):
                q, kk = apply_mrope(q, kk, cos, sin)
            return q, kk

        timeit("    mrope x5", jax.jit(mrope5), q, kk, sync=sync)

        w = jnp.ones((hd_l,), jnp.float32)

        def qknorm5(q):
            out = q
            for _ in range(5):
                out = rms_norm(out.astype(jnp.float32), w).astype(dt)
            return out

        timeit("    qk rms_norm x5 (fp32)", jax.jit(qknorm5), q, sync=sync)

        def attn2(q, kk):
            o1 = segment_attention(q, kk, kk, info, info)
            o2 = segment_attention(o1, kk, kk, info, info)
            return o2

        timeit("    segment attention x2", jax.jit(attn2), q, kk, sync=sync)

    if "seg_sweep" in stages:
        # segment-kernel block sweep at the 32-view prefill shape
        from g2vlm_tpu.ops.flash_attention import flash_segment_attention

        lcfg = cfg.llm
        s_tok = len(prefill.doc_id)
        nh_l, kvh, hd_l = (
            lcfg.num_attention_heads, lcfg.num_key_value_heads, lcfg.head_dim,
        )
        q = jax.random.normal(key, (s_tok, nh_l, hd_l), dt)
        kk = jax.random.normal(key, (s_tok, kvh, hd_l), dt)
        info = prefill.token_info()
        cfgs = os.environ.get("G2VLM_SWEEP_CFGS")
        if cfgs:
            pairs = [
                tuple(int(v) for v in c.split("x")) for c in cfgs.split(",")
            ]
        else:
            pairs = [(512, 1024), (512, 1536), (256, 1536), (512, 2048),
                     (1024, 1024), (256, 1024)]
        for bq_, bk_ in pairs:
            def run(q, kk, bq_=bq_, bk_=bk_):
                o = flash_segment_attention(
                    q, kk, kk, info, info, block_q=bq_, block_kv=bk_
                )
                return flash_segment_attention(
                    o, kk, kk, info, info, block_q=bq_, block_kv=bk_
                )

            try:
                timeit(f"    seg ({bq_},{bk_}) x2", jax.jit(run), q, kk,
                       sync=sync)
            except Exception as e:
                print(f"    seg ({bq_},{bk_}): FAIL {type(e).__name__}",
                      flush=True)

    if "attn_sweep" in stages:
        # batched-kernel variants at the pi3-head shape (B=32, S=777, H=16,
        # D=96): heads-per-step sweep + dense reference
        from g2vlm_tpu.ops import flash_attention as fa
        from g2vlm_tpu.ops.attention import dense_attention

        d = dino_hidden.shape[-1]
        nhh = cfg.pi3.num_heads
        hdd = d // nhh
        q = jax.random.normal(key, (n, hw_tok, nhh, hdd), dt)

        def prep(x, block):
            pad = -(-hw_tok // block) * block - hw_tok
            x = jnp.swapaxes(x, 1, 2)
            if pad:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
            return x

        for hb in (1, 2, 4):
            block = -(-hw_tok // 8) * 8

            def run(q, hb=hb, block=block):
                qp = prep(q, block)
                out = q
                for _ in range(5):
                    o = fa._batched_fwd(
                        qp, qp, qp, hdd ** -0.5, block, block, hw_tok,
                        False, False, hb=hb,
                    )
                    qp = o
                return qp

            timeit(f"    batched fwd hb={hb:2d} x5", jax.jit(run), q,
                   sync=sync)

        def dense5(q):
            out = q
            for _ in range(5):
                out = dense_attention(out, out, out)
            return out

        timeit("    dense attention x5", jax.jit(dense5), q, sync=sync)


if __name__ == "__main__":
    main()
