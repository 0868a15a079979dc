"""Autoregressive decoding with a preallocated TPU-resident KV cache.

Behavioral spec: reference G2VLM.generate_text (g2vlm.py:1070-1141) — greedy /
temperature sampling, stop at eos, batch=1.

TPU design: the reference rebuilds the whole KV cache by scatter every step
(qwen2vl.py:621-638, O(L^2) memory traffic). Here the cache is a fixed
(L, C, KVH, HD) buffer carried THROUGH the layer scan and updated in place
with lax.dynamic_update_slice (carrying it as scan xs/ys would double-buffer
the whole cache — the 2x that made B=8 @ 25.6k-ctx OOM in round 2); the whole
generation loop is ONE lax.while_loop inside ONE jitted function — no host
round-trips until the final token buffer is fetched.

Serving extensions beyond the reference's batch=1 greedy loop:
  * generate_batched — B independent sequences in one while_loop.
  * int8-quantized KV (make_cache(quantized=True)): per-(position, head)
    absmax scales, dequantized inside the attention read. Halves cache HBM
    and its read bandwidth.
  * generate_tp — the cache's context axis sharded over a mesh axis
    (flash-decoding across chips): each chip attends over its KV shard and
    the partial softmax statistics merge with one pmax+psum per layer.
    Scales long-context serving over ICI without touching head counts
    (Qwen2-VL-2B has only 2 kv heads, so head-sharding caps at tp=2;
    context-sharding scales to the whole mesh).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import LLMConfig
from ..ops.norms import rms_norm
from ..ops.rope import apply_mrope, mrope_cos_sin


class KVCache(NamedTuple):
    # (L, KVH, C, HD): head-major so the minor dims are (context, head_dim)
    # — the natural (sublane, lane) tiling for both bf16 and int8. A
    # context-minor layout ((L, C, KVH, HD)) made XLA relayout the buffers
    # inside the decode loop, which broke donation (a full cache copy per
    # generate call) and padded int8 tiles 2x — the round-3 B=8 @25.6k OOM.
    k: jax.Array  # int8 when quantized
    v: jax.Array
    k_scale: Optional[jax.Array]  # (L, KVH, C) fp32 absmax/127; None if not
    v_scale: Optional[jax.Array]  # quantized
    length: jax.Array  # () int32 — valid prefix


def make_cache(
    cfg: LLMConfig, capacity: int, dtype=jnp.bfloat16, quantized: bool = False
) -> KVCache:
    L, kvh, hd = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    kv_dtype = jnp.int8 if quantized else dtype
    scale = (
        jnp.zeros((L, kvh, capacity), jnp.float32) if quantized else None
    )
    return KVCache(
        k=jnp.zeros((L, kvh, capacity, hd), kv_dtype),
        v=jnp.zeros((L, kvh, capacity, hd), kv_dtype),
        k_scale=scale,
        v_scale=None if scale is None else jnp.zeros_like(scale),
        length=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "capacity", "dtype", "quantized"),
    donate_argnums=(0,),  # the prefill KV is consumed: inside jit the
    # zeros+update fuses into one buffer write, so peak residency is
    # kv + cache instead of kv + zeros + filled (3x KV at 32-view chat)
)
def build_cache(
    prefill_kv: Dict, valid_len: jax.Array, cfg: LLMConfig, capacity: int,
    dtype=jnp.bfloat16, quantized: bool = False,
) -> KVCache:
    """fill_cache(make_cache(...)) in one donating jit."""
    cache = make_cache(cfg, capacity, dtype=dtype, quantized=quantized)
    return fill_cache(cache, prefill_kv, valid_len)


def _quant(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """int8-quantize over the last (head_dim) axis.
    x (..., KVH, HD) -> (int8 same shape, fp32 scale (..., KVH))."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-10)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(
        jnp.int8
    )
    return q, s[..., 0]


def fill_cache(cache: KVCache, prefill_kv: Dict, valid_len) -> KVCache:
    """Copy a prefill's per-layer KV (L, S, KVH, HD) into the cache head.

    Layer-by-layer (lax.map): transposing + quantizing the whole (L, S,
    KVH, HD) stack at once materializes fp32 intermediates of 28x the
    per-layer size (~5.5G at a 48k-token chat prefill), which OOMs next to
    the resident params; per-layer temps are ~50MB and the op is pure
    bandwidth (~2G moved) either way."""
    cap = cache.k.shape[2]
    quantized = cache.k_scale is not None
    dtype = cache.k.dtype

    def one_layer(kv):
        kl = jnp.swapaxes(kv[0], 0, 1)  # (KVH, S, HD)
        vl = jnp.swapaxes(kv[1], 0, 1)
        pad = ((0, 0), (0, cap - kl.shape[1]), (0, 0))
        if quantized:
            kl, sk = _quant(kl)
            vl, sv = _quant(vl)
            spad = ((0, 0), (0, cap - sk.shape[1]))
            return (jnp.pad(kl, pad), jnp.pad(vl, pad),
                    jnp.pad(sk, spad), jnp.pad(sv, spad))
        return jnp.pad(kl.astype(dtype), pad), jnp.pad(vl.astype(dtype), pad)

    outs = jax.lax.map(one_layer, (prefill_kv["k"], prefill_kv["v"]))
    if quantized:
        k, v, ks, vs = outs
    else:
        (k, v), ks, vs = outs, None, None
    return KVCache(k, v, ks, vs, jnp.asarray(valid_len, jnp.int32))


def _attend(q, k_all, v_all, k_scale, v_scale, visible, hd, tp_axis,
            k_self, v_self, self_here):
    """Softmax attention of one query token over a (local) cache shard PLUS
    the token's own fresh K/V row (which is NOT yet in the cache — the cache
    is read-only inside the layer scan; all layers' new rows are written with
    one dynamic_update_slice per step outside it).

    q (KVH, G, HD) fp32; k_all/v_all (KVH, C_loc, HD); scales (KVH, C_loc)
    or None; visible (C_loc,) bool; k_self/v_self (KVH, HD) fp32; self_here
    () bool — False on every chip but the position owner under tp, so the
    psum counts the self term exactly once. With tp_axis set this is the
    per-chip body of flash-decoding: local max/sum statistics merge exactly
    across the context shards with one pmax + psum (softmax is
    shift-invariant)."""
    kf = k_all.astype(jnp.float32)
    vf = v_all.astype(jnp.float32)
    logits = jnp.einsum(
        "ngd,ncd->ngc", q, kf, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    if k_scale is not None:
        # dequant folded AFTER the GEMM: the per-(position, head) scale is a
        # row scaling of the logits — (KVH, G, C) elementwise instead of
        # (KVH, C, HD), i.e. head_dim x less VPU work than scaling K itself
        logits = logits * k_scale[:, None, :]
    logits = jnp.where(visible[None, None, :], logits, -jnp.inf)
    s_self = jnp.einsum("ngd,nd->ng", q, k_self) * (hd ** -0.5)  # (KVH, G)
    s_self = jnp.where(self_here, s_self, -jnp.inf)
    m = jnp.maximum(jnp.max(logits, axis=-1), s_self)  # (KVH, G)
    if tp_axis is not None:
        m = jax.lax.pmax(m, tp_axis)
    # the self term is always visible somewhere, so m is finite
    p = jnp.exp(logits - m[..., None])
    p = jnp.where(visible[None, None, :], p, 0.0)
    p_self = jnp.where(self_here, jnp.exp(s_self - m), 0.0)  # (KVH, G)
    l = jnp.sum(p, axis=-1) + p_self
    pv = p if v_scale is None else p * v_scale[:, None, :]
    acc = jnp.einsum(
        "ngc,ncd->ngd", pv, vf, preferred_element_type=jnp.float32
    ) + p_self[..., None] * v_self[:, None, :]
    if tp_axis is not None:
        l = jax.lax.psum(l, tp_axis)
        acc = jax.lax.psum(acc, tp_axis)
    return acc / jnp.maximum(l, 1e-30)[..., None]  # (KVH, G, HD)


def decode_step(
    params: Dict,
    cache: KVCache,
    token: jax.Array,  # () int32
    rope_pos: jax.Array,  # () int32
    cfg: LLMConfig,
    compute_dtype=jnp.bfloat16,
    tp_axis: Optional[str] = None,
) -> Tuple[jax.Array, KVCache]:
    """One decode step (und expert only). Returns (logits (V,), cache').

    Inside shard_map with tp_axis set, cache leaves hold the LOCAL context
    shard (C_loc = C / n_tp, contiguous blocks in mesh-axis order) and
    params are replicated; attention merges across chips (see _attend).

    The layer scan reads the cache as xs slices (read-only) and attends over
    [cached rows < length] + the fresh self row computed analytically; the
    new K/V rows of ALL layers are collected as tiny scan outputs and written
    with ONE dynamic_update_slice per step. No per-layer gather/scatter on
    the (L, KVH, C, ...) buffers — per-layer scatter made XLA double-buffer
    the cache and blew up batched compiles."""
    dt = compute_dtype
    nh, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    g = nh // kvh
    quantized = cache.k_scale is not None
    x = params["embed"][token][None, :].astype(dt)  # (1, D)
    pos3 = jnp.broadcast_to(rope_pos, (3, 1))
    cos, sin = mrope_cos_sin(pos3, cfg.head_dim, cfg.rope_theta, cfg.mrope_section)

    cur = cache.length
    c_loc = cache.k.shape[2]
    if tp_axis is not None:
        shard = jax.lax.axis_index(tp_axis)
        offset = (shard * c_loc).astype(jnp.int32)
        owns = (cur >= offset) & (cur < offset + c_loc)
    else:
        offset = jnp.zeros((), jnp.int32)
        owns = jnp.ones((), bool)
    local_pos = jnp.clip(cur - offset, 0, c_loc - 1)
    # cache rows at the current position are stale — only strictly-older
    # rows are visible; the current token's K/V enters via the self term
    visible = (jnp.arange(c_loc, dtype=jnp.int32) + offset) < cur

    def body(x, xs):
        lp, k_all, v_all, ksc, vsc = xs
        res = x
        h = rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        q = (
            h.astype(dt) @ lp["q"]["w"].astype(dt) + lp["q"]["b"].astype(dt)
        ).reshape(1, nh, hd)
        k = (
            h.astype(dt) @ lp["k"]["w"].astype(dt) + lp["k"]["b"].astype(dt)
        ).reshape(1, kvh, hd)
        v = (
            h.astype(dt) @ lp["v"]["w"].astype(dt) + lp["v"]["b"].astype(dt)
        ).reshape(1, kvh, hd)
        if cfg.qk_norm:
            q = rms_norm(q.astype(jnp.float32), lp["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k.astype(jnp.float32), lp["k_norm"], cfg.rms_norm_eps)
        q, k = apply_mrope(q, k, cos, sin)
        k_row = k[0].astype(jnp.float32)  # (KVH, HD)
        v_row = v[0].astype(jnp.float32)

        qg = q.reshape(kvh, g, hd).astype(jnp.float32)
        attn = _attend(
            qg, k_all, v_all, ksc, vsc, visible, hd, tp_axis,
            k_self=k_row, v_self=v_row, self_here=owns,
        )
        attn = attn.reshape(1, nh * hd).astype(dt)
        x = res + attn @ lp["o"]["w"].astype(dt)

        res = x
        h = rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps).astype(dt)
        gate = h @ lp["mlp"]["gate"]["w"].astype(dt)
        up = h @ lp["mlp"]["up"]["w"].astype(dt)
        x = res + (jax.nn.silu(gate) * up) @ lp["mlp"]["down"]["w"].astype(dt)
        return x, (k_row, v_row)

    xs = (params["layers"], cache.k, cache.v, cache.k_scale, cache.v_scale)
    x, (k_rows, v_rows) = jax.lax.scan(body, x, xs)  # rows: (L, KVH, HD) f32

    def write_rows(buf, rows, scales_buf):
        """One in-place write of all layers' new rows at local_pos (a no-op
        value-wise on shards that don't own the position). rows (L, KVH, HD);
        buf (L, KVH, C, HD); scales (L, KVH, C)."""
        if quantized:
            qrows, srows = _quant(rows)  # srows (L, KVH)
            srows = jnp.where(owns, srows, _row_slice(scales_buf, local_pos))
            scales_buf = jax.lax.dynamic_update_slice(
                scales_buf, srows[:, :, None], (0, 0, local_pos)
            )
            rows = qrows
        old = _row_slice(buf, local_pos)
        rows = jnp.where(owns, rows.astype(buf.dtype), old)
        buf = jax.lax.dynamic_update_slice(
            buf, rows[:, :, None], (0, 0, local_pos) + (0,) * (buf.ndim - 3)
        )
        return buf, scales_buf

    ck, cks = write_rows(cache.k, k_rows, cache.k_scale)
    cv, cvs = write_rows(cache.v, v_rows, cache.v_scale)

    h = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    # compute-dtype GEMM with fp32 accumulation: an fp32 upcast of lm_head
    # here materializes a ~0.9G weight copy inside the loop and runs the
    # MXU at fp32 rate; bf16 inputs + preferred fp32 keep full accumulate
    # precision (and fp32 mode is unchanged: dt == fp32 there)
    logits = jax.lax.dot_general(
        h.astype(dt), params["lm_head"].astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]
    return logits, KVCache(ck, cv, cks, cvs, cache.length + 1)


def _row_slice(buf, pos):
    """buf (L, KVH, C, ...) -> the (L, KVH, ...) row at context pos."""
    sizes = buf.shape[:2] + (1,) + buf.shape[3:]
    start = (0, 0, pos) + (0,) * (buf.ndim - 3)
    return jax.lax.dynamic_slice(buf, start, sizes)[:, :, 0]


def _generate_loop(
    params, cache, start_token, rope_pos, eos_token_id, cfg, max_new_tokens,
    do_sample, temperature, rng_key, compute_dtype, tp_axis=None,
):
    tokens0 = jnp.full((max_new_tokens,), eos_token_id, jnp.int32)

    def cond(state):
        i, tok, pos, cache, toks, key, done = state
        return (~done) & (i < max_new_tokens)

    def body(state):
        i, tok, pos, cache, toks, key, done = state
        logits, cache = decode_step(
            params, cache, tok, pos, cfg, compute_dtype, tp_axis=tp_axis
        )
        if do_sample:
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, logits / temperature)
        else:
            nxt = jnp.argmax(logits)
        nxt = nxt.astype(jnp.int32)
        toks = toks.at[i].set(nxt)
        done = nxt == eos_token_id
        return (i + 1, nxt, pos + 1, cache, toks, key, done)

    state = (
        jnp.zeros((), jnp.int32),
        start_token.astype(jnp.int32),
        rope_pos.astype(jnp.int32),
        cache,
        tokens0,
        rng_key,
        jnp.zeros((), bool),
    )
    i, _, _, cache, toks, _, _ = jax.lax.while_loop(cond, body, state)
    # the final cache is RETURNED so XLA can alias the donated input cache
    # to it — donation only aliases inputs to OUTPUTS, so without this the
    # loop carry is a full extra cache copy (2x KV residency). Callers may
    # discard it, or keep it for multi-turn continuation.
    return toks, i, cache


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype"),
    donate_argnums=(1,),
)
def extend_cache(
    params: Dict,
    cache: KVCache,
    tokens: jax.Array,  # (T,) int32 — e.g. a follow-up user turn; pad to a
    # bucket so turn lengths share one program
    rope_pos: jax.Array,  # () int32 — rope position of tokens[0]
    cfg: LLMConfig,
    n_tokens: Optional[jax.Array] = None,  # () int32 — real prefix of tokens
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, KVCache]:
    """Teacher-forced cache extension for multi-turn chat: feed `tokens`
    through the decode step (each appends its KV row in place), discarding
    the sampled outputs. Returns (last token's logits (V,), cache').

    The reference has no multi-turn API at all (chat_with_recon rebuilds the
    full prefill per question, g2vlm.py:1306-1410); here a follow-up turn
    costs T decode steps against the live cache instead of a fresh ~48k
    prefill. Token-for-token identical to having included the text in the
    prefill: text rows are causal and their mRoPE position is the scalar
    rope counter, exactly like decode rows."""
    t = tokens.shape[0]
    n = jnp.asarray(t if n_tokens is None else n_tokens, jnp.int32)
    v = params["lm_head"].shape[1]

    def body(state):
        i, pos, cache, logits = state
        logits, cache = decode_step(
            params, cache, tokens[i], pos, cfg, compute_dtype
        )
        return (i + 1, pos + 1, cache, logits)

    def cond(state):
        return state[0] < n

    _, _, cache, logits = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), rope_pos.astype(jnp.int32), cache,
         jnp.zeros((v,), jnp.float32)),
    )
    return logits, cache


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "do_sample", "compute_dtype"),
    donate_argnums=(1,),  # cache buffers alias the loop carry in place on
    # TPU (no donation -> input copy -> 2x KV residency); callers must not
    # reuse a cache object after generate consumes it
)
def generate(
    params: Dict,
    cache: KVCache,
    start_token: jax.Array,  # () int32
    rope_pos: jax.Array,  # () int32 — rope position of the start token
    eos_token_id: int,
    cfg: LLMConfig,
    max_new_tokens: int = 100,
    do_sample: bool = False,
    temperature: float = 1.0,
    rng_key: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Greedy/temperature generation as one while_loop. Returns
    (tokens (max_new_tokens,) padded with eos, num_generated, final cache).
    The returned cache aliases the donated input in place (multi-turn
    continuation is free); discard it if unused."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    return _generate_loop(
        params, cache, start_token, rope_pos, eos_token_id, cfg,
        max_new_tokens, do_sample, temperature, rng_key, compute_dtype,
    )


def generate_tp(
    params: Dict,
    cache: KVCache,
    start_token: jax.Array,
    rope_pos: jax.Array,
    eos_token_id: int,
    cfg: LLMConfig,
    mesh,
    axis_name: str = "tp",
    max_new_tokens: int = 100,
    do_sample: bool = False,
    temperature: float = 1.0,
    rng_key: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Context-sharded (flash-decoding) generation over `axis_name`: the KV
    cache's context axis is partitioned across the mesh (22.4G of B=8 32-view
    chat KV is 2.8G/chip on a v5e-8), params are replicated, and every chip
    runs the same decode step with a pmax+psum softmax merge per layer.
    Token-for-token equal to single-device `generate` (softmax statistics
    merge exactly; see tests/test_multichip.py).

    Capacity must divide the axis size. The serving fix for round 2's
    batched long-context OOM (docs/BENCH_NOTES.md) — combine with vmap/jit
    batch sharding over `dp` for B>1."""
    from ..parallel.mesh import shard_map_compat

    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    n = mesh.shape[axis_name]
    assert cache.k.shape[2] % n == 0, (
        f"cache capacity {cache.k.shape[2]} must divide {axis_name}={n}"
    )
    ctx = P(None, None, axis_name)
    cache_spec = KVCache(
        k=P(None, None, axis_name, None),
        v=P(None, None, axis_name, None),
        k_scale=None if cache.k_scale is None else ctx,
        v_scale=None if cache.v_scale is None else ctx,
        length=P(),
    )
    body = functools.partial(
        _generate_loop,
        eos_token_id=eos_token_id,
        cfg=cfg,
        max_new_tokens=max_new_tokens,
        do_sample=do_sample,
        temperature=temperature,
        compute_dtype=compute_dtype,
        tp_axis=axis_name,
    )
    fn = shard_map_compat(
        lambda p, c, st, rp, key: body(p, c, st, rp, rng_key=key),
        mesh=mesh,
        in_specs=(P(), cache_spec, P(), P(), P()),
        out_specs=(P(), P(), cache_spec),
    )
    return jax.jit(fn, donate_argnums=(1,))(
        params, cache, jnp.asarray(start_token, jnp.int32),
        jnp.asarray(rope_pos, jnp.int32), rng_key,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "do_sample", "compute_dtype"),
    donate_argnums=(1,),  # see generate: caches are consumed
)
def generate_batched(
    params: Dict,
    caches: KVCache,  # leaves carry a leading batch axis (B, L, KVH, C, ...)
    start_tokens: jax.Array,  # (B,) int32
    rope_pos: jax.Array,  # (B,) int32
    eos_token_id: int,
    cfg: LLMConfig,
    max_new_tokens: int = 100,
    do_sample: bool = False,
    temperature: float = 1.0,
    rng_key: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Batched serving decode: B independent sequences (own caches/positions)
    advance in ONE while_loop; per-token weight reads amortize across the
    batch (the decode is weight-bandwidth-bound, so throughput scales nearly
    linearly until the MXU saturates). Finished sequences emit eos and stop
    counting. Returns (tokens (B, max_new_tokens), num_generated (B,),
    final caches — aliasing the donated inputs, for multi-turn reuse).

    The reference decodes strictly batch=1 (g2vlm.py:1070-1141); this is the
    production-serving extension. For multi-chip serving, device_put the
    caches with a batch-axis NamedSharding before calling — every per-
    sequence op is batch-parallel, so GSPMD runs each shard's sequences
    entirely on their own chip (tests/test_multichip.py)."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    b = start_tokens.shape[0]
    tokens0 = jnp.full((b, max_new_tokens), eos_token_id, jnp.int32)

    step = jax.vmap(
        lambda c, t, p: decode_step(params, c, t, p, cfg, compute_dtype)
    )

    def cond(state):
        i, tok, pos, caches, toks, num, key, done = state
        return (~jnp.all(done)) & (i < max_new_tokens)

    def body(state):
        i, tok, pos, caches, toks, num, key, done = state
        logits, caches = step(caches, tok, pos)  # (B, V)
        if do_sample:
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(done, eos_token_id, nxt.astype(jnp.int32))
        toks = toks.at[:, i].set(nxt)
        num = num + (~done).astype(jnp.int32)
        done = done | (nxt == eos_token_id)
        return (i + 1, nxt, pos + 1, caches, toks, num, key, done)

    state = (
        jnp.zeros((), jnp.int32),
        start_tokens.astype(jnp.int32),
        rope_pos.astype(jnp.int32),
        caches,
        tokens0,
        jnp.zeros((b,), jnp.int32),
        rng_key,
        jnp.zeros((b,), bool),
    )
    _, _, _, caches, toks, num, _, _ = jax.lax.while_loop(cond, body, state)
    # returned so the donated input caches alias the carry (see generate)
    return toks, num, caches
