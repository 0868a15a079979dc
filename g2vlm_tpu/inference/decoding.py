"""Autoregressive decoding with a preallocated TPU-resident KV cache.

Behavioral spec: reference G2VLM.generate_text (g2vlm.py:1070-1141) — greedy /
temperature sampling, stop at eos, batch=1.

TPU design: the reference rebuilds the whole KV cache by scatter every step
(qwen2vl.py:621-638, O(L^2) memory traffic). Here the cache is a fixed
(L, C, KVH, HD) buffer; each step appends via lax.dynamic_update_slice and the
whole generation loop is ONE lax.while_loop inside ONE jitted function — no
host round-trips until the final token buffer is fetched.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LLMConfig
from ..ops.norms import rms_norm
from ..ops.rope import apply_mrope, mrope_cos_sin


class KVCache(NamedTuple):
    k: jax.Array  # (L, C, KVH, HD)
    v: jax.Array
    length: jax.Array  # () int32 — valid prefix


def make_cache(cfg: LLMConfig, capacity: int, dtype=jnp.bfloat16) -> KVCache:
    L, kvh, hd = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    return KVCache(
        k=jnp.zeros((L, capacity, kvh, hd), dtype),
        v=jnp.zeros((L, capacity, kvh, hd), dtype),
        length=jnp.zeros((), jnp.int32),
    )


def fill_cache(cache: KVCache, prefill_kv: Dict, valid_len) -> KVCache:
    """Copy a prefill's per-layer KV (L, S, KVH, HD) into the cache head."""
    s = prefill_kv["k"].shape[1]
    k = jax.lax.dynamic_update_slice(
        cache.k, prefill_kv["k"].astype(cache.k.dtype), (0, 0, 0, 0)
    )
    v = jax.lax.dynamic_update_slice(
        cache.v, prefill_kv["v"].astype(cache.v.dtype), (0, 0, 0, 0)
    )
    return KVCache(k, v, jnp.asarray(valid_len, jnp.int32))


def _decode_layer(lp, x, cache_k, cache_v, cur_len, cos, sin, cfg: LLMConfig, dt):
    """One und-expert decoder layer for a single token (x: (1, D)).
    Returns (hidden, new_k_row, new_v_row)."""
    nh, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    g = nh // kvh

    res = x
    h = rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
    q = (h.astype(dt) @ lp["q"]["w"].astype(dt) + lp["q"]["b"].astype(dt)).reshape(
        1, nh, hd
    )
    k = (h.astype(dt) @ lp["k"]["w"].astype(dt) + lp["k"]["b"].astype(dt)).reshape(
        1, kvh, hd
    )
    v = (h.astype(dt) @ lp["v"]["w"].astype(dt) + lp["v"]["b"].astype(dt)).reshape(
        1, kvh, hd
    )
    if cfg.qk_norm:
        q = rms_norm(q.astype(jnp.float32), lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k.astype(jnp.float32), lp["k_norm"], cfg.rms_norm_eps)
    q, k = apply_mrope(q, k, cos, sin)
    q = q.astype(dt)
    k_row = k.astype(dt)
    v_row = v.astype(dt)

    k_all = jax.lax.dynamic_update_slice(cache_k, k_row, (cur_len, 0, 0))
    v_all = jax.lax.dynamic_update_slice(cache_v, v_row, (cur_len, 0, 0))

    c = k_all.shape[0]
    mask = jnp.arange(c) <= cur_len  # (C,)
    qg = q.reshape(kvh, g, hd).astype(jnp.float32)
    logits = jnp.einsum(
        "ngd,cnd->ngc", qg, k_all.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * (hd ** -0.5)
    logits = jnp.where(mask[None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum(
        "ngc,cnd->ngd", probs, v_all.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    attn = attn.reshape(1, nh * hd).astype(dt)
    attn = attn @ lp["o"]["w"].astype(dt)
    x = res + attn

    res = x
    h = rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps).astype(dt)
    gate = h @ lp["mlp"]["gate"]["w"].astype(dt)
    up = h @ lp["mlp"]["up"]["w"].astype(dt)
    x = res + (jax.nn.silu(gate) * up) @ lp["mlp"]["down"]["w"].astype(dt)
    return x, k_all, v_all


def decode_step(
    params: Dict,
    cache: KVCache,
    token: jax.Array,  # () int32
    rope_pos: jax.Array,  # () int32
    cfg: LLMConfig,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, KVCache]:
    """One decode step (und expert only). Returns (logits (V,), cache')."""
    dt = compute_dtype
    x = params["embed"][token][None, :].astype(dt)  # (1, D)
    pos3 = jnp.broadcast_to(rope_pos, (3, 1))
    cos, sin = mrope_cos_sin(pos3, cfg.head_dim, cfg.rope_theta, cfg.mrope_section)

    def body(x, xs):
        lp, ck, cv = xs
        x, k_all, v_all = _decode_layer(
            lp, x, ck, cv, cache.length, cos, sin, cfg, dt
        )
        return x, (k_all, v_all)

    x, (new_k, new_v) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    h = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = (h.astype(jnp.float32) @ params["lm_head"].astype(jnp.float32))[0]
    return logits, KVCache(new_k, new_v, cache.length + 1)


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new_tokens", "do_sample", "compute_dtype")
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
) -> Tuple[jax.Array, jax.Array]:
    """Greedy/temperature generation as one while_loop. Returns
    (tokens (max_new_tokens,) padded with eos, num_generated)."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    tokens0 = jnp.full((max_new_tokens,), eos_token_id, jnp.int32)

    def cond(state):
        i, tok, pos, cache, toks, key, done = state
        return (~done) & (i < max_new_tokens)

    def body(state):
        i, tok, pos, cache, toks, key, done = state
        logits, cache = decode_step(params, cache, tok, pos, cfg, compute_dtype)
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
    return toks, i


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new_tokens", "do_sample", "compute_dtype")
)
def generate_batched(
    params: Dict,
    caches: KVCache,  # leaves carry a leading batch axis (B, L, C, ...)
    start_tokens: jax.Array,  # (B,) int32
    rope_pos: jax.Array,  # (B,) int32
    eos_token_id: int,
    cfg: LLMConfig,
    max_new_tokens: int = 100,
    do_sample: bool = False,
    temperature: float = 1.0,
    rng_key: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Batched serving decode: B independent sequences (own caches/positions)
    advance in ONE while_loop; per-token weight reads amortize across the
    batch (the decode is weight-bandwidth-bound, so throughput scales nearly
    linearly until the MXU saturates). Finished sequences emit eos and stop
    counting. Returns (tokens (B, max_new_tokens), num_generated (B,)).

    The reference decodes strictly batch=1 (g2vlm.py:1070-1141); this is the
    production-serving extension."""
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
    return toks, num
