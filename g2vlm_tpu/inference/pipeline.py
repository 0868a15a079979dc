"""High-level inference pipelines mirroring the reference entry points
(inference_recon.py / inference_chat.py) with jitted, shape-bucketed forwards.

Reference flow (g2vlm.py:1240-1410) loops Python-side over cache-update
phases; here each public call lowers to one or two XLA programs per shape
bucket, cached across calls.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import G2VLMConfig
from ..data.images import load_views, resnet_normalize
from ..models import g2vlm as jg

RECON_PROMPT = "Reconstruct the 3D scene."


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _HashableArrays:
    """Wraps host-built metadata so it can key an lru_cache by content."""

    def __init__(self, payload):
        self.payload = payload
        leaves = jax.tree_util.tree_leaves(payload)
        self._hash = hash(
            tuple(
                x.tobytes() if isinstance(x, np.ndarray) else x for x in leaves
            )
        )

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        if not (isinstance(other, _HashableArrays) and self._hash == other._hash):
            return False
        # hash match is necessary but not sufficient: compare the payloads so
        # a 64-bit collision can't silently reuse a wrong compiled program
        a = jax.tree_util.tree_leaves(self.payload)
        b = jax.tree_util.tree_leaves(other.payload)
        if len(a) != len(b):
            return False
        return all(
            np.array_equal(x, y)
            if isinstance(x, np.ndarray) or isinstance(y, np.ndarray)
            else x == y
            for x, y in zip(a, b)
        )


class ChatSession(NamedTuple):
    """Live multi-turn chat state (serving extension — the reference has no
    multi-turn API; chat_with_recon rebuilds the full prefill per question,
    g2vlm.py:1306-1410). The cache is consumed (donated) by chat_continue:
    use each session object at most once."""

    cache: object  # decoding.KVCache
    next_rope_pos: int
    pending_token: int  # emitted but not yet consumed (eos on a clean stop)
    capacity: int
    quantized_kv: bool


class G2VLMPipeline:
    """Owns params + config + jit caches for recon / chat."""

    def __init__(
        self,
        params: Dict,
        cfg: G2VLMConfig,
        tokenizer=None,
        new_token_ids: Optional[Dict[str, int]] = None,
        compute_dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        seq_pad_multiple: int = 256,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.new_token_ids = new_token_ids or dict(
            bos_token_id=151644, eos_token_id=151645,
            start_of_image=151652, end_of_image=151653,
        )
        self.compute_dtype = compute_dtype
        if (
            attn_impl == "auto"
            and jax.default_backend() == "tpu"
            and os.environ.get("G2VLM_ATTN_INT8", "0") == "1"
        ):
            # OPT-IN quantized serving mode (G2VLM_ATTN_INT8=1): int8 QK^T
            # prefill attention — the v5e MXU runs int8 at 2x bf16, worth
            # +0.97 fps at 32-view recon (18.73 vs 17.76). NOT the default:
            # per-layer quantization noise compounds across the 28-layer MoT
            # to ~1.3e-1 max rel on the recon outputs (results/
            # ab_int8_r4.log), an order past the 3e-2 bf16 parity budget.
            # Training never takes this path (the quantizer has no VJP).
            attn_impl = "pallas_int8"
        self.attn_impl = attn_impl
        self.seq_pad_multiple = seq_pad_multiple
        self._recon_jit = functools.lru_cache(maxsize=16)(self._make_recon_fn)
        self._chat_prefill_jit = functools.lru_cache(maxsize=8)(
            self._make_chat_prefill_fn
        )
        self._chat_prefill_u8_jit = functools.lru_cache(maxsize=8)(
            self._make_chat_prefill_u8_fn
        )
        self._chat_encode_u8_jit = functools.lru_cache(maxsize=8)(
            self._make_chat_encode_u8_fn
        )
        self._chat_prefill_emb_jit = functools.lru_cache(maxsize=8)(
            self._make_chat_prefill_emb_fn
        )

    # ------------------------------------------------------------------
    def _encode_text(self, text: str, add_bos: bool = False) -> List[int]:
        if self.tokenizer is None:
            # Deterministic fake ids for weight-free smoke/bench runs.
            # (crc32, not hash(): str hash is randomized per process)
            import zlib

            ids = [
                (zlib.crc32(w.encode()) % 5000) + 100 for w in text.split()
            ]
        else:
            ids = self.tokenizer.encode(text)
        if add_bos:
            ids = [self.new_token_ids["bos_token_id"]] + ids
        return ids

    def _start_token(self) -> int:
        """Decode start token per reference prepare_start_tokens
        (g2vlm.py:1042-1068) — see data/tokenizer.py:derive_start_token."""
        from ..data.tokenizer import derive_start_token

        return derive_start_token(self.tokenizer, self.new_token_ids)

    def _make_recon_fn(self, shape_key):
        """One jitted recon program per (n_views, H, W, prompt). The prefill
        metadata is host-built and closed over as compile-time constants so
        expert routing (GEO_MAIN fixup) stays static."""
        n, h, w, prompt = shape_key
        p = self.cfg.dino_patch_size
        prefill = self.build_recon_prefill(n, h // p, w // p, prompt)

        def fn(params, images):
            return jg.recon_forward(
                params, prefill, images, self.cfg,
                compute_dtype=self.compute_dtype, attn_impl=self.attn_impl,
            )

        return jax.jit(fn)

    def _make_chat_prefill_fn(self, key: "_HashableArrays"):
        prefill, vit_coords, vit_seg = key.payload
        # convert OUTSIDE the traced fn: inside a trace jnp.asarray yields a
        # Tracer, which would disable prefill_hidden's host-side ViT
        # row-chunking (the memory lever for many-image chat prefills)
        vit_coords_j = jnp.asarray(vit_coords)
        vit_seg_j = jnp.asarray(vit_seg)

        def fn(params, dino_images, vit_patches):
            return jg.prefill_hidden(
                params,
                prefill,
                dino_images,
                self.cfg,
                compute_dtype=self.compute_dtype,
                attn_impl=self.attn_impl,
                vit_patches=vit_patches,
                vit_coords=vit_coords_j,
                vit_seg=vit_seg_j,
                return_kv=True,
            )

        return jax.jit(fn)

    def _make_chat_prefill_u8_fn(self, key: "_HashableArrays"):
        """Device-preprocess chat prefill: ONE program does dino resize/
        normalize + Qwen-ViT bicubic/CLIP/patchify from raw uint8 frames,
        then the packed prefill (serving counterpart of chat()'s host path,
        like recon_from_frames vs recon)."""
        prefill, vit_coords, vit_seg, dims = key.payload
        h0, w0, th, tw, pat_pad = dims
        vit_coords_j = jnp.asarray(vit_coords)
        vit_seg_j = jnp.asarray(vit_seg)

        def fn(params, frames):
            from ..data.device_preprocess import (
                preprocess_views_device, preprocess_vit_frames_device,
            )

            views = preprocess_views_device(frames, (th, tw))
            vit_patches = preprocess_vit_frames_device(
                frames, pad_to=pat_pad, out_dtype=self.compute_dtype
            )
            return jg.prefill_hidden(
                params,
                prefill,
                views.astype(self.compute_dtype),
                self.cfg,
                compute_dtype=self.compute_dtype,
                attn_impl=self.attn_impl,
                vit_patches=vit_patches,
                vit_coords=vit_coords_j,
                vit_seg=vit_seg_j,
                return_kv=True,
            )

        return jax.jit(fn)

    def _make_chat_encode_u8_fn(self, key):
        """Per-chunk tower program for the chunked-upload chat path: uint8
        frames chunk -> device preprocess -> dino encode + packed ViT encode.
        Running view chunks in separate programs lets chunk i's tower compute
        overlap chunk i+1's host->device transfer (the same overlap
        recon_from_frames uses for its dino-only prefill)."""
        from ..data.device_preprocess import (
            preprocess_views_device, preprocess_vit_frames_device,
            vit_device_grid,
        )
        from ..models import qwen_vit

        nc, h0, w0, th, tw = key
        grid = vit_device_grid()
        per = int(np.prod(grid))
        coords = jnp.asarray(
            np.concatenate([qwen_vit.merge_permuted_hw_coords(grid)] * nc)
        )
        seg_np = np.repeat(np.arange(nc, dtype=np.int32), per)
        seg = jnp.asarray(seg_np)
        row_chunks = qwen_vit.packed_row_chunks(seg_np)

        def fn(params, frames):
            views = preprocess_views_device(frames, (th, tw))
            dino_emb = jg.encode_dino_to_llm(
                params, views.astype(self.compute_dtype), self.cfg,
                self.compute_dtype,
            )
            vit_patches = preprocess_vit_frames_device(
                frames, out_dtype=self.compute_dtype
            )
            vit_emb = qwen_vit.encode_packed(
                params["vit"], vit_patches, coords, seg, self.cfg.vit,
                self.compute_dtype, attn_impl=self.attn_impl,
                row_chunks=row_chunks,
            )
            return dino_emb, vit_emb

        return jax.jit(fn)

    def _make_chat_prefill_emb_fn(self, key: "_HashableArrays"):
        """Main chat prefill consuming pre-encoded tower tokens from the
        per-chunk programs (chunked-upload overlap path)."""
        prefill, chunks = key.payload

        def fn(params, dino_embs, vit_embs):
            return jg.prefill_hidden(
                params,
                prefill,
                None,
                self.cfg,
                compute_dtype=self.compute_dtype,
                attn_impl=self.attn_impl,
                dino_emb=jnp.concatenate(dino_embs, axis=0),
                vit_emb=jnp.concatenate(vit_embs, axis=0),
                return_kv=True,
            )

        return jax.jit(fn)

    def build_recon_prefill(
        self, n_views: int, hp: int, wp: int, prompt: str = RECON_PROMPT
    ) -> jg.PackedPrefill:
        ids = self._encode_text(prompt, add_bos=True)
        b = jg.SequenceBuilder(
            self.new_token_ids["start_of_image"], self.new_token_ids["end_of_image"]
        )
        b.add_text(ids)
        b.add_dino_images(n_views, hp, wp)
        pad_to = _round_up(b.curr, self.seq_pad_multiple)
        return b.build(pad_to=pad_to)

    def recon(
        self,
        images: Sequence,
        prompt: str = RECON_PROMPT,
        new_width: int = 518,
    ) -> Dict[str, np.ndarray]:
        """Image paths/arrays -> dict(points, local_points, camera_poses,
        global_points[, conf]) as numpy, mirroring G2VLM.recon
        (g2vlm.py:1240-1303) plus the original [0,1] images."""
        views = load_views(images, new_width=new_width)  # (N,3,H,W) in [0,1]
        out = self.recon_from_views(views, prompt=prompt)
        out = {k: np.asarray(v) for k, v in out.items()}
        out["images"] = views
        return out

    def recon_from_views(
        self, views: np.ndarray, prompt: str = RECON_PROMPT
    ) -> Dict[str, jax.Array]:
        """Device-side recon on preloaded [0,1] views (N,3,H,W). Outputs stay
        on device (fetch with np.asarray when needed)."""
        n, _, h, w = views.shape
        normed = jnp.asarray(resnet_normalize(views))
        fn = self._recon_jit((n, h, w, prompt))
        return fn(self.params, normed)

    def recon_from_frames(
        self,
        frames: np.ndarray,  # (N, H0, W0, 3) uint8 decoded frames
        prompt: str = RECON_PROMPT,
        new_width: int = 518,
    ) -> Dict[str, jax.Array]:
        """Recon straight from decoded uint8 frames: raw bytes upload (3-4x
        less host->device transfer than fp32) and ONE XLA program does
        cast -> antialiased bilinear resize -> RESNET normalize -> packed
        prefill -> heads (data/device_preprocess.py). The serving-path
        counterpart of the reference's host-side PIL pipeline
        (transforms_vggt.py:411-431 + g2vlm.py:868-966)."""
        from ..data.device_preprocess import target_hw

        n, h0, w0, _ = frames.shape
        th, tw = target_hw(h0, w0, new_width, self.cfg.dino_patch_size)
        chunks = int(os.environ.get("G2VLM_UPLOAD_CHUNKS", "4"))
        if chunks > 1 and n % chunks == 0 and n >= 2 * chunks:
            # chunked-upload path: the host->device frame transfer is the
            # per-call serial wall (~600 ms for 32 uint8 views through the
            # tunneled link). Encoding view chunks in separate programs lets
            # chunk i's dino encode run while chunk i+1 is still uploading
            # (XLA dispatch is async); the main program then takes the
            # pre-encoded tokens.
            nc = n // chunks
            enc = self._dino_encode_u8_jit((nc, h0, w0, th, tw))
            embs = tuple(
                enc(self.params, jnp.asarray(frames[i * nc : (i + 1) * nc]))
                for i in range(chunks)
            )
            fn = self._recon_emb_jit((n, th, tw, prompt, chunks))
            out = fn(self.params, embs)
        else:
            fn = self._recon_u8_jit((n, h0, w0, th, tw, prompt))
            out = fn(self.params, jnp.asarray(frames))
        # the in-module sync probe is plumbing, not a model output: expose it
        # out-of-band (fetching these 4 bytes is a full completion barrier)
        self.last_sync = out.pop("_sync")
        return out

    @functools.lru_cache(maxsize=8)
    def _dino_encode_u8_jit(self, key):
        nc, h0, w0, th, tw = key

        def fn(params, frames):
            from ..data.device_preprocess import preprocess_views_device

            views = preprocess_views_device(frames, (th, tw))
            return jg.encode_dino_to_llm(
                params, views.astype(self.compute_dtype), self.cfg,
                self.compute_dtype,
            )

        return jax.jit(fn)

    @functools.lru_cache(maxsize=8)
    def _recon_emb_jit(self, key):
        n, th, tw, prompt, chunks = key
        p = self.cfg.dino_patch_size
        prefill = self.build_recon_prefill(n, th // p, tw // p, prompt=prompt)

        def fn(params, embs):
            emb = jnp.concatenate(embs, axis=0)
            out = jg.recon_forward(
                params, prefill, None, self.cfg,
                compute_dtype=self.compute_dtype, attn_impl=self.attn_impl,
                dino_emb=emb, img_hw=(th, tw),
            )
            out["_sync"] = jax.lax.slice(
                out["points"].reshape(-1), (0,), (1,)
            )
            return out

        return jax.jit(fn)

    @functools.lru_cache(maxsize=8)
    def _recon_u8_jit(self, key):
        n, h0, w0, th, tw, prompt = key
        p = self.cfg.dino_patch_size
        prefill = self.build_recon_prefill(n, th // p, tw // p, prompt=prompt)

        def fn(params, frames):
            from ..data.device_preprocess import preprocess_views_device

            views = preprocess_views_device(frames, (th, tw))
            out = jg.recon_forward(
                params, prefill, views.astype(self.compute_dtype), self.cfg,
                compute_dtype=self.compute_dtype, attn_impl=self.attn_impl,
            )
            # one-element sync probe computed INSIDE the module: fetching it
            # is a full barrier but costs a single 4-byte transfer, instead
            # of the eager out[...][0,0,0] path which dispatches two extra
            # tiny programs through the (high-latency) device link
            out["_sync"] = jax.lax.slice(
                out["points"].reshape(-1), (0,), (1,)
            )
            return out

        return jax.jit(fn)

    # ------------------------------------------------------------------
    # chat with reconstruction in-context (reference G2VLM.chat_with_recon,
    # g2vlm.py:1305-1410): system prompt -> dino geo prefill -> per-image vit
    # prefill -> question -> decode. All prefill phases collapse into ONE
    # packed forward; decode is one jitted while_loop.
    # ------------------------------------------------------------------
    SYSTEM_PROMPT = "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n<|im_start|>user\n"

    def chat(
        self,
        images: Sequence,
        prompt: str,
        max_new_tokens: int = 100,
        do_sample: bool = False,
        temperature: float = 1.0,
        new_width: int = 518,
        seed: int = 0,
        return_info: bool = False,
        quantized_kv: bool = False,
        mem_probe=None,  # optional callable(tag) for HBM diagnostics
        return_session: bool = False,
        session_reserve: int = 2048,  # extra cache capacity for follow-ups
        device_preprocess: bool = False,
    ) -> str:
        from . import decoding

        p = self.cfg.dino_patch_size

        frames = None
        if device_preprocess:
            # serving fast path: upload raw uint8 frames ONCE and run BOTH
            # image preprocesses (dino resize/normalize + Qwen-ViT bicubic/
            # CLIP/patchify) on device inside the prefill program — for
            # 32-view chat this moves ~50MB over the link instead of ~250MB
            # of host-built patches. Requires uniform frame shapes; numerics
            # deviate from the PIL host path at serving tolerance (see
            # data/device_preprocess.py docstrings).
            from PIL import Image

            def _to_rgb_u8(im):
                # mirror load_views' normalization: paths and PIL images in
                # any mode become RGB; arrays must already be uint8 HWC-3
                if isinstance(im, str):
                    im = Image.open(im)
                if isinstance(im, Image.Image):
                    return np.asarray(im.convert("RGB"))
                return np.asarray(im)

            arrs = [_to_rgb_u8(im) for im in images]
            uniform = len({a.shape for a in arrs}) == 1
            valid = all(
                a.dtype == np.uint8 and a.ndim == 3 and a.shape[-1] == 3
                for a in arrs
            )
            if uniform and valid:
                frames = np.stack(arrs)
            else:
                images = arrs  # non-uniform/non-u8: fall back to host path

        if frames is not None:
            from ..data.device_preprocess import target_hw, vit_device_grid
            from ..models.qwen_vit import merge_permuted_hw_coords

            n, h0, w0, _ = frames.shape
            h, w = target_hw(h0, w0, new_width, p)
            grid = vit_device_grid()
            per = int(np.prod(grid))
            n_pat = n * per
            pat_pad = _round_up(n_pat, 8)
            vit_coords = np.concatenate(
                [merge_permuted_hw_coords(grid)] * n
                + [np.zeros((pat_pad - n_pat, 2), np.int64)]
            )
            vit_seg = np.concatenate([
                np.repeat(np.arange(n, dtype=np.int32), per),
                np.full(pat_pad - n_pat, -1, np.int32),
            ])
            vit_grids = [grid] * n
        else:
            from ..data.vit_preprocess import preprocess_vit_image
            from ..models.qwen_vit import pack_views

            views = load_views(images, new_width=new_width)
            n, _, h, w = views.shape

            # per-image grids supported (reference feeds variable grid_thw
            # through flash-attn cu_seqlens, modeling_qwen2_vl.py:1048-1072;
            # here each image is an attention segment in encode_packed)
            vit_inputs = [preprocess_vit_image(im) for im in images]
            vit_views = [
                {"patches": pats, "grid_thw": grid} for pats, grid in vit_inputs
            ]
            n_pat = sum(int(np.prod(g)) for _, g in vit_inputs)
            pat_pad = _round_up(n_pat, 8)
            vit_patches, vit_coords, vit_seg, _ = pack_views(
                vit_views, pad_to=pat_pad
            )
            vit_grids = [g for _, g in vit_inputs]

        b = jg.SequenceBuilder(
            self.new_token_ids["start_of_image"], self.new_token_ids["end_of_image"]
        )
        b.add_text(self._encode_text(self.SYSTEM_PROMPT))
        b.add_dino_images(n, h // p, w // p)
        for _, gh, gw in vit_grids:
            b.add_vit_image(gh // 2, gw // 2)
        b.add_text(
            self._encode_text(prompt + "<|im_end|>\n<|im_start|>assistant")
        )
        pad_to = _round_up(b.curr, self.seq_pad_multiple)
        prefill = b.build(pad_to=pad_to)

        start_token = self._start_token()

        upload_chunks = int(os.environ.get("G2VLM_UPLOAD_CHUNKS", "4"))
        chunked = (
            frames is not None
            and upload_chunks > 1
            and n % upload_chunks == 0
            and n >= 2 * upload_chunks
        )
        t_upload = None
        if chunked:
            # chunked-upload overlap (the recon_from_frames pattern applied
            # to chat, reference forward_cache_update_vit g2vlm.py:812-866):
            # encode view chunks' dino+ViT towers in separate programs so
            # chunk i's tower compute runs while chunk i+1 is still crossing
            # the host->device link; the main program consumes pre-encoded
            # tokens. t_upload here is the whole overlapped upload+towers
            # stage (the stages are no longer separable by construction).
            nc = n // upload_chunks
            enc = self._chat_encode_u8_jit((nc, h0, w0, h, w))
            t0 = time.perf_counter()
            embs = [
                enc(self.params, jnp.asarray(frames[i * nc : (i + 1) * nc]))
                for i in range(upload_chunks)
            ]
            if return_info:
                jax.block_until_ready(embs)
                t_upload = time.perf_counter() - t0
            fn = self._chat_prefill_emb_jit(
                _HashableArrays((prefill, upload_chunks))
            )
            t0 = time.perf_counter()
            _, kv = fn(
                self.params,
                tuple(d for d, _ in embs),
                tuple(v for _, v in embs),
            )
            del embs
        else:
            if frames is not None:
                fn = self._chat_prefill_u8_jit(
                    _HashableArrays(
                        (prefill, vit_coords, vit_seg, (h0, w0, h, w, pat_pad))
                    )
                )
                upload = (frames,)
            else:
                # upload in compute dtype: the first consumer casts to bf16
                # anyway, and halving the bytes matters through the
                # high-latency device link (32-view chat moves ~250MB of
                # host-built ViT patches per call)
                normed = resnet_normalize(views).astype(
                    np.dtype(self.compute_dtype)
                )
                vit_patches = vit_patches.astype(np.dtype(self.compute_dtype))
                fn = self._chat_prefill_jit(
                    _HashableArrays((prefill, vit_coords, vit_seg))
                )
                upload = (normed, vit_patches)
            if return_info:
                t0 = time.perf_counter()
                upload = jax.block_until_ready(jax.device_put(upload))
                t_upload = time.perf_counter() - t0
            t0 = time.perf_counter()
            _, kv = fn(self.params, *(jnp.asarray(u) for u in upload))
        if return_info:
            jax.block_until_ready(kv)
            t_forward = time.perf_counter() - t0
        if mem_probe is not None:
            jax.block_until_ready(kv)
            mem_probe(f"chat prefill done (S={prefill.seq_len})")

        reserve = session_reserve if return_session else 0
        capacity = max(
            _round_up(prefill.seq_len + max_new_tokens + reserve + 8, 128),
            len(prefill.doc_id),
        )
        # only the first seq_len rows are valid KV (padding rows masked by
        # len); build_cache donates kv so long-context chat holds one cache,
        # not three KV-sized buffers
        cache = decoding.build_cache(
            kv, jnp.asarray(prefill.seq_len, jnp.int32), self.cfg.llm,
            capacity, dtype=self.compute_dtype, quantized=quantized_kv,
        )
        # build_cache donated kv, but the bf16->int8/head-major transform
        # can't alias buffers — drop the Python ref NOW or the dead 1.4G
        # prefill KV stays resident through the whole decode (long-context
        # chat OOMs on exactly this margin)
        del kv
        if mem_probe is not None:
            jax.block_until_ready(cache)
            mem_probe(f"cache built (capacity={capacity})")
        if return_info:
            jax.block_until_ready(cache)
            t_cache = time.perf_counter() - t0 - t_forward
            t_prefill = t_upload + t_forward + t_cache
            t0 = time.perf_counter()

        toks, num, cache_out = decoding.generate(
            self.params["llm"],
            cache,
            jnp.asarray(start_token, jnp.int32),
            jnp.asarray(prefill.next_rope_pos, jnp.int32),
            eos_token_id=self.new_token_ids["eos_token_id"],
            cfg=self.cfg.llm,
            max_new_tokens=max_new_tokens,
            do_sample=do_sample,
            temperature=temperature,
            rng_key=jax.random.PRNGKey(seed),
            compute_dtype=self.compute_dtype,
        )
        if return_info:
            jax.block_until_ready(toks)
            t_decode = time.perf_counter() - t0
        ids = np.asarray(toks)[: int(num)]
        session = None
        if return_session:
            # pos advanced by the consumed tokens: start + (num-1) generated;
            # the final emitted token (eos on a clean stop) was never
            # consumed — chat_continue feeds it first
            last = int(ids[-1]) if len(ids) else int(start_token)
            session = ChatSession(
                cache=cache_out,
                next_rope_pos=int(prefill.next_rope_pos) + int(num),
                pending_token=last,
                capacity=capacity,
                quantized_kv=quantized_kv,
            )
        del cache_out
        if len(ids) and ids[-1] == self.new_token_ids["eos_token_id"]:
            ids = ids[:-1]
        if self.tokenizer is None:
            text = " ".join(map(str, ids.tolist()))
        else:
            text = self.tokenizer.decode(ids.tolist())
        if return_session:
            return text, session
        if return_info:
            return text, {
                "num_tokens": int(num),
                "prefill_len": int(prefill.seq_len),
                "n_views": int(n),
                # stage timings (host-synced): prefill = upload + prefill
                # forward + cache build; decode is the generate while_loop
                # alone (host text preprocess is outside all of them)
                "t_prefill_s": t_prefill,
                "t_upload_s": t_upload,
                "t_forward_s": t_forward,
                "t_cache_s": t_cache,
                "t_decode_s": t_decode,
            }
        return text

    def chat_continue(
        self,
        session: ChatSession,
        prompt: str,
        max_new_tokens: int = 100,
        do_sample: bool = False,
        temperature: float = 1.0,
        seed: int = 0,
    ):
        """Follow-up turn on a live session from chat(return_session=True).
        Costs len(turn) decode steps against the resident cache instead of a
        fresh multi-view prefill. Returns (text, new_session); `session` is
        consumed (its cache buffers are donated)."""
        from . import decoding

        ids = [session.pending_token] + self._encode_text(
            "\n<|im_start|>user\n" + prompt + "<|im_end|>\n<|im_start|>assistant"
        )
        n = len(ids)
        need = n + max_new_tokens + 2
        have = session.capacity - (session.next_rope_pos + 1)
        if need > have:
            raise ValueError(
                f"chat session cache exhausted (turn needs {need} rows, "
                f"{have} free of {session.capacity}); start a new chat with "
                f"a larger session_reserve"
            )
        pad = _round_up(n, 64)
        buf = np.zeros(pad, np.int32)
        buf[:n] = ids
        _, cache = decoding.extend_cache(
            self.params["llm"],
            session.cache,
            jnp.asarray(buf),
            jnp.asarray(session.next_rope_pos, jnp.int32),
            self.cfg.llm,
            n_tokens=jnp.asarray(n, jnp.int32),
            compute_dtype=self.compute_dtype,
        )
        toks, num, cache_out = decoding.generate(
            self.params["llm"],
            cache,
            jnp.asarray(self._start_token(), jnp.int32),
            jnp.asarray(session.next_rope_pos + n, jnp.int32),
            eos_token_id=self.new_token_ids["eos_token_id"],
            cfg=self.cfg.llm,
            max_new_tokens=max_new_tokens,
            do_sample=do_sample,
            temperature=temperature,
            rng_key=jax.random.PRNGKey(seed),
            compute_dtype=self.compute_dtype,
        )
        out = np.asarray(toks)[: int(num)]
        last = int(out[-1]) if len(out) else int(self._start_token())
        new_session = session._replace(
            cache=cache_out,
            next_rope_pos=session.next_rope_pos + n + int(num),
            pending_token=last,
        )
        if len(out) and out[-1] == self.new_token_ids["eos_token_id"]:
            out = out[:-1]
        if self.tokenizer is None:
            text = " ".join(map(str, out.tolist()))
        else:
            text = self.tokenizer.decode(out.tolist())
        return text, new_session
