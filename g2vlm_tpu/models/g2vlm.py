"""G2VLM top-level model: MoT LLM + DINOv2 geometry encoder + Qwen2-VL ViT +
Pi3 3D heads.

Behavioral spec: reference modeling/g2vlm/g2vlm.py:119-1410.

TPU-first design: the reference runs inference as a Python loop of cache-update
phases (text prefill -> dino geo prefill -> per-image vit prefill -> question
-> token loop), each rebuilding a scatter-merged KV cache per layer
(qwen2vl.py:621-638). Here the entire prefill is ONE jitted forward over a
packed sequence with per-token TokenInfo metadata: identical mask semantics
(causal text phases, bidirectional vision phases attending to all prior
tokens), no cache rebuilds, static shapes. The 3D heads hang off the same
forward's hidden states at the dino-token positions, so `recon` is a single
XLA program.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import G2VLMConfig
from ..ops.masks import TokenInfo
from ..utils.geometry import homogenize_points
from . import dinov2, mot_decoder, pi3_heads

RESNET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
RESNET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

# Toggle for the geo-dominant expert fast path (tests flip it to compare
# GEO_MAIN vs MIXED end to end).
GEO_MAIN_ENABLED = True


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def init_params(cfg: G2VLMConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 16))
    d = cfg.llm.hidden_size
    params: Dict = {"llm": mot_decoder.init_params(cfg.llm, next(ks), dtype)}
    if cfg.visual_recon:
        params["dino"] = dinov2.init_params(cfg.dino, next(ks), dtype)
        # dino->LLM projector is zero-initialized (reference g2vlm.py:245-250)
        params["dino2llm"] = {
            "w": jnp.zeros((cfg.dino.hidden_size, d), dtype),
            "b": jnp.zeros((d,), dtype),
        }
        params["point_decoder"] = pi3_heads.init_decoder_params(
            cfg.pi3, next(ks), d, cfg.pi3.point_out_dim
        )
        params["point_head"] = pi3_heads.init_pts3d_params(
            next(ks), cfg.pi3.point_out_dim, cfg.dino_patch_size, 3
        )
        params["camera_decoder"] = pi3_heads.init_decoder_params(
            cfg.pi3, next(ks), d, cfg.pi3.camera_out_dim
        )
        params["camera_head"] = pi3_heads.init_camera_head_params(
            next(ks), cfg.pi3.camera_out_dim
        )
        if cfg.use_global_points:
            params["global_decoder"] = pi3_heads.init_decoder_params(
                cfg.pi3, next(ks), d, cfg.pi3.point_out_dim, cross=True
            )
            params["global_point_head"] = pi3_heads.init_pts3d_params(
                next(ks), cfg.pi3.point_out_dim, cfg.dino_patch_size, 3
            )
        if cfg.train_conf_pi3:
            params["conf_decoder"] = pi3_heads.init_decoder_params(
                cfg.pi3, next(ks), d, cfg.pi3.point_out_dim
            )
            params["conf_head"] = pi3_heads.init_pts3d_params(
                next(ks), cfg.pi3.point_out_dim, cfg.dino_patch_size, 1
            )
            # frozen SegFormer for sky supervision (reference Pi3Loss owns it
            # as self.point_loss.segformer, pi3_loss.py:55-65; here it lives
            # in the param tree — freeze_labels pins it to set_to_zero)
            from . import segformer

            params["segformer"] = segformer.init_params(next(ks))
    if cfg.visual_und:
        from . import qwen_vit

        params["vit"] = qwen_vit.init_params(cfg.vit, next(ks), dtype)
    return params


def params_from_torch(state_dict, cfg: G2VLMConfig) -> Dict:
    """Map the reference G2VLM.state_dict() / model.safetensors key space
    (prefixes per g2vlm.py:123-243) onto our pytree."""
    params: Dict = {
        "llm": mot_decoder.params_from_torch(
            state_dict, cfg.llm, prefix="language_model."
        )
    }

    def _t2j(t):
        return jnp.asarray(
            np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t),
            jnp.float32,
        )

    if cfg.visual_recon:
        params["dino"] = dinov2.params_from_torch(
            state_dict, cfg.dino, prefix="dino_model."
        )
        params["dino2llm"] = {
            "w": _t2j(state_dict["dino2llm.weight"]).T,
            "b": _t2j(state_dict["dino2llm.bias"]),
        }
        params["point_decoder"] = pi3_heads.decoder_params_from_torch(
            state_dict, cfg.pi3.depth, prefix="point_decoder."
        )
        params["point_head"] = pi3_heads.pts3d_params_from_torch(
            state_dict, prefix="point_head."
        )
        params["camera_decoder"] = pi3_heads.decoder_params_from_torch(
            state_dict, cfg.pi3.depth, prefix="camera_decoder."
        )
        params["camera_head"] = pi3_heads.camera_head_params_from_torch(
            state_dict, prefix="camera_head."
        )
        if cfg.use_global_points:
            params["global_decoder"] = pi3_heads.decoder_params_from_torch(
                state_dict, cfg.pi3.depth, prefix="global_points_decoder."
            )
            params["global_point_head"] = pi3_heads.pts3d_params_from_torch(
                state_dict, prefix="global_point_head."
            )
        if cfg.train_conf_pi3 and any(
            k.startswith("conf_decoder.") for k in state_dict
        ):
            params["conf_decoder"] = pi3_heads.decoder_params_from_torch(
                state_dict, cfg.pi3.depth, prefix="conf_decoder."
            )
            params["conf_head"] = pi3_heads.pts3d_params_from_torch(
                state_dict, prefix="conf_head."
            )
        seg_prefix = "Pi3Loss.point_loss.segformer."
        if cfg.train_conf_pi3 and any(
            k.startswith(seg_prefix) for k in state_dict
        ):
            # the reference checkpoints the frozen sky segmenter under the
            # loss module (self.Pi3Loss.point_loss.segformer, g2vlm.py:207,
            # pi3_loss.py:55-65) — consume those keys instead of dropping
            # them so conf training has the real supervision source
            from . import segformer

            params["segformer"] = segformer.params_from_torch(
                state_dict, prefix=seg_prefix
            )
    if cfg.visual_und and any(k.startswith("vit_model.") for k in state_dict):
        from . import qwen_vit

        params["vit"] = qwen_vit.params_from_torch(
            state_dict, cfg.vit, prefix="vit_model."
        )
    return params


# ---------------------------------------------------------------------------
# packed-sequence assembly (host side, numpy)
# ---------------------------------------------------------------------------

class PackedPrefill(NamedTuple):
    """Host-built static inputs for one packed prefill forward."""

    text_ids: np.ndarray  # (T,) int32 token ids for all text slots
    text_indexes: np.ndarray  # (T,) positions of text tokens in the sequence
    dino_indexes: np.ndarray  # (N*hw,) positions of dino patch tokens
    vit_indexes: np.ndarray  # (V,) positions of vit image tokens
    is_geo: np.ndarray  # (S,) bool
    position_ids: np.ndarray  # (3, S)
    doc_id: np.ndarray
    fn_id: np.ndarray
    noise_id: np.ndarray
    pos: np.ndarray
    seq_len: int
    next_rope_pos: int  # first free rope position after the sequence

    def token_info(self) -> TokenInfo:
        return TokenInfo(
            jnp.asarray(self.doc_id),
            jnp.asarray(self.fn_id),
            jnp.asarray(self.noise_id),
            jnp.asarray(self.pos),
        )


class SequenceBuilder:
    """Builds the packed sequence + metadata the way the reference prepare_*
    methods do (g2vlm.py:561-966), but for ONE forward instead of N cache
    updates. Phases:
      add_text(ids)            -> causal tokens (fn=-1)
      add_dino_images(n,hp,wp) -> <vision_start> + patches + <vision_end>,
                                  bidirectional across ALL dino views (one
                                  shared fn id, matching the reference's single
                                  is_causal=False dino call over all views)
      add_vit_image(hp,wp)     -> framed vit tokens, bidirectional per image
                                  (each vit image its own fn id, matching the
                                  per-image vit calls)
    """

    def __init__(self, start_of_image: int, end_of_image: int):
        self.soi = start_of_image
        self.eoi = end_of_image
        self.text_ids = []
        self.text_indexes = []
        self.dino_indexes = []
        self.vit_indexes = []
        self.is_geo = []
        self.pos_ids = []  # list of (3,) or (3, n)
        self.fn_id = []
        self.curr = 0  # sequence cursor
        self.rope = 0  # rope position cursor
        self.next_fn = 0

    def add_text(self, ids) -> None:
        for t in ids:
            self._push_text_token_fn(int(t), -1)

    def _grid_pos(self, hp: int, wp: int) -> np.ndarray:
        t_idx = np.zeros(hp * wp, np.int64)
        h_idx = np.repeat(np.arange(hp, dtype=np.int64), wp)
        w_idx = np.tile(np.arange(wp, dtype=np.int64), hp)
        return np.stack([t_idx, h_idx, w_idx]) + self.rope

    def add_dino_images(self, n_views: int, hp: int, wp: int) -> None:
        """Matches prepare_dino_images_pi3 (g2vlm.py:868-966): per view
        <vision_start>, hw patch tokens with 3D rope ids (merge 1), then
        <vision_end>; rope advances by max(hp,wp)-1 + 1 per grid."""
        fn = self.next_fn
        self.next_fn += 1
        hw = hp * wp
        for _ in range(n_views):
            self._push_text_token_fn(self.soi, fn)
            grid = self._grid_pos(hp, wp)
            self.dino_indexes.extend(range(self.curr, self.curr + hw))
            self.is_geo.extend([True] * hw)
            self.pos_ids.append(grid)
            self.fn_id.append(np.full(hw, fn, np.int32))
            self.curr += hw
            # reference delta: max - min = max(hp, wp) - 1, then += delta + 1
            self.rope += max(hp, wp)
            self._push_text_token_fn(self.eoi, fn)

    def add_vit_image(self, hp_merged: int, wp_merged: int) -> None:
        """Matches prepare_vit_images (g2vlm.py:735-810): one image per phase,
        rope grid over merged patches (merge 2)."""
        fn = self.next_fn
        self.next_fn += 1
        hw = hp_merged * wp_merged
        self._push_text_token_fn(self.soi, fn)
        grid = self._grid_pos(hp_merged, wp_merged)
        self.vit_indexes.extend(range(self.curr, self.curr + hw))
        self.is_geo.extend([False] * hw)
        self.pos_ids.append(grid)
        self.fn_id.append(np.full(hw, fn, np.int32))
        self.curr += hw
        self.rope += max(hp_merged, wp_merged)
        self._push_text_token_fn(self.eoi, fn)

    def _push_text_token_fn(self, tok: int, fn: int):
        self.text_ids.append(tok)
        self.text_indexes.append(self.curr)
        self.is_geo.append(False)
        self.pos_ids.append(np.full((3, 1), self.rope, np.int64))
        self.fn_id.append(np.full(1, fn, np.int32))
        self.curr += 1
        self.rope += 1

    def build(self, pad_to: Optional[int] = None) -> PackedPrefill:
        s = self.curr
        total = pad_to if pad_to is not None else s
        assert total >= s
        doc = np.full(total, -1, np.int32)
        doc[:s] = 0
        fn = np.full(total, -1, np.int32)
        fn[:s] = np.concatenate(self.fn_id)
        pos_meta = np.zeros(total, np.int32)
        pos_meta[:s] = np.arange(s, dtype=np.int32)
        position_ids = np.zeros((3, total), np.int64)
        position_ids[:, :s] = np.concatenate(self.pos_ids, axis=1)
        is_geo = np.zeros(total, bool)
        is_geo[:s] = np.asarray(self.is_geo)
        return PackedPrefill(
            text_ids=np.asarray(self.text_ids, np.int32),
            text_indexes=np.asarray(self.text_indexes, np.int32),
            dino_indexes=np.asarray(self.dino_indexes, np.int32),
            vit_indexes=np.asarray(self.vit_indexes, np.int32),
            is_geo=is_geo,
            position_ids=position_ids,
            doc_id=doc,
            fn_id=fn,
            noise_id=np.full(total, -1, np.int32),
            pos=pos_meta,
            seq_len=s,
            next_rope_pos=self.rope,
        )


# ---------------------------------------------------------------------------
# forward passes
# ---------------------------------------------------------------------------

def encode_dino_to_llm(
    params: Dict, dino_images: jax.Array, cfg: G2VLMConfig, compute_dtype,
    remat: bool = False,
    remat_group: int = 1,
) -> jax.Array:
    """Geometry-encoder encode + dino2llm projection (reference
    g2vlm.py:968-1010; DINOv3 alternative selected via use_dinov3,
    g2vlm.py:380-394). dino_images (N, 3, H, W) RESNET-normalized ->
    (N*hw, D_llm)."""
    if cfg.use_dinov3:
        from . import dinov3 as dinov3_mod

        tokens = dinov3_mod.encode(
            params["dino"], dino_images, cfg.dinov3, compute_dtype,
            remat=remat,
        )
    else:
        tokens = dinov2.encode(
            params["dino"], dino_images, cfg.dino, compute_dtype, remat=remat,
            remat_group=remat_group,
        )
    n, hw, _ = tokens.shape
    proj = tokens.reshape(n * hw, -1).astype(compute_dtype) @ params["dino2llm"][
        "w"
    ].astype(compute_dtype) + params["dino2llm"]["b"].astype(compute_dtype)
    return proj


def prefill_hidden(
    params: Dict,
    prefill: PackedPrefill,
    dino_images: Optional[jax.Array],
    cfg: G2VLMConfig,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
    vit_patches: Optional[jax.Array] = None,
    vit_grid_hw: Optional[Tuple[int, int]] = None,
    return_kv: bool = False,
    vit_coords: Optional[jax.Array] = None,
    vit_seg: Optional[jax.Array] = None,
    dino_emb: Optional[jax.Array] = None,
    vit_emb: Optional[jax.Array] = None,
):
    """One packed prefill forward. Returns (hidden (S, D), kv or None).

    ViT images enter either as one uniform grid (vit_grid_hw, reference
    prepare_vit_images g2vlm.py:735-810) or as packed per-image grids
    (vit_coords/vit_seg -> qwen_vit.encode_packed), matching the reference's
    variable-grid flash-attn cu_seqlens path (modeling_qwen2_vl.py:1048-1072).
    `dino_emb` (N*hw, D_llm) / `vit_emb` (N*per//4, D_llm) supply pre-encoded
    tower tokens (the chunked-upload serving path encodes view chunks in
    separate programs so uploads overlap encoder compute) instead of
    `dino_images` / `vit_patches`.
    """
    d = cfg.llm.hidden_size
    seq = jnp.zeros((len(prefill.doc_id), d), compute_dtype)
    text_emb = mot_decoder.embed_tokens(params["llm"], jnp.asarray(prefill.text_ids))
    seq = seq.at[jnp.asarray(prefill.text_indexes)].set(
        text_emb.astype(compute_dtype)
    )
    if dino_emb is not None and len(prefill.dino_indexes):
        seq = seq.at[jnp.asarray(prefill.dino_indexes)].set(
            dino_emb.astype(compute_dtype)
        )
    elif dino_images is not None and len(prefill.dino_indexes):
        dino_emb = encode_dino_to_llm(params, dino_images, cfg, compute_dtype)
        seq = seq.at[jnp.asarray(prefill.dino_indexes)].set(dino_emb)
    if vit_emb is not None and len(prefill.vit_indexes):
        seq = seq.at[jnp.asarray(prefill.vit_indexes)].set(
            vit_emb[: len(prefill.vit_indexes)].astype(compute_dtype)
        )
    elif vit_patches is not None and len(prefill.vit_indexes):
        from . import qwen_vit

        if vit_coords is not None:
            # chunk big multi-image encodes so the tower's live activations
            # stay bounded (concrete seg only — traced seg means a caller
            # like the trainer owns its own memory strategy)
            chunks = 1
            if not isinstance(vit_seg, jax.core.Tracer):
                chunks = qwen_vit.packed_row_chunks(vit_seg)
            vit_emb = qwen_vit.encode_packed(
                params["vit"], vit_patches, vit_coords, vit_seg, cfg.vit,
                compute_dtype, attn_impl=attn_impl, row_chunks=chunks,
            )[: len(prefill.vit_indexes)]
        else:
            vit_emb = qwen_vit.encode(
                params["vit"], vit_patches, vit_grid_hw, cfg.vit, compute_dtype
            )
        seq = seq.at[jnp.asarray(prefill.vit_indexes)].set(
            vit_emb.astype(compute_dtype)
        )

    # Expert routing strategy: when the prefill is geo-dominant (recon: ~25k
    # dino tokens vs ~10^2 text tokens, no vit), run the geo expert everywhere
    # and fix up the few und rows — 1x FLOPs instead of MIXED's dual compute.
    n_text = len(prefill.text_indexes)
    geo_dominant = (
        GEO_MAIN_ENABLED
        and cfg.llm.layer_module == "mot"
        and isinstance(prefill.text_indexes, np.ndarray)  # host-built consts
        and len(prefill.vit_indexes) == 0
        and n_text > 0
        and len(prefill.dino_indexes) > 4 * n_text
        and int(prefill.text_indexes[0]) == 0
    )
    und_idx = None
    geo_start = None
    perm = None
    if geo_dominant:
        pad = -(-n_text // 128) * 128 - n_text
        und_idx = jnp.asarray(
            np.pad(prefill.text_indexes, (0, pad))  # row 0 is the BOS (und)
        )
        expert_mode = mot_decoder.GEO_MAIN
    elif (
        cfg.llm.layer_module == "mot"
        and isinstance(prefill.is_geo, np.ndarray)
        and 0 < int(prefill.is_geo.sum()) < int((prefill.doc_id >= 0).sum())
    ):
        # Mixed und/geo prefill (chat_with_recon: ~25k geo + ~23k vit und
        # tokens): sort rows [und | geo | padding] host-side and run the
        # SPLIT layer — every expert matmul on a contiguous slice, 1x FLOPs
        # instead of MIXED's dual compute (which at 48k tokens also blew
        # the HBM temp arena). Attention is row-permutation-invariant given
        # per-row TokenInfo, and the decode cache doesn't care about row
        # order either; padding (doc_id < 0) stays at the tail so the
        # cache's `row < length` visibility still excludes it.
        key = np.where(
            prefill.doc_id < 0, 2, prefill.is_geo.astype(np.int32)
        )
        perm = np.argsort(key, kind="stable")
        geo_start = int((key == 0).sum())
        expert_mode = mot_decoder.SPLIT
    else:
        expert_mode = mot_decoder.MIXED

    info = prefill.token_info()
    is_geo_arr = np.asarray(prefill.is_geo)
    position_ids = np.asarray(prefill.position_ids)
    if perm is not None:
        seq = seq[jnp.asarray(perm)]
        is_geo_arr = is_geo_arr[perm]
        position_ids = position_ids[:, perm]
        info = TokenInfo(*(f[jnp.asarray(perm)] for f in info))

    hidden, kv = mot_decoder.decoder_forward(
        params["llm"],
        seq,
        jnp.asarray(is_geo_arr),
        jnp.asarray(position_ids),
        q_info=info,
        kv_info=None,
        past_kv=None,
        cfg=cfg.llm,
        expert_mode=expert_mode,
        compute_dtype=compute_dtype,
        attn_impl=attn_impl,
        und_fixup_idx=und_idx,
        geo_start=geo_start,
    )
    if perm is not None:
        # un-sort the hidden states so callers index by logical position;
        # the per-layer KV stays in sorted order (attention over a cache is
        # row-order-independent; padding rows sit at >= seq_len)
        hidden = hidden[jnp.asarray(np.argsort(perm, kind="stable"))]
    return hidden, (kv if return_kv else None)


def pi3_predict(
    params: Dict,
    dino_hidden: jax.Array,  # (N, hw, D) LLM hidden states at dino positions
    img_hw: Tuple[int, int],
    cfg: G2VLMConfig,
    compute_dtype=jnp.float32,
    remat: bool = False,
    view_chunk: int = 0,
) -> Dict[str, jax.Array]:
    """3D heads over dino-position hidden states (reference
    g2vlm.py:1143-1238 `reconstruct`). Batch dim B folded into N (B=1 at
    inference, matching the reference).

    view_chunk > 0 runs the head decoders over view chunks under `lax.map`
    (training memory bound): views are independent in the heads' self
    attention, and the global decoder's cross context is always frame 0, so
    a chunked scan is exact while its backward arena holds one chunk's
    activations instead of all N views'.
    """
    h, w = img_hw
    p = cfg.dino_patch_size
    hp, wp = h // p, w // p
    n = dino_hidden.shape[0]
    if view_chunk and n > view_chunk and n % view_chunk == 0:
        # non-dividing view counts fall through to the unchunked path (a
        # variable-view training batch must not crash the step; chunking is
        # purely a memory optimization)
        ctx = dino_hidden[:1]
        shaped = dino_hidden.reshape(
            n // view_chunk, view_chunk, *dino_hidden.shape[1:]
        )
        outs = jax.lax.map(
            lambda hid: _pi3_predict_full(
                params, hid, img_hw, cfg, compute_dtype, remat, ctx
            ),
            shaped,
        )
        return {
            k: v.reshape((n,) + v.shape[2:]) for k, v in outs.items()
        }
    return _pi3_predict_full(
        params, dino_hidden, img_hw, cfg, compute_dtype, remat,
        dino_hidden[:1],
    )


def _pi3_predict_full(
    params: Dict,
    dino_hidden: jax.Array,
    img_hw: Tuple[int, int],
    cfg: G2VLMConfig,
    compute_dtype,
    remat: bool,
    global_ctx: jax.Array,  # (1, hw, D) frame-0 tokens for the cross decoder
) -> Dict[str, jax.Array]:
    import os

    h, w = img_hw
    p = cfg.dino_patch_size
    hp, wp = h // p, w // p
    n = dino_hidden.shape[0]
    pos = pi3_heads.patch_positions(n, hp, wp)

    want_conf = cfg.train_conf_pi3 and "conf_decoder" in params
    conf_hidden = None
    if os.environ.get("G2VLM_STACKED_HEADS", "1") == "1":
        # point/camera(/conf) decoders are architecturally identical and read
        # the same input: run them as ONE fused K-stacked scan (one attention
        # kernel + one norm chain per block instead of K)
        decs = [params["point_decoder"], params["camera_decoder"]]
        if want_conf:
            decs.append(params["conf_decoder"])
        outs = pi3_heads.stacked_decoder_forward(
            decs, dino_hidden, pos, cfg.pi3,
            compute_dtype=compute_dtype, remat=remat,
        )
        point_hidden, camera_hidden = outs[0], outs[1]
        if want_conf:
            conf_hidden = outs[2]
    else:
        point_hidden = pi3_heads.decoder_forward(
            params["point_decoder"], dino_hidden, pos, cfg.pi3,
            compute_dtype=compute_dtype, remat=remat,
        )
        camera_hidden = pi3_heads.decoder_forward(
            params["camera_decoder"], dino_hidden, pos, cfg.pi3,
            compute_dtype=compute_dtype, remat=remat,
        )
        if want_conf:
            conf_hidden = pi3_heads.decoder_forward(
                params["conf_decoder"], dino_hidden, pos, cfg.pi3,
                compute_dtype=compute_dtype, remat=remat,
            )

    # fp32 heads (reference g2vlm.py:1200-1226)
    ret = pi3_heads.linear_pts3d(
        params["point_head"], point_hidden.astype(jnp.float32), (h, w), p
    )  # (N, H, W, 3)
    xy, z = ret[..., :2], ret[..., 2:]
    z = jnp.exp(z)
    local_points = jnp.concatenate([xy * z, z], axis=-1)

    camera_poses = pi3_heads.camera_head(
        params["camera_head"], camera_hidden.astype(jnp.float32), hp, wp
    )  # (N, 4, 4)

    out = {"local_points": local_points, "camera_poses": camera_poses}

    if cfg.use_global_points and "global_decoder" in params:
        # batch-1 frame-0 context: K/V projections run once inside
        # _cross_attn and broadcast, not N redundant times
        global_hidden = pi3_heads.decoder_forward(
            params["global_decoder"],
            dino_hidden,
            pos,
            cfg.pi3,
            context=global_ctx,
            context_positions=pos[:1],
            compute_dtype=compute_dtype,
            remat=remat,
        )
        out["global_points"] = pi3_heads.linear_pts3d(
            params["global_point_head"], global_hidden.astype(jnp.float32), (h, w), p
        )
    if conf_hidden is not None:
        out["conf"] = pi3_heads.linear_pts3d(
            params["conf_head"], conf_hidden.astype(jnp.float32), (h, w), p
        )

    # unproject local points with camera poses (reference g2vlm.py:1226)
    out["points"] = jnp.einsum(
        "nij,nhwj->nhwi", camera_poses, homogenize_points(local_points)
    )[..., :3]
    return out


def recon_forward(
    params: Dict,
    prefill: PackedPrefill,
    dino_images: Optional[jax.Array],  # (N, 3, H, W) RESNET-normalized
    cfg: G2VLMConfig,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
    dino_emb: Optional[jax.Array] = None,  # (N*hw, D) pre-encoded tokens
    img_hw: Optional[Tuple[int, int]] = None,  # required with dino_emb
) -> Dict[str, jax.Array]:
    """Full multi-view reconstruction as ONE forward (reference G2VLM.recon,
    g2vlm.py:1240-1303, collapsed from 3 phases into a single XLA program).
    With `dino_emb` the geometry encoder ran in earlier per-chunk programs
    (chunked-upload serving path); `img_hw` then supplies the view size."""
    if dino_emb is not None:
        h, w = img_hw
    else:
        _, _, h, w = dino_images.shape
    hw = (h // cfg.dino_patch_size) * (w // cfg.dino_patch_size)
    n = len(prefill.dino_indexes) // hw
    hidden, _ = prefill_hidden(
        params, prefill, dino_images, cfg, compute_dtype, attn_impl,
        dino_emb=dino_emb,
    )
    dino_hidden = hidden[jnp.asarray(prefill.dino_indexes)].reshape(n, hw, -1)
    return pi3_predict(params, dino_hidden, (h, w), cfg, compute_dtype)
