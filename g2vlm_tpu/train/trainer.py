"""Training step: packed joint forward (CE + Pi3 3D losses), optax AdamW,
EMA, gradient checkpointing, pjit sharding.

Behavioral spec: the reference releases only FSDP utilities (train/
fsdp_utils.py) — the loop itself is unreleased (README.md:54). The forward
here mirrors G2VLM.forward (g2vlm.py:252-558): packed multimodal sequence
with mixed attention modes -> MoT decoder -> (a) CE on answer spans weighted
by len2weight, (b) Pi3 losses on dino-position hidden states.

Distribution: mesh (dp, fsdp, tp) (parallel/mesh.py). The packed batch has a
leading dp-batch axis vmapped over; params are FSDP/TP-sharded NamedShardings
and XLA GSPMD inserts the all-gather/reduce-scatter collectives (the
reference's NCCL FSDP equivalent).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import G2VLMConfig
from ..models import g2vlm as jg
from ..models import mot_decoder
from ..ops.masks import TokenInfo
from . import loss as losses


class TrainBatch(NamedTuple):
    """One packed training example (leading axis = per-device batch when
    vmapped). All shapes static; padding is masked via doc_id/weights."""

    # packed sequence
    text_ids: jax.Array  # (T,)
    text_indexes: jax.Array  # (T,)
    dino_indexes: jax.Array  # (N*hw,) or (0,)
    vit_indexes: jax.Array  # (V,) or (0,)
    is_geo: jax.Array  # (S,)
    position_ids: jax.Array  # (3, S)
    doc_id: jax.Array  # (S,)
    fn_id: jax.Array
    noise_id: jax.Array
    pos: jax.Array
    # CE supervision (padded with weight 0)
    ce_indexes: jax.Array  # (C,)
    ce_labels: jax.Array  # (C,)
    ce_weights: jax.Array  # (C,)
    # recon supervision
    dino_images: jax.Array  # (N, 3, H, W) RESNET-normalized
    world_points: jax.Array  # (1, N, H, W, 3)
    point_masks: jax.Array  # (1, N, H, W)
    extrinsics: jax.Array  # (1, N, 4, 4)
    normal_batch_mask: jax.Array  # (1,)
    # vit branch (joint recon+understanding batches; reference
    # g2vlm.py:334-344). vit_indexes above is padded with S (out of bounds ->
    # dropped); None = no vit branch in this run.
    vit_patches: Optional[jax.Array] = None  # (P, pdim)
    vit_coords: Optional[jax.Array] = None  # (P, 2)
    vit_seg: Optional[jax.Array] = None  # (P,) image idx, -1 = padding
    # conf supervision (SegFormer sky masks, reference pi3_loss.py:146-163)
    sky_masks: Optional[jax.Array] = None  # (1, N, H, W) bool


def train_forward(
    params: Dict,
    batch: TrainBatch,
    cfg: G2VLMConfig,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    ce_weight: float = 1.0,
    recon_weight: float = 1.0,
    remat: bool = True,
    geo_start: Optional[int] = None,
    conf_target_thresh: float = 0.02,
    sp=None,
    head_view_chunk: int = 0,
    remat_group: int = 1,
    dino_remat_group: int = 1,
    remat_inner: bool = True,
) -> Tuple[jax.Array, Dict]:
    """One packed sample -> scalar loss + details.

    geo_start: static [und|geo] boundary from the packer's sorted_layout —
    switches the MoT to the SPLIT expert mode (contiguous single-expert
    matmuls, 1x FLOPs instead of MIXED's 2x)."""
    d = cfg.llm.hidden_size
    s = batch.doc_id.shape[0]

    seq = jnp.zeros((s, d), compute_dtype)
    text_emb = mot_decoder.embed_tokens(params["llm"], batch.text_ids)
    seq = seq.at[batch.text_indexes].set(text_emb.astype(compute_dtype))

    n, _, h, w = batch.dino_images.shape
    p = cfg.dino_patch_size
    hw = (h // p) * (w // p)
    dino_emb = jg.encode_dino_to_llm(
        params, batch.dino_images, cfg, compute_dtype, remat=remat,
        remat_group=dino_remat_group,
    )
    seq = seq.at[batch.dino_indexes].set(dino_emb)

    # ViT branch: packed semantic image tokens scattered into the sequence
    # (reference g2vlm.py:334-344); padded vit_indexes point past S -> dropped.
    if batch.vit_patches is not None and batch.vit_patches.shape[0] > 0:
        from ..models import qwen_vit

        vit_emb = qwen_vit.encode_packed(
            params["vit"], batch.vit_patches, batch.vit_coords, batch.vit_seg,
            cfg.vit, compute_dtype, attn_impl=attn_impl, remat=remat,
        )
        seq = seq.at[batch.vit_indexes].set(
            vit_emb.astype(compute_dtype), mode="drop"
        )

    q_info = TokenInfo(batch.doc_id, batch.fn_id, batch.noise_id, batch.pos)
    hidden, _ = mot_decoder.decoder_forward(
        params["llm"],
        seq,
        batch.is_geo,
        batch.position_ids,
        q_info=q_info,
        kv_info=None,
        past_kv=None,
        cfg=cfg.llm,
        expert_mode=mot_decoder.MIXED if geo_start is None else mot_decoder.SPLIT,
        geo_start=geo_start,
        collect_kv=False,
        remat_group=remat_group,
        remat_inner=remat_inner,
        compute_dtype=compute_dtype,
        attn_impl=attn_impl,
        remat=remat,
        sp=sp,
    )

    details: Dict[str, jax.Array] = {}
    total = jnp.zeros((), jnp.float32)

    # --- CE on answer spans (reference g2vlm.py:530-535 + len2weight) ---
    ce_hidden = hidden[batch.ce_indexes]
    logits = mot_decoder.lm_head(params["llm"], ce_hidden, jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, batch.ce_labels[:, None], axis=-1)[:, 0]
    wsum = jnp.sum(batch.ce_weights) + 1e-8
    ce = jnp.sum(nll * batch.ce_weights) / wsum
    details["ce"] = ce
    total = total + ce_weight * ce

    # --- Pi3 losses on dino-position hidden states (g2vlm.py:452-528) ---
    dino_hidden = hidden[batch.dino_indexes].reshape(n, hw, -1)
    preds = jg.pi3_predict(
        params, dino_hidden, (h, w), cfg, compute_dtype=compute_dtype,
        remat=remat, view_chunk=head_view_chunk,
    )
    pred = {
        "local_points": preds["local_points"][None],
        "camera_poses": preds["camera_poses"][None],
        "global_points": preds.get("global_points", None),
        "conf": preds.get("conf", None),
    }
    if pred["global_points"] is not None:
        pred["global_points"] = pred["global_points"][None]
    if pred["conf"] is not None:
        pred["conf"] = pred["conf"][None]
    gt = {
        "world_points": batch.world_points,
        "point_masks": batch.point_masks,
        "extrinsics": batch.extrinsics,
    }
    if pred["conf"] is not None:
        # conf supervision (reference pi3_loss.py:146-163): sky masks from
        # the frozen SegFormer — precomputed by the pipeline, or predicted
        # in-program from the same normalized frames the reference uses
        # (pi3_loss.py:62-65 runs it on gt['imgs'] under no_grad)
        gt["conf_target_thresh"] = conf_target_thresh
        sky = batch.sky_masks
        if sky is None and "segformer" in params:
            from ..models import segformer

            sky = jax.lax.stop_gradient(
                segformer.predict_sky_mask(
                    params["segformer"], batch.dino_images
                )
            )[None]
        if sky is not None:
            gt["sky_mask"] = sky
    dl, dl_details = losses.pi3_loss(pred, gt, batch.normal_batch_mask)
    details.update(dl_details)
    details["dl"] = dl
    total = total + recon_weight * dl

    return total, details


class TrainState(NamedTuple):
    step: jax.Array
    params: Dict
    opt_state: Any
    ema_params: Optional[Dict]


# Param-tree keys owned by the geometry side: the geo expert inside each MoT
# layer plus the recon towers/heads (reference freeze_recon detaches these
# paths per-token, qwen2vl.py:473-496, 807-834; freeze_all_params over the
# recon modules, g2vlm.py:221-224).
_GEO_LAYER_KEYS = frozenset(
    "ln_attn_geo q_geo k_geo v_geo o_geo q_norm_geo k_norm_geo ln_mlp_geo "
    "mlp_geo ls1 ls2 norm_geo".split()
)
_RECON_TOP_KEYS = frozenset(
    "dino dino2llm point_decoder point_head camera_decoder camera_head "
    "global_decoder global_point_head conf_decoder conf_head".split()
)
_ALWAYS_FROZEN = frozenset({"segformer"})  # reference pi3_loss.py:55-65


def freeze_labels(params: Dict, freeze_und: bool, freeze_recon: bool) -> Dict:
    """'train' / 'frozen' label per leaf. freeze_und freezes the und expert
    + the semantic ViT; freeze_recon freezes the geo expert + recon towers
    (reference qwen2vl.py freeze flags + g2vlm.py:221-224). Shared trunk
    leaves (embed, lm_head) stay trainable."""

    def label(path, _leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys[0] in _ALWAYS_FROZEN:
            return "frozen"
        geo = keys[0] in _RECON_TOP_KEYS or any(k in _GEO_LAYER_KEYS for k in keys)
        if geo:
            return "frozen" if freeze_recon else "train"
        und = keys[0] == "vit" or (
            keys[0] == "llm" and keys[-1] not in ("embed", "lm_head")
        )
        if und and freeze_und:
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


class FactoredAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu_row: Any  # EMA of mean(g^2) over the last dim; None leaf if unfactored
    nu_col: Any  # EMA of mean(g^2) over dim -2; None leaf if unfactored
    nu_full: Any  # full fp32 nu for leaves too small/low-rank to factor


def scale_by_factored_adam(
    b1=0.9,
    b2=0.95,
    eps=1e-8,
    mu_dtype=None,
    min_dim_size_to_factor=128,
):
    """Adam with Adafactor-style factored second moments (Shazeer & Stern,
    arXiv:1804.04235 §3): for leaves whose trailing two dims are both >=
    min_dim_size_to_factor, nu is stored as row/col means over the LAST TWO
    axes (leading axes — e.g. the (28, ...) stacked-layer axis of the MoT
    scan params — are kept), reconstructed as
        v_hat[..., i, j] = r[..., i] * c[..., j] / mean_i(r[..., i]).
    Everything else (step-size schedule, b1/b2 EMAs, bias correction, eps)
    follows Adam, but the second moment is an Adafactor-style APPROXIMATION:
    it equals Adam's only while the nu EMA itself stays rank-1 — i.e. at
    step 1, or when every step's g^2 shares the same row/col profile (an
    EMA of *different* rank-1 matrices is not rank-1). For general
    gradients the update direction approximates Adam's per-coordinate
    scaling (tests/test_trainer_opt.py checks both the exact regimes and
    convergence under general grads). Memory: nu drops from 4 bytes/param to
    ~4*(d1+d2)/(d1*d2) — ~8.4 GB -> ~17 MB for the 2.1B-trainable recon
    stage; with mu_dtype=bfloat16 the whole optimizer state is ~2.06
    bytes/param. The reference's memory lever at this stage is CPU
    optimizer offload (train/fsdp_utils.py:107-131) — impossible through a
    tunneled chip and a host round-trip per step on TPU; factoring keeps
    the state on-chip instead."""

    def factorable(p):
        return (
            p.ndim >= 2
            and p.shape[-1] >= min_dim_size_to_factor
            and p.shape[-2] >= min_dim_size_to_factor
        )

    def init_fn(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu_row = jax.tree.map(
            lambda p: jnp.zeros(p.shape[:-1], jnp.float32)
            if factorable(p) else None,
            params,
        )
        nu_col = jax.tree.map(
            lambda p: jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
            if factorable(p) else None,
            params,
        )
        nu_full = jax.tree.map(
            lambda p: None if factorable(p)
            else jnp.zeros_like(p, dtype=jnp.float32),
            params,
        )
        return FactoredAdamState(
            jnp.zeros((), jnp.int32), mu, nu_row, nu_col, nu_full
        )

    def update_fn(grads, state, params=None):
        del params
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd_mu(m, g):
            return (b1 * m.astype(jnp.float32)
                    + (1.0 - b1) * g.astype(jnp.float32)).astype(m.dtype)

        mu = jax.tree.map(upd_mu, state.mu, grads)

        def upd_row(r, g):
            if r is None:
                return None
            g2 = jnp.square(g.astype(jnp.float32))
            return b2 * r + (1.0 - b2) * jnp.mean(g2, axis=-1)

        def upd_col(c, g):
            if c is None:
                return None
            g2 = jnp.square(g.astype(jnp.float32))
            return b2 * c + (1.0 - b2) * jnp.mean(g2, axis=-2)

        def upd_full(v, g):
            if v is None:
                return None
            g2 = jnp.square(g.astype(jnp.float32))
            return b2 * v + (1.0 - b2) * g2

        is_none = lambda x: x is None
        nu_row = jax.tree.map(upd_row, state.nu_row, grads, is_leaf=is_none)
        nu_col = jax.tree.map(upd_col, state.nu_col, grads, is_leaf=is_none)
        nu_full = jax.tree.map(upd_full, state.nu_full, grads, is_leaf=is_none)

        def step(g, m, r, c, v):
            m_hat = m.astype(jnp.float32) / bc1
            if v is not None:
                v_hat = v / bc2
            else:
                # r carries dim -2, c carries dim -1; mean over r's last
                # axis normalizes the shared total so r*c has g^2's scale
                denom = jnp.mean(r, axis=-1, keepdims=True)
                v_hat = (
                    r[..., :, None] * c[..., None, :]
                    / jnp.maximum(denom[..., None], 1e-30)
                ) / bc2
            return (m_hat / (jnp.sqrt(v_hat) + eps)).astype(g.dtype)

        updates = jax.tree.map(
            step, grads, mu, nu_row, nu_col, nu_full, is_leaf=is_none
        )
        return updates, FactoredAdamState(count, mu, nu_row, nu_col, nu_full)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    learning_rate=1e-4,
    weight_decay=0.05,
    b1=0.9,
    b2=0.95,
    grad_clip=1.0,
    schedule=None,
    freeze_und: bool = False,
    freeze_recon: bool = False,
    params: Optional[Dict] = None,
    mu_dtype=None,
    factored_v: bool = False,
):
    """mu_dtype=bfloat16 stores AdamW's first moment in bf16 — 2 bytes/param
    off the optimizer state (~4.2 GB at the 2.1B-trainable recon stage, vs
    the 909 MB that kept 16-view recon training from fitting single-chip;
    docs/BENCH_NOTES.md HBM table). The second moment stays fp32 (its
    dynamic range is what Adam is sensitive to). The reference's equivalent
    memory lever is CPU optimizer offload (train/fsdp_utils.py:107-131) —
    a non-starter through a tunneled chip; moment compression is the
    TPU-native form."""
    lr = schedule if schedule is not None else learning_rate
    if factored_v:
        opt = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            scale_by_factored_adam(b1=b1, b2=b2, mu_dtype=mu_dtype),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(lr),
        )
    else:
        opt = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(
                lr, b1=b1, b2=b2, weight_decay=weight_decay, mu_dtype=mu_dtype
            ),
        )
    need_mask = freeze_und or freeze_recon or (
        params is not None and "segformer" in params
    )
    if need_mask:
        assert params is not None, "freeze flags need the param tree"
        labels = freeze_labels(params, freeze_und, freeze_recon)
        return optax.multi_transform(
            {"train": opt, "frozen": optax.set_to_zero()}, labels
        )
    return opt


def init_train_state(params, optimizer, ema: bool = True) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def make_train_step(
    cfg: G2VLMConfig,
    optimizer,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    ema_decay: float = 0.9999,
    donate: bool = True,
    remat: bool = True,
    geo_start: Optional[int] = None,
    sp=None,
    head_view_chunk: int = 0,
    remat_group: int = 1,
    dino_remat_group: int = 1,
    remat_inner: bool = True,
):
    """Returns train_step(state, batch) -> (state, metrics). `batch` carries a
    leading dp-batch axis; the loss is the mean over it. Pass geo_start (a
    static int, bucketed by the packer) to train in the SPLIT expert layout.

    sp=(mesh, axis_name) trains with sequence-parallel attention: shard_map
    can't sit under vmap, so the per-device batch axis is consumed with a
    Python loop (SP shards one long pack across chips — per-device batch is
    normally 1 there anyway)."""

    def loss_fn(params, batch):
        def one(b):
            return train_forward(
                params, b, cfg, compute_dtype=compute_dtype,
                attn_impl=attn_impl, remat=remat, geo_start=geo_start,
                sp=sp, head_view_chunk=head_view_chunk,
                remat_group=remat_group,
                dino_remat_group=dino_remat_group,
                remat_inner=remat_inner,
            )

        if sp is not None:
            outs = [
                one(jax.tree.map(lambda x, i=i: x[i], batch))
                for i in range(jax.tree.leaves(batch)[0].shape[0])
            ]
            total = jnp.stack([t for t, _ in outs])
            details = jax.tree.map(lambda *xs: jnp.stack(xs), *[d for _, d in outs])
        else:
            # spmd_axis_name binds the mapped batch dim of any sharding
            # constraint inside the model (e.g. the rope-table pin in
            # mot_decoder) to the dp mesh axis; inert when no mesh is active
            total, details = jax.vmap(one, spmd_axis_name="dp")(batch)
        return jnp.mean(total), jax.tree.map(jnp.mean, details)

    def train_step(state: TrainState, batch: TrainBatch):
        (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            # flat-param EMA, decay 0.9999 (reference fsdp_utils.py:558-572)
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1 - ema_decay),
                ema,
                params,
            )
        metrics = dict(details)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(state.step + 1, params, opt_state, ema),
            metrics,
        )

    return train_step
