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
    dino_emb = jg.encode_dino_to_llm(params, batch.dino_images, cfg, compute_dtype)
    seq = seq.at[batch.dino_indexes].set(dino_emb)

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
        compute_dtype=compute_dtype,
        attn_impl=attn_impl,
        remat=remat,
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
        params, dino_hidden, (h, w), cfg, compute_dtype=compute_dtype
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


def make_optimizer(
    learning_rate=1e-4,
    weight_decay=0.05,
    b1=0.9,
    b2=0.95,
    grad_clip=1.0,
    schedule=None,
):
    lr = schedule if schedule is not None else learning_rate
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay),
    )


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
):
    """Returns train_step(state, batch) -> (state, metrics). `batch` carries a
    leading dp-batch axis; the loss is the mean over it. Pass geo_start (a
    static int, bucketed by the packer) to train in the SPLIT expert layout."""

    def loss_fn(params, batch):
        def one(b):
            return train_forward(
                params, b, cfg, compute_dtype=compute_dtype,
                attn_impl=attn_impl, remat=remat, geo_start=geo_start,
            )

        total, details = jax.vmap(one)(batch)
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
