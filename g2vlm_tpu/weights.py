"""Checkpoint ingestion: reference `model.safetensors` -> our pytree.

Behavioral spec: reference g2vlm_utils.py:31-70 (load_model_and_tokenizer).
Unlike the reference's strict=False (which silently drops mismatches,
g2vlm_utils.py:65), we inventory the key space and report anything unmapped.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from .config import G2VLMConfig
from .models import g2vlm as jg


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def load_checkpoint(
    checkpoint_dir: str,
    cfg: Optional[G2VLMConfig] = None,
    strict: bool = True,
) -> Tuple[Dict, G2VLMConfig]:
    """Read the reference checkpoint layout: text_config.json / vit_config.json
    / dino_config.json + model.safetensors."""
    if cfg is None:
        cfg = G2VLMConfig.from_checkpoint_dir(checkpoint_dir)
    sd = load_safetensors(os.path.join(checkpoint_dir, "model.safetensors"))
    params = jg.params_from_torch(sd, cfg)
    if strict:
        report = audit_keys(sd, cfg)
        if report["missing"]:
            raise KeyError(f"checkpoint missing keys: {report['missing'][:20]}")
    return params, cfg


def expected_key_prefixes(cfg: G2VLMConfig):
    pres = ["language_model."]
    if cfg.visual_recon:
        pres += [
            "dino_model.", "dino2llm.", "point_decoder.", "point_head.",
            "camera_decoder.", "camera_head.",
        ]
        if cfg.use_global_points:
            pres += ["global_points_decoder.", "global_point_head."]
        if cfg.train_conf_pi3:
            pres += ["conf_decoder.", "conf_head."]
    if cfg.visual_und:
        pres += ["vit_model."]
    return pres


def audit_keys(state_dict: Dict, cfg: G2VLMConfig) -> Dict:
    """Compare the checkpoint key space against what params_from_torch maps."""
    pres = expected_key_prefixes(cfg)
    unknown = [
        k for k in state_dict
        if not any(k.startswith(p) for p in pres)
        and not k.startswith("Pi3Loss.")  # loss-module buffers (segformer)
    ]
    # A light structural check: each mapped prefix must be present.
    missing = [p for p in pres if not any(k.startswith(p) for k in state_dict)]
    return {"unknown": unknown, "missing": missing}


def init_moe_from_dense(params: Dict) -> Dict:
    """Bootstrap MoT expert weights by copying the base expert (reference
    Qwen2VLForCausalLM.init_moe, qwen2vl.py:1352-1356, used with
    try_load_ckpt_except_moe, fsdp_utils.py:398-435)."""
    import jax

    layers = dict(params["llm"]["layers"])
    pairs = [
        ("ln_attn_geo", "ln_attn"), ("q_geo", "q"), ("k_geo", "k"),
        ("v_geo", "v"), ("o_geo", "o"), ("q_norm_geo", "q_norm"),
        ("k_norm_geo", "k_norm"), ("ln_mlp_geo", "ln_mlp"),
        ("mlp_geo", "mlp"),
    ]
    for geo, base in pairs:
        if geo in layers:
            layers[geo] = jax.tree.map(lambda x: x, layers[base])
    llm = dict(params["llm"])
    llm["layers"] = layers
    if "norm_geo" in llm:
        llm["norm_geo"] = llm["norm"]
    out = dict(params)
    out["llm"] = llm
    return out
