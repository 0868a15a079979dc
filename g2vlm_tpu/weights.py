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


class _RecordingStateDict:
    """Dict view over a state_dict that records every key the mapper reads,
    so the audit is an exact inventory of consumed keys — not a prefix check.
    A lookup of a missing key raises KeyError immediately (hard fail), unlike
    the reference's strict=False load which silently drops mismatches
    (g2vlm_utils.py:65)."""

    def __init__(self, sd: Dict):
        self._sd = sd
        self.used: set = set()

    def __getitem__(self, k):
        v = self._sd[k]  # KeyError on missing = hard fail with the key name
        self.used.add(k)
        return v

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def keys(self):
        return self._sd.keys()

    def __len__(self):
        return len(self._sd)


def _ignorable(key: str, cfg: G2VLMConfig) -> bool:
    """Checkpoint keys legitimately not consumed by the model mapper."""
    if key.endswith("num_batches_tracked"):
        return True  # BN step counters — no numeric role at inference
    if not cfg.train_conf_pi3 and key.startswith("Pi3Loss."):
        # the frozen sky segmenter under the loss module is only needed for
        # conf training; with train_conf_pi3=True params_from_torch consumes
        # Pi3Loss.point_loss.segformer.* (g2vlm.py) so nothing is dropped
        return True
    return False


def load_checkpoint(
    checkpoint_dir: str,
    cfg: Optional[G2VLMConfig] = None,
    strict: bool = True,
) -> Tuple[Dict, G2VLMConfig]:
    """Read the reference checkpoint layout: text_config.json / vit_config.json
    / dino_config.json + model.safetensors.

    strict=True hard-fails on BOTH directions of key mismatch: a key the
    mapper needs but the checkpoint lacks (KeyError from the mapper itself),
    and a checkpoint key no mapper consumed (so a renamed key can never load
    garbage silently — SURVEY hard-part #6, anti-goal g2vlm_utils.py:65)."""
    if cfg is None:
        cfg = G2VLMConfig.from_checkpoint_dir(checkpoint_dir)
    sd = load_safetensors(os.path.join(checkpoint_dir, "model.safetensors"))
    if not strict:
        return jg.params_from_torch(sd, cfg), cfg
    rec = _RecordingStateDict(sd)
    params = jg.params_from_torch(rec, cfg)
    unknown = sorted(
        k for k in sd if k not in rec.used and not _ignorable(k, cfg)
    )
    if unknown:
        raise KeyError(
            f"checkpoint has {len(unknown)} keys no mapper consumed "
            f"(renamed/extra?): {unknown[:20]}"
        )
    return params, cfg


def audit_keys(state_dict: Dict, cfg: G2VLMConfig) -> Dict:
    """Exact two-way key-space diff between a reference state_dict and what
    params_from_torch consumes. Returns {"unknown": [...], "missing": [...]};
    both empty on a clean checkpoint."""
    rec = _RecordingStateDict(state_dict)
    missing = []
    try:
        jg.params_from_torch(rec, cfg)
    except KeyError as e:
        missing.append(str(e.args[0]))
    unknown = sorted(
        k for k in state_dict
        if k not in rec.used and not _ignorable(k, cfg)
    )
    return {"unknown": unknown, "missing": missing}


def load_segformer_pth(path: str) -> Dict:
    """Standalone loader for the reference's frozen sky segmenter weights
    (segformer.b0.512x512.ade.160k.pth, a torch pickle holding
    {'state_dict': {backbone.* / decode_head.*}} — reference
    prepare_segformer, pi3_loss.py:55-61). Returns params for
    models/segformer.py, suitable for params['segformer']."""
    import torch

    from .models import segformer

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    return segformer.params_from_torch(sd)


def module_checksums(params: Dict) -> Dict[str, Dict]:
    """Per-top-level-module fingerprints (param count + fp64 sum of values)
    for comparing a loaded tree against another implementation's load of the
    same checkpoint without shipping the weights themselves."""
    import jax

    out = {}
    for mod, sub in params.items():
        leaves = jax.tree.leaves(sub)
        out[mod] = {
            "leaves": len(leaves),
            "params": int(sum(np.asarray(x).size for x in leaves)),
            "value_sum": float(
                sum(np.asarray(x, np.float64).sum() for x in leaves)
            ),
        }
    return out


def _audit_cli(checkpoint_dir: str) -> int:
    """`python -m g2vlm_tpu.weights --audit <ckpt_dir>`: strict pass/fail on
    the real `InternRobotics/G2VLM-2B-MoT` checkpoint (the artifact this
    environment cannot fetch — reference load path g2vlm_utils.py:31-70,
    whose strict=False silently drops mismatches; this is the strict cure).

    Prints the exact two-way key diff (checkpoint keys no mapper consumed;
    mapper keys the checkpoint lacks), then per-module checksums of the
    loaded tree. Exit code 0 only on a clean two-way match."""
    cfg = G2VLMConfig.from_checkpoint_dir(checkpoint_dir)
    sd = load_safetensors(os.path.join(checkpoint_dir, "model.safetensors"))
    print(f"checkpoint: {len(sd)} tensors, "
          f"{sum(v.size for v in sd.values())/1e9:.3f}B params")
    diff = audit_keys(sd, cfg)
    for kind in ("missing", "unknown"):
        ks = diff[kind]
        label = ("mapper needs, checkpoint lacks" if kind == "missing"
                 else "checkpoint has, no mapper consumed")
        print(f"{kind} ({label}): {len(ks)}")
        for k in ks[:50]:
            print(f"  {k}")
        if len(ks) > 50:
            print(f"  ... and {len(ks) - 50} more")
    if diff["missing"]:
        print("AUDIT: FAIL (cannot build params — missing keys above)")
        return 1
    params = jg.params_from_torch(sd, cfg)
    print("per-module checksums (count / value sum):")
    for mod, info in sorted(module_checksums(params).items()):
        print(f"  {mod:12s} {info['params']:>13,d}  "
              f"sum={info['value_sum']:+.6e}")
    if diff["unknown"]:
        print("AUDIT: FAIL (unconsumed checkpoint keys above)")
        return 1
    print("AUDIT: PASS (exact two-way key match)")
    return 0


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


if __name__ == "__main__":
    import argparse
    import sys

    ap = argparse.ArgumentParser(
        description="Strict two-way audit of a reference checkpoint dir "
                    "(text/vit/dino_config.json + model.safetensors)")
    ap.add_argument("--audit", metavar="CKPT_DIR", required=True)
    sys.exit(_audit_cli(ap.parse_args().audit))
