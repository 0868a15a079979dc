"""High-level inference pipelines mirroring the reference entry points
(inference_recon.py / inference_chat.py) with jitted, shape-bucketed forwards.

Reference flow (g2vlm.py:1240-1410) loops Python-side over cache-update
phases; here each public call lowers to one or two XLA programs per shape
bucket, cached across calls.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import G2VLMConfig
from ..data.images import load_views, resnet_normalize
from ..models import g2vlm as jg
from ..models import mot_decoder

RECON_PROMPT = "Reconstruct the 3D scene."


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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
        self.attn_impl = attn_impl
        self.seq_pad_multiple = seq_pad_multiple
        self._recon_jit = functools.lru_cache(maxsize=16)(self._make_recon_fn)

    # ------------------------------------------------------------------
    def _encode_text(self, text: str, add_bos: bool = False) -> List[int]:
        if self.tokenizer is None:
            # Deterministic fake ids for weight-free smoke/bench runs.
            ids = [(hash(w) % 5000) + 100 for w in text.split()]
        else:
            ids = self.tokenizer.encode(text)
        if add_bos:
            ids = [self.new_token_ids["bos_token_id"]] + ids
        return ids

    def _make_recon_fn(self, shape_key: Tuple[int, int, int, int]):
        n, h, w, pad_to = shape_key
        p = self.cfg.dino_patch_size
        hp, wp = h // p, w // p

        def fn(params, prefill_arrays, images):
            prefill = jg.PackedPrefill(*prefill_arrays)
            return jg.recon_forward(
                params, prefill, images, self.cfg,
                compute_dtype=self.compute_dtype, attn_impl=self.attn_impl,
            )

        return jax.jit(fn, static_argnums=())

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
        n, _, h, w = views.shape
        p = self.cfg.dino_patch_size
        prefill = self.build_recon_prefill(n, h // p, w // p, prompt)
        normed = jnp.asarray(resnet_normalize(views))
        fn = self._recon_jit((n, h, w, len(prefill.doc_id)))
        out = fn(self.params, tuple(prefill), normed)
        out = {k: np.asarray(v) for k, v in out.items()}
        out["images"] = views
        return out
