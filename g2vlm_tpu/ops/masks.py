"""Per-token attention metadata — the TPU-native replacement for the
reference's four attention regimes:

  * train packed flex-attention block mask (reference data/data_utils.py:10-37)
  * dense per-sample nested masks (data/data_utils.py:205-239)
  * flash-attn varlen causal prefill/decode (qwen2vl.py:396-408)
  * flash-attn varlen non-causal prefill over merged KV (qwen2vl.py:640-652)

One rule covers all of them. Each token carries four int32 fields:

  doc_id   : packing document id; attention never crosses documents.
             doc_id < 0 marks padding.
  fn_id    : "full/noise" split id: tokens sharing a non-negative fn_id attend
             to each other bidirectionally (vision splits). -1 = causal-only.
  noise_id : noise split id; a non-negative noise_id isolates the split:
             outside queries cannot see it. -1 = not noise.
  pos      : monotone sequence order used for the causal comparison
             (global packed index at train time; cache-absolute index at
             inference).

mask(q, kv) = (doc_q == doc_kv) & (doc_q >= 0) & (doc_kv >= 0)
              & (pos_kv <= pos_q  |  (fn_q == fn_kv & fn_q >= 0))
              & !(noise_kv >= 0 & noise_q != noise_kv)

which is exactly and_masks(or_masks(causal, full_and_noise), remove_noise,
sample) from the reference sparse mask.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class TokenInfo(NamedTuple):
    """Per-token attention metadata; each field is int32 of shape (S,)."""

    doc_id: jax.Array
    fn_id: jax.Array
    noise_id: jax.Array
    pos: jax.Array

    @property
    def seq_len(self) -> int:
        return self.doc_id.shape[-1]

    def slice(self, start: int, size: int) -> "TokenInfo":
        return TokenInfo(*(jax.lax.dynamic_slice_in_dim(f, start, size) for f in self))


def make_token_info_np(
    sample_lens: Sequence[int],
    split_lens: Sequence[int],
    attn_modes: Sequence[str],
    pad_to: int | None = None,
) -> TokenInfo:
    """Host-side builder matching the reference train-time mask semantics
    (create_sparse_mask, data/data_utils.py:10-37)."""
    total = int(sum(sample_lens))
    assert total == int(sum(split_lens)), (sample_lens, split_lens)
    doc = np.concatenate(
        [np.full(l, i, dtype=np.int32) for i, l in enumerate(sample_lens)]
    )
    fn = np.concatenate(
        [
            np.full(l, i if m in ("full", "noise") else -1, dtype=np.int32)
            for i, (l, m) in enumerate(zip(split_lens, attn_modes))
        ]
    )
    noise = np.concatenate(
        [
            np.full(l, i if m == "noise" else -1, dtype=np.int32)
            for i, (l, m) in enumerate(zip(split_lens, attn_modes))
        ]
    )
    pos = np.arange(total, dtype=np.int32)
    if pad_to is not None and pad_to > total:
        pad = pad_to - total
        doc = np.concatenate([doc, np.full(pad, -1, np.int32)])
        fn = np.concatenate([fn, np.full(pad, -1, np.int32)])
        noise = np.concatenate([noise, np.full(pad, -1, np.int32)])
        pos = np.concatenate([pos, np.full(pad, 0, np.int32)])
    return TokenInfo(
        jnp.asarray(doc), jnp.asarray(fn), jnp.asarray(noise), jnp.asarray(pos)
    )


def make_segment_mask(q_info: TokenInfo, kv_info: TokenInfo) -> jax.Array:
    """Materialize the boolean (S_q, S_kv) mask. Only for testing / the dense
    fallback — the flash kernel evaluates the same rule blockwise."""
    dq, fq, nq, pq = (f[:, None] for f in q_info)
    dk, fk, nk, pk = (f[None, :] for f in kv_info)
    same_doc = (dq == dk) & (dq >= 0) & (dk >= 0)
    causal = pk <= pq
    full = (fq == fk) & (fq >= 0)
    not_hidden_noise = ~((nk >= 0) & (nq != nk))
    return same_doc & (causal | full) & not_hidden_noise
