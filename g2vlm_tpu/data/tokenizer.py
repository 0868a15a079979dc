"""Tokenizer loading (host-side). Behavioral spec: reference
g2vlm_utils.py:57-58 + data/data_utils.py:278-313 (add_special_tokens).

Tokenization is pure host work — we reuse transformers' Qwen2 BPE rather than
rebuilding byte-level BPE."""

from __future__ import annotations

from typing import Dict, Tuple

SPECIAL_TOKENS = ["<|im_start|>", "<|im_end|>", "<|vision_start|>", "<|vision_end|>"]


def load_tokenizer(path: str) -> Tuple[object, Dict[str, int], int]:
    """-> (tokenizer, new_token_ids, num_added). new_token_ids keys match the
    reference: bos_token_id (<|im_start|>), eos_token_id (<|im_end|>),
    start_of_image (<|vision_start|>), end_of_image (<|vision_end|>)."""
    from transformers import Qwen2Tokenizer

    tokenizer = Qwen2Tokenizer.from_pretrained(path)
    existing = set()
    for v in tokenizer.special_tokens_map.values():
        if isinstance(v, str):
            existing.add(v)
        else:
            existing.update(v)
    new = [t for t in SPECIAL_TOKENS if t not in existing]
    num_added = tokenizer.add_tokens(new)
    ids = {t: tokenizer.convert_tokens_to_ids(t) for t in SPECIAL_TOKENS}
    new_token_ids = dict(
        bos_token_id=ids["<|im_start|>"],
        eos_token_id=ids["<|im_end|>"],
        start_of_image=ids["<|vision_start|>"],
        end_of_image=ids["<|vision_end|>"],
    )
    return tokenizer, new_token_ids, num_added


# the reference derives the decode start token by encoding this template and
# taking the LAST id (g2vlm.py:1046-1052) — with the production Qwen2 vocab
# that is the trailing '\n' (id 198)
START_TOKEN_TEMPLATE = (
    "<|im_start|>user\\your text<|im_end|>\n<|im_start|>assistant\n"
)


def derive_start_token(tokenizer, new_token_ids: Dict[str, int]) -> int:
    """Decode start token per reference prepare_start_tokens
    (g2vlm.py:1042-1068): last id of the fixed chat template encoded WITHOUT
    special tokens; tokenizer-less runs fall back to the eos/pad ids the
    reference uses."""
    if tokenizer is None:
        return new_token_ids["eos_token_id"]
    ids = tokenizer.encode(START_TOKEN_TEMPLATE, add_special_tokens=False)
    if ids:
        return ids[-1]
    return getattr(tokenizer, "eos_token_id", None) or 151643
