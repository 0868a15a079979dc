"""Tiny GENUINE byte-level BPE fixture (vocab.json + merges.txt).

Trains real GPT-2-style byte-level BPE merges on the project's actual chat
strings, so tokenizer tests exercise the reference's in-tree Qwen2Tokenizer
(modeling/qwen2/tokenization_qwen2.py) and our HF-backed loader on a genuine
vocab instead of a hash stub — template construction, special-token ids and
start-token derivation all behave exactly as with the production 151k vocab,
just smaller (256 byte tokens + ~180 learned merges + specials < 512 ids).
"""

from __future__ import annotations

import json
import os
from collections import Counter

# the strings the chat path actually tokenizes (data/token_utils.py templates,
# reference data_utils.py:328-436 + g2vlm.py:1042-1068 start-token template)
DEFAULT_CORPUS = [
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    "<|im_start|>user\n",
    "<|im_end|>\n<|im_start|>assistant\n",
    "<|im_start|>user\\your text<|im_end|>\n<|im_start|>assistant\n",
    "Reconstruct the 3D scene.",
    "How far is the red point from the blue point?",
    "Which image is wider?",
    "The distance between the two points is about 1.5 meters.",
    "the quick brown fox jumps over the lazy dog",
]


def train_tiny_bpe(out_dir: str, corpus=None, n_merges: int = 180) -> str:
    """Train byte-level BPE and write vocab.json/merges.txt/tokenizer_config
    into out_dir. Returns out_dir."""
    import regex

    from transformers.models.qwen2.tokenization_qwen2 import (
        PRETOKENIZE_REGEX,
        bytes_to_unicode,
    )

    corpus = list(corpus or DEFAULT_CORPUS)
    b2u = bytes_to_unicode()
    pat = regex.compile(PRETOKENIZE_REGEX)
    words = []
    for text in corpus:
        for pre in pat.findall(text):
            words.append([b2u[b] for b in pre.encode("utf-8")])

    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w in words:
            counts.update(zip(w, w[1:]))
        if not counts:
            break
        (a, b), c = counts.most_common(1)[0]
        if c < 2:
            break
        merges.append((a, b))
        merged = a + b
        for w in words:
            i = 0
            while i < len(w) - 1:
                if w[i] == a and w[i + 1] == b:
                    w[i : i + 2] = [merged]
                else:
                    i += 1

    vocab = {ch: i for i, ch in enumerate(b2u.values())}
    vocab["<|endoftext|>"] = len(vocab)
    for a, b in merges:
        vocab[a + b] = len(vocab)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(out_dir, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "Qwen2Tokenizer",
                "unk_token": "<|endoftext|>",
                "eos_token": "<|endoftext|>",
                "pad_token": "<|endoftext|>",
                "model_max_length": 32768,
            },
            f,
        )
    return out_dir
