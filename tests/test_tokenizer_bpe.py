"""Real-BPE tokenizer parity: our HF-backed loader vs the reference's
IN-TREE Qwen2Tokenizer (modeling/qwen2/tokenization_qwen2.py) on a genuine
tiny byte-level BPE vocab (tests/bpe_fixture.py) — template encoding,
add_special_tokens id mapping, and the prepare_start_tokens derivation
(closes the round-2 gap where every chat parity path used a hash stub)."""

import os

import pytest

import torch_ref

torch_ref.install()

from bpe_fixture import train_tiny_bpe

from g2vlm_tpu.data import token_utils
from g2vlm_tpu.data.tokenizer import (
    SPECIAL_TOKENS,
    START_TOKEN_TEMPLATE,
    derive_start_token,
    load_tokenizer,
)


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    return train_tiny_bpe(str(tmp_path_factory.mktemp("tiny_bpe")))


@pytest.fixture(scope="module")
def ref_tok(bpe_dir):
    from modeling.qwen2.tokenization_qwen2 import Qwen2Tokenizer

    return Qwen2Tokenizer(
        os.path.join(bpe_dir, "vocab.json"),
        os.path.join(bpe_dir, "merges.txt"),
        unk_token="<|endoftext|>",
        eos_token="<|endoftext|>",
        pad_token="<|endoftext|>",
    )


STRINGS = [
    token_utils.CHAT_SYSTEM,
    token_utils.CHAT_SUFFIX,
    token_utils.RECON_PROMPT,
    START_TOKEN_TEMPLATE,
    "How far is the red point from the blue point?",
    "\nThe distance between the two points is about 1.5 meters.",
    "unseen wörds → bytes é你好",  # multibyte utf-8 fallback path
]


def test_special_tokens_and_encode_parity(bpe_dir, ref_tok):
    """Our loader on the fixture == the reference's in-tree tokenizer +
    add_special_tokens (data/data_utils.py:278-313): same added-token count,
    same id map, identical ids for every chat string."""
    import sys

    sys.path.insert(0, "/root/reference")
    from data.data_utils import add_special_tokens as ref_add

    ref_tok2, ref_ids, ref_added = ref_add(ref_tok)
    ours, our_ids, our_added = load_tokenizer(bpe_dir)
    assert our_added == ref_added == len(SPECIAL_TOKENS)
    assert our_ids == ref_ids

    for s in STRINGS:
        got = ours.encode(s, add_special_tokens=False)
        want = ref_tok2.encode(s, add_special_tokens=False)
        assert got == want, s
        assert ours.decode(got) == ref_tok2.decode(want)
        # genuine BPE sanity: multi-char strings compress below byte count
    long = token_utils.CHAT_SYSTEM
    assert len(ours.encode(long)) < len(long.encode("utf-8"))


def test_start_token_derivation_matches_reference(bpe_dir, ref_tok):
    """derive_start_token == the reference's template_ids[-1] rule
    (g2vlm.py:1042-1052), evaluated with the reference's own tokenizer."""
    import sys

    sys.path.insert(0, "/root/reference")
    from data.data_utils import add_special_tokens as ref_add

    ref_tok2, ref_ids, _ = ref_add(ref_tok)
    template_ids = ref_tok2.encode(
        START_TOKEN_TEMPLATE, add_special_tokens=False
    )
    want = template_ids[-1] if template_ids else (ref_tok2.eos_token_id or 151643)

    ours, our_ids, _ = load_tokenizer(bpe_dir)
    assert derive_start_token(ours, our_ids) == want
    # tokenizer-less fallback: reference uses eos when no template ids
    assert derive_start_token(None, our_ids) == our_ids["eos_token_id"]
