"""Text <-> token-sequence converters for inference.

Behavioral contract matches the reference inference utilities
(/root/reference/deephumor/experiments/inference.py), but sequences are
numpy int32 arrays (the framework's host-side token representation) instead
of torch tensors.
"""

import re

import numpy as np

from deephumor_tpu.data.vocab import SPECIAL_TOKENS

__all__ = ["text_to_seq", "seq_to_text", "split_caption"]

# Strips the space before punctuation when re-joining tokens
# (reference inference.py:8).
_PUNCT_PATTERN = re.compile(r"( )([!#$%&\()*+,\-.\/:;<=>?@\\^{|}~]+)")
_SPECIAL_TOKEN_PATTERN = re.compile(r"<\w+>")


def text_to_seq(text, vocab, tokenizer):
    """Tokenizes ``text`` into a ``[1, seq_len]`` int32 array of token ids.

    Lowercases, tokenizes, replaces out-of-vocab tokens with UNK. No EOS is
    appended (parity: reference inference.py:11-32; contrast with the
    dataset path which appends EOS).
    """
    tokens = tokenizer.tokenize(text.lower())
    unk = SPECIAL_TOKENS["UNK"]
    ids = [vocab.stoi[tok if tok in vocab.stoi else unk] for tok in tokens]
    return np.asarray(ids, dtype=np.int32)[None, :]


def seq_to_text(seq, vocab, delimiter=" "):
    """Converts a 1-D id sequence to text, truncating at the first EOS.

    Parity: reference inference.py:35-58.
    """
    seq = np.asarray(seq).reshape(-1)
    eos_id = vocab.stoi[SPECIAL_TOKENS["EOS"]]
    eos_positions = np.where(seq == eos_id)[0]
    if eos_positions.size > 0:
        seq = seq[: eos_positions[0]]
    return delimiter.join(vocab.itos[int(i)] for i in seq)


def split_caption(text, num_blocks=None):
    """Splits a caption on ``<sep>`` into cleaned text blocks.

    Each block is stripped of special tokens, edge whitespace, and the space
    before punctuation; the block list is padded with empty strings up to
    ``num_blocks`` (parity: reference inference.py:61-89).
    """

    def _clean(block):
        block = _SPECIAL_TOKEN_PATTERN.sub("", block)
        block = block.strip()
        return _PUNCT_PATTERN.sub(r"\2", block)

    blocks = [_clean(b) for b in text.split(SPECIAL_TOKENS["SEP"])]
    if num_blocks is None:
        num_blocks = len(blocks)
    elif len(blocks) < num_blocks:
        blocks += [""] * (num_blocks - len(blocks))
    return blocks[:num_blocks]
