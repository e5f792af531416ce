"""Data layer: tokenizers, vocabulary, datasets, batching.

Public surface mirrors the reference ``deephumor.data`` package
(/root/reference/deephumor/data/__init__.py:6-10).
"""

from deephumor_tpu.data.vocab import (
    SPECIAL_TOKENS,
    PAD_ID,
    UNK_ID,
    BOS_ID,
    EOS_ID,
    SEP_ID,
    EMP_ID,
    Vocab,
    build_vocab,
    build_vocab_from_file,
)
from deephumor_tpu.data.tokenizers import (
    Tokenizer,
    WordPunctTokenizer,
    CharTokenizer,
)
from deephumor_tpu.data.datasets import MemeDataset
from deephumor_tpu.data.dataloaders import pad_collate

__all__ = [
    "SPECIAL_TOKENS",
    "PAD_ID",
    "UNK_ID",
    "BOS_ID",
    "EOS_ID",
    "SEP_ID",
    "EMP_ID",
    "Vocab",
    "build_vocab",
    "build_vocab_from_file",
    "Tokenizer",
    "WordPunctTokenizer",
    "CharTokenizer",
    "MemeDataset",
    "pad_collate",
]
