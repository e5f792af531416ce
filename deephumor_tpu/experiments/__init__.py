"""Experiments layer: training loop, metrics, inference text utilities.

Public surface mirrors the reference ``deephumor.experiments`` package
(/root/reference/deephumor/experiments/__init__.py:5-11).
"""

from deephumor_tpu.experiments.inference import (
    text_to_seq,
    seq_to_text,
    split_caption,
)
from deephumor_tpu.experiments.metrics import masked_cross_entropy, perplexity
from deephumor_tpu.experiments.trainer import Trainer

__all__ = [
    "text_to_seq",
    "seq_to_text",
    "split_caption",
    "perplexity",
    "masked_cross_entropy",
    "Trainer",
]
