"""deephumor_tpu — a TPU-native meme-caption generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ilya16/deephumor
(reference mounted at /root/reference), designed TPU-first:

- all four caption models (2x LSTM, 2x Transformer) as functional modules over
  explicit parameter pytrees,
- a single jitted ``lax.scan`` generation engine with KV caches and batched
  stochastic/greedy beam search (replacing the reference's per-step Python
  loops, ``models/beam.py`` + ``models/rnn_models.py:48-143`` +
  ``models/transformers.py:492-579``),
- ``jax.sharding`` mesh parallelism for batch-scaled generation and training,
- the reference's public data/imaging API surface (tokenizers, Vocab,
  renderer) kept compatible.
"""

__version__ = "0.1.0"

from deephumor_tpu.data import (
    SPECIAL_TOKENS,
    Vocab,
    build_vocab,
    build_vocab_from_file,
    Tokenizer,
    WordPunctTokenizer,
    CharTokenizer,
)

__all__ = [
    "SPECIAL_TOKENS",
    "Vocab",
    "build_vocab",
    "build_vocab_from_file",
    "Tokenizer",
    "WordPunctTokenizer",
    "CharTokenizer",
]
