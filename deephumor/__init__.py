"""Compatibility shim: ``deephumor.*`` imports map to ``deephumor_tpu``.

Lets code written against the reference package's import paths
(/root/reference/deephumor/__init__.py layout) run on this framework
unchanged for the text/data/imaging surface:

    from deephumor.data import Vocab, WordPunctTokenizer
    from deephumor.imaging import memeify_image
    from deephumor.experiments import seq_to_text, split_caption

Model classes live under ``deephumor.models`` with the same names; note
they are functional (params passed explicitly) rather than torch modules —
see deephumor_tpu.models for the API.
"""

import sys

import deephumor_tpu
import deephumor_tpu.crawlers as crawlers
import deephumor_tpu.data as data
import deephumor_tpu.experiments as experiments
import deephumor_tpu.imaging as imaging
import deephumor_tpu.models as models

sys.modules["deephumor.data"] = data
sys.modules["deephumor.data.vocab"] = sys.modules[
    "deephumor_tpu.data.vocab"
]
sys.modules["deephumor.data.tokenizers"] = sys.modules[
    "deephumor_tpu.data.tokenizers"
]
sys.modules["deephumor.models"] = models
sys.modules["deephumor.experiments"] = experiments
sys.modules["deephumor.imaging"] = imaging
sys.modules["deephumor.crawlers"] = crawlers

from deephumor_tpu.data import (  # noqa: E402,F401
    SPECIAL_TOKENS,
    CharTokenizer,
    Tokenizer,
    Vocab,
    WordPunctTokenizer,
    build_vocab,
    build_vocab_from_file,
)

__all__ = [
    "data",
    "models",
    "experiments",
    "imaging",
    "crawlers",
    "SPECIAL_TOKENS",
    "Vocab",
    "build_vocab",
    "build_vocab_from_file",
    "Tokenizer",
    "WordPunctTokenizer",
    "CharTokenizer",
]
