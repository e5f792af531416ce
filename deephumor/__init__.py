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

import importlib
import sys

import deephumor_tpu
import deephumor_tpu.crawlers as crawlers
import deephumor_tpu.data as data
import deephumor_tpu.experiments as experiments
import deephumor_tpu.imaging as imaging
import deephumor_tpu.models as models

sys.modules["deephumor.data"] = data
sys.modules["deephumor.models"] = models
sys.modules["deephumor.experiments"] = experiments
sys.modules["deephumor.imaging"] = imaging
sys.modules["deephumor.crawlers"] = crawlers

# Every submodule path importable on the reference must be importable here
# (reference deep-import style, e.g. ``from deephumor.data.vocab import
# Vocab`` / ``from deephumor.models.beam import BeamSearchHelper``). Map
# reference module names onto this framework's modules; names that moved
# (rnn_models -> lstm, transformers -> transformer, beam -> sampling) keep
# their reference path as an alias.
_SUBMODULES = {
    "deephumor.data.vocab": "deephumor_tpu.data.vocab",
    "deephumor.data.tokenizers": "deephumor_tpu.data.tokenizers",
    "deephumor.data.utils": "deephumor_tpu.data.utils",
    "deephumor.data.datasets": "deephumor_tpu.data.datasets",
    "deephumor.data.dataloaders": "deephumor_tpu.data.dataloaders",
    "deephumor.experiments.trainer": "deephumor_tpu.experiments.trainer",
    "deephumor.experiments.metrics": "deephumor_tpu.experiments.metrics",
    "deephumor.experiments.inference": "deephumor_tpu.experiments.inference",
    "deephumor.imaging.caption": "deephumor_tpu.imaging.caption",
    "deephumor.crawlers.crawlers": "deephumor_tpu.crawlers.crawlers",
    "deephumor.crawlers.utils": "deephumor_tpu.crawlers.utils",
    "deephumor.models.encoders": "deephumor_tpu.models.encoders",
    "deephumor.models.rnn_models": "deephumor_tpu.models.lstm",
    "deephumor.models.transformers": "deephumor_tpu.models.transformer",
    "deephumor.models.beam": "deephumor_tpu.models.sampling",
    "deephumor.models.caption_models": "deephumor_tpu.models.caption_models",
}
for _alias, _target in _SUBMODULES.items():
    sys.modules[_alias] = importlib.import_module(_target)
del _alias, _target

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
