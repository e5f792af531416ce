"""The ``deephumor`` compatibility package must expose the reference's
import surface (reference deephumor/__init__.py + submodules)."""


def test_reference_style_imports():
    from deephumor.data import (
        SPECIAL_TOKENS,
        CharTokenizer,
        Vocab,
        WordPunctTokenizer,
        build_vocab,
        build_vocab_from_file,
    )
    from deephumor.experiments import seq_to_text, split_caption, text_to_seq
    from deephumor.imaging import memeify_image
    from deephumor.models import (
        CaptioningLSTM,
        CaptioningLSTMWithLabels,
        CaptioningTransformer,
        CaptioningTransformerBase,
    )
    from deephumor.crawlers import MemeGeneratorCrawler

    assert Vocab(["x"]).stoi["<pad>"] == 0
    assert SPECIAL_TOKENS["SEP"] == "<sep>"


def test_top_level_reexports():
    import deephumor

    v = deephumor.build_vocab(["a b a"], deephumor.WordPunctTokenizer(),
                              min_df=1)
    assert "a" in v.stoi


def test_reference_submodule_paths():
    # every ``deephumor.<pkg>.<mod>`` path that exists on the reference
    # (/root/reference/deephumor/*/ — vocab, tokenizers, utils, datasets,
    # dataloaders, trainer, metrics, inference, caption, crawlers,
    # encoders, rnn_models, transformers, beam, caption_models) must be
    # deep-importable here, carrying the matching public symbols.
    from deephumor.data.vocab import SPECIAL_TOKENS, Vocab, build_vocab  # noqa: F401
    from deephumor.data.tokenizers import CharTokenizer, WordPunctTokenizer  # noqa: F401
    from deephumor.data.utils import check_text, clean_text  # noqa: F401
    from deephumor.data.datasets import MemeDataset  # noqa: F401
    from deephumor.data.dataloaders import pad_collate  # noqa: F401
    from deephumor.experiments.trainer import Trainer  # noqa: F401
    from deephumor.experiments.metrics import perplexity  # noqa: F401
    from deephumor.experiments.inference import (  # noqa: F401
        seq_to_text,
        split_caption,
        text_to_seq,
    )
    from deephumor.imaging.caption import memeify_image  # noqa: F401
    from deephumor.crawlers.crawlers import MemeGeneratorCrawler  # noqa: F401
    from deephumor.crawlers.utils import load_image  # noqa: F401
    import deephumor.models.encoders  # noqa: F401
    import deephumor.models.rnn_models  # noqa: F401
    import deephumor.models.transformers  # noqa: F401
    import deephumor.models.beam  # noqa: F401
    import deephumor.models.caption_models  # noqa: F401

    assert Vocab(["x"]).stoi["<unk>"] == 1
    assert clean_text("a!!!!!") == clean_text("a!!!!!")  # callable, pure


def test_reference_layer_class_names():
    # the reference also exports the layer classes
    # (models/__init__.py:17-25) and dataset/collate at the data level
    # (data/__init__.py:6-10); the functional handles must respond
    import jax
    import numpy as np

    from deephumor.data import MemeDataset, pad_collate  # noqa: F401
    from deephumor.models import (
        ImageEncoder,
        ImageLabelEncoder,
        LSTMDecoder,
        SelfAttentionTransformerDecoder,
        TransformerDecoder,
        TransformerEncoder,
    )

    p = ImageEncoder.init(jax.random.PRNGKey(0), emb_dim=16)
    emb = ImageEncoder.apply(
        p, np.zeros((1, 32, 32, 3), np.float32))
    assert emb.shape == (1, 16)

    d = LSTMDecoder.init(jax.random.PRNGKey(1), num_tokens=16, emb_dim=8,
                         hidden_size=8, num_layers=1)
    assert "lstm" in d and "classifier" in d

    t = TransformerDecoder.init(jax.random.PRNGKey(2), num_tokens=16,
                                hid_dim=8, n_layers=1, pf_dim=16,
                                max_len=60)
    assert "layers" in t
