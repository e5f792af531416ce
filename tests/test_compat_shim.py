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
