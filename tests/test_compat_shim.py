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
