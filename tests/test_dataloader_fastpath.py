"""The materialized (native-encoded) loader path must yield byte-identical
batches to the per-item python path."""

import numpy as np
import pytest
from PIL import Image

from deephumor_tpu.data import Vocab, WordPunctTokenizer, CharTokenizer
from deephumor_tpu.data.dataloaders import BatchIterator
from deephumor_tpu.data.datasets import MemeDataset


@pytest.fixture
def data_root(tmp_path):
    root = tmp_path / "memes"
    (root / "images").mkdir(parents=True)
    with open(root / "templates.txt", "w") as f:
        for i in range(2):
            f.write(f"tmpl-{i}\tlink\thttp://x/t{i}.jpg\n")
            Image.new("RGB", (64, 48), (10 * i, 20, 30)).save(
                root / "images" / f"t{i}.jpg"
            )
    with open(root / "captions_train.txt", "w") as f:
        for i in range(6):
            f.write(f"tmpl-{i % 2}\t{i}\thello world {i} <sep> bye now!\n")
    return str(root)


@pytest.mark.parametrize("tok_cls", [WordPunctTokenizer, CharTokenizer])
def test_fast_and_slow_paths_identical(data_root, tok_cls):
    vocab = Vocab(["hello", "world", "bye", "now", "!", "0", "1", "2",
                   "3", "4", "5"] + list("helowrdbyn0123456789! "))
    ds = MemeDataset(data_root, vocab, tok_cls(), split="train")

    fast = list(BatchIterator(ds, 3, max_caption_len=16, max_label_len=6,
                              shuffle=False, fast=True))
    slow = list(BatchIterator(ds, 3, max_caption_len=16, max_label_len=6,
                              shuffle=False, fast=False))
    assert len(fast) == len(slow) == 2
    for fb, sb in zip(fast, slow):
        np.testing.assert_array_equal(fb["captions"], sb["captions"])
        np.testing.assert_array_equal(fb["labels"], sb["labels"])
        np.testing.assert_allclose(fb["images"], sb["images"])
