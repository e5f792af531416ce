"""MemeDataset: the memes900k on-disk format.

Behavioral contract matches the reference dataset
(/root/reference/deephumor/data/datasets.py:11-103):

- ``templates.txt``: ``label\\tlink\\turl`` lines; the image filename is the
  URL tail, under ``<root>/images/``,
- ``captions_{split}.txt``: ``label\\tscore\\tcaption`` lines, filtered to
  loaded templates,
- ``num_classes`` truncates the template list,
- text preprocessing: lowercase -> tokenize -> UNK-replace -> append EOS ->
  ids (datasets.py:71-84; note the dataset path appends EOS, the inference
  path does not),
- items are ``(label_ids, caption_ids, image)``.

TPU-first difference: instead of torch Dataset/DataLoader with dynamic
``pad_sequence`` shapes, batches come from :class:`BatchIterator`
(deephumor_tpu/data/dataloaders.py) padded to a fixed ``max_len`` — XLA
requires static shapes, and one shape means one compiled train step.
Images are preprocessed once at load (PIL path, parity with the notebook's
torchvision transform) and cached as float32 NHWC arrays per template.
"""

import os

import numpy as np

from deephumor_tpu.data.tokenizers import WordPunctTokenizer
from deephumor_tpu.data.vocab import SPECIAL_TOKENS

__all__ = ["MemeDataset"]


class MemeDataset:
    """Indexable dataset of (label_ids, caption_ids, template_image)."""

    def __init__(self, root, vocab, tokenizer=None, split="train",
                 num_classes=300, image_transform=None, preload_images=True):
        if split not in ("train", "val", "test"):
            raise ValueError(f"incorrect data split: {split}")
        self.root = root
        self.split = split
        self.vocab = vocab
        self.tokenizer = tokenizer or WordPunctTokenizer()
        self.num_classes = num_classes
        if image_transform is None:
            from deephumor_tpu.ops.image_ops import preprocess_pil

            image_transform = preprocess_pil
        self.image_transform = image_transform
        self.preload_images = preload_images
        self._load()

    def _load(self):
        fn_temp = os.path.join(self.root, "templates.txt")
        if not os.path.exists(fn_temp):
            raise FileNotFoundError(f"Templates file {fn_temp} is not found")
        dir_imgs = os.path.join(self.root, "images")
        if not os.path.isdir(dir_imgs):
            raise FileNotFoundError(
                f"Images directory {dir_imgs} is not found"
            )

        self.templates = {}
        self.images = {}
        with open(fn_temp) as f:
            for line in f:
                label, _, url = line.strip().split("\t")
                filename = url.split("/")[-1]
                path = os.path.join(dir_imgs, filename)
                self.templates[label] = path
                if self.preload_images:
                    self.images[label] = self._load_image(path)
                if len(self.templates) == self.num_classes:
                    break

        fn_capt = os.path.join(self.root, f"captions_{self.split}.txt")
        if not os.path.exists(fn_capt):
            raise FileNotFoundError(f"Captions file {fn_capt} is not found")
        self.captions = []
        with open(fn_capt) as f:
            for line in f:
                label, _, caption = line.strip().split("\t")
                if label in self.templates:
                    self.captions.append((label, caption))

    def _load_image(self, path):
        from PIL import Image

        with Image.open(path) as img:
            return np.asarray(self.image_transform(img))

    def _preprocess_text(self, text):
        """lowercase -> tokenize -> UNK -> +EOS -> ids
        (parity: datasets.py:71-84)."""
        unk = SPECIAL_TOKENS["UNK"]
        tokens = [
            tok if tok in self.vocab.stoi else unk
            for tok in self.tokenizer.tokenize(text.lower())
        ]
        tokens.append(SPECIAL_TOKENS["EOS"])
        return [self.vocab.stoi[tok] for tok in tokens]

    def __getitem__(self, idx):
        label, caption = self.captions[idx]
        image = (
            self.images[label]
            if self.preload_images
            else self._load_image(self.templates[label])
        )
        return (
            np.asarray(self._preprocess_text(label), np.int32),
            np.asarray(self._preprocess_text(caption), np.int32),
            image,
        )

    def __len__(self):
        return len(self.captions)

    # -- bulk encoding (native-accelerated fast path) -----------------------
    def _tokenizer_mode(self):
        from deephumor_tpu.data.tokenizers import (
            CharTokenizer,
            WordPunctTokenizer,
        )

        if type(self.tokenizer) is WordPunctTokenizer:
            return "word"
        if type(self.tokenizer) is CharTokenizer:
            return "char"
        return None

    def materialize(self, max_caption_len, max_label_len):
        """Pre-encodes the whole split into padded id matrices ONCE
        (C++ batch tokenizer when available) instead of re-tokenizing
        per item per epoch. Returns
        ``{captions [N, C], labels [N, L], image_keys [N]}``; cached.
        """
        key = (max_caption_len, max_label_len)
        cached = getattr(self, "_materialized", None)
        if cached is not None and cached[0] == key:
            return cached[1]

        mode = self._tokenizer_mode()
        caption_texts = [c for _, c in self.captions]
        image_keys = [l for l, _ in self.captions]
        unique_labels = list(self.templates.keys())

        if mode is not None:
            from deephumor_tpu.native import encode_batch

            cap_ids, _ = encode_batch(
                caption_texts, self.vocab, mode, max_caption_len
            )
            lab_ids, _ = encode_batch(
                unique_labels, self.vocab, mode, max_label_len
            )
        else:  # custom tokenizer: exact per-item python path
            from deephumor_tpu.data.dataloaders import pad_ids

            cap_ids = pad_ids(
                [self._preprocess_text(t) for t in caption_texts],
                max_caption_len,
            )
            lab_ids = pad_ids(
                [self._preprocess_text(t) for t in unique_labels],
                max_label_len,
            )

        label_row = {l: i for i, l in enumerate(unique_labels)}
        labels = lab_ids[[label_row[l] for l in image_keys]]
        result = {
            "captions": cap_ids,
            "labels": labels,
            "image_keys": image_keys,
        }
        self._materialized = (key, result)
        return result
