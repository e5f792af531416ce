"""Static-shape batching.

Replaces the reference's ``pad_collate`` + torch DataLoader
(/root/reference/deephumor/data/dataloaders.py:5-15), which pads each batch
to its own longest sequence — a dynamic shape per batch. Under XLA every
distinct shape is a new compilation, so batches here are padded to a FIXED
``max_len`` (and the final short batch is dropped or padded to full batch
size): one shape -> one compiled step for the whole epoch.
"""

import numpy as np

__all__ = ["pad_collate", "BatchIterator"]


def pad_ids(seqs, length, pad_value=0):
    """[n, length] int32 matrix: each sequence truncated to ``length``
    and padded with ``pad_value`` (the one pad-and-truncate used by the
    collator and the dataset fast path — keep them in lockstep)."""
    out = np.full((len(seqs), length), pad_value, np.int32)
    for i, s in enumerate(seqs):
        s = s[:length]
        out[i, : len(s)] = s
    return out


def pad_collate(batch, max_caption_len=None, max_label_len=None,
                pad_value=0):
    """Collates (label_ids, caption_ids, image) triples into fixed-shape
    numpy arrays. Without explicit lengths, pads to the batch max (the
    reference behavior); fixed lengths give static XLA shapes."""
    labels, captions, images = zip(*batch)
    lab_len = max_label_len or max(len(l) for l in labels)
    cap_len = max_caption_len or max(len(c) for c in captions)

    return {
        "labels": pad_ids(labels, lab_len, pad_value),
        "captions": pad_ids(captions, cap_len, pad_value),
        "images": np.stack(images).astype(np.float32),
    }


class BatchIterator:
    """Shuffling epoch iterator yielding fixed-shape dict batches.

    Args:
        dataset: a MemeDataset (or any indexable of triples).
        batch_size: fixed batch size; a trailing partial batch is dropped
            when ``drop_last`` (default True — keeps one XLA shape).
        max_caption_len / max_label_len: fixed pad lengths.
        seed: shuffle seed; reshuffles each epoch deterministically.
    """

    def __init__(self, dataset, batch_size, max_caption_len=32,
                 max_label_len=8, shuffle=True, seed=0, drop_last=True,
                 fast=True, image_rows=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_caption_len = max_caption_len
        self.max_label_len = max_label_len
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # trunk-feature-cache mode: image_rows maps template key -> row in
        # a precomputed feature store (Trainer.build_trunk_cache); batches
        # then carry int32 "image_rows" instead of image pixels — no
        # per-batch 224x224 host stacking at all
        self.image_rows = image_rows
        self._epoch = 0
        # fast path: whole-split pre-encoded id matrices (native batch
        # tokenizer) + image lookups, instead of per-item tokenization
        self._mat = None
        if (
            fast
            and hasattr(dataset, "materialize")
            and getattr(dataset, "preload_images", False)
        ):
            self._mat = dataset.materialize(max_caption_len, max_label_len)
        elif image_rows is not None:
            # image_rows (the trunk-feature-cache mode) only flows through
            # the materialized fast path; silently yielding full images
            # instead would erase the ~16x trunk-cache speedup the caller
            # asked for
            raise ValueError(
                "image_rows requires the fast path (fast=True and a "
                "dataset with materialize() + preload_images)"
            )

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1

        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            n_real = len(idx)
            if not self.drop_last and n_real < self.batch_size:
                # keep ONE compiled batch shape by repeating the last
                # example; "row_valid" marks the real rows so the Trainer
                # excludes the duplicates from loss/metrics exactly
                idx = np.concatenate(
                    [idx, np.repeat(idx[-1], self.batch_size - n_real)]
                )
            if self._mat is not None:
                keys = self._mat["image_keys"]
                batch = {
                    "labels": self._mat["labels"][idx],
                    "captions": self._mat["captions"][idx],
                }
                if self.image_rows is not None:
                    batch["image_rows"] = np.asarray(
                        [self.image_rows[keys[int(i)]] for i in idx],
                        np.int32,
                    )
                else:
                    batch["images"] = np.stack(
                        [self.dataset.images[keys[int(i)]] for i in idx]
                    ).astype(np.float32)
                if n_real < len(idx):
                    batch["row_valid"] = np.arange(len(idx)) < n_real
                yield batch
            else:
                batch = [self.dataset[int(i)] for i in idx]
                batch = pad_collate(
                    batch, self.max_caption_len, self.max_label_len
                )
                if n_real < len(idx):
                    batch["row_valid"] = np.arange(len(idx)) < n_real
                yield batch
