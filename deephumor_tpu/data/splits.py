"""Train/val/test splitting of crawled captions.

Behavior parity with the reference splitter (/root/reference/split_data.py:
7-45): group captions.txt by template, shuffle per template, write
captions_{train,val,test}.txt (2500/250/250 defaults), each split keeping
original file order. Fixed divergence: ``random_state`` is honored (the
reference hardcodes seed 0 and ignores its own flag, split_data.py:14-19);
the default 0 reproduces the reference split.
"""

import os
from collections import defaultdict

import numpy as np

__all__ = ["split_captions"]


def split_captions(data_dir, splits=(2500, 250, 250), random_state=0):
    np.random.seed(random_state)
    start_ids = np.cumsum([0] + list(splits))
    end_ids = start_ids[1:]

    captions = defaultdict(list)
    with open(os.path.join(data_dir, "captions.txt")) as f:
        for line in f:
            label = line.split("\t", 1)[0]
            captions[label].append(line)

    names = ["train", "val", "test"]
    files = [
        open(os.path.join(data_dir, f"captions_{name}.txt"), "w")
        for name in names
    ]
    try:
        for label, lines in captions.items():
            indices = np.arange(len(lines))
            np.random.shuffle(indices)
            for i, f in enumerate(files):
                for idx in sorted(indices[start_ids[i]:end_ids[i]]):
                    f.write(lines[idx])
    finally:
        for f in files:
            f.close()
