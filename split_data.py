"""Train/val/test splitter for the crawled captions.

Behavior parity with the reference (/root/reference/split_data.py:7-45):
groups captions.txt by template label, shuffles per template, writes
captions_{train,val,test}.txt with 2500/250/250 defaults, keeping each
split's lines in original file order.

Fixed divergence (documented): the reference hardcodes ``np.random.seed(0)``
and ignores its own ``--random-state`` flag (split_data.py:14-19); here the
flag is honored (default 0 keeps the reference's deterministic split).
"""

import argparse
import os
from collections import defaultdict

import numpy as np


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


def main():
    parser = argparse.ArgumentParser("Meme dataset split")
    parser.add_argument("--data-dir", "-d", required=True, type=str,
                        help="directory with the dataset")
    parser.add_argument("--splits", type=int, default=(2500, 250, 250),
                        nargs=3,
                        help="train/val/test sizes per template")
    parser.add_argument("--random-state", type=int, default=0,
                        help="random seed for the data shuffling")
    args = parser.parse_args()
    split_captions(args.data_dir, tuple(args.splits), args.random_state)


if __name__ == "__main__":
    main()
