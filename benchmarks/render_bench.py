"""Host-side meme-render throughput: the three scenarios STATUS cites.

Rendering is the binding constraint of the end-to-end product path on
few-core hosts (generation is ~2830 capt/s/chip; see bench.py), so its
throughput is tracked per scenario:

  - corpus:  repeated-word captions on one image size — the converged
             regime of a real caption distribution (memes900k-style
             vocabulary reuse; word-raster/aggregate caches hit).
  - e2e:     the driver bench's end-to-end leg — synthetic ``wNNNNN``
             vocab words (worst case for word memoization; glyph and
             interval caches still converge), image 300x400.
  - varied:  distinct captions on a 600x450 canvas, wider word mix —
             stresses the font-fit descent across sizes and the
             measurer/composer cache-eviction behavior.

Run: python -m benchmarks.render_bench   (pure host work, no device)

Reference counterpart: none — the reference renders one meme at a time
via PIL with FreeType stroke borders (~85/s here; imaging/caption.py
documents each replacement lever).
"""

import random
import time

import numpy as np
from PIL import Image


def _measure(make_caption, img, n_warm=300, n=300):
    for _ in range(n_warm):
        top, bottom = make_caption()
        memeify_image(img, top=top, bottom=bottom)
    t0 = time.perf_counter()
    for _ in range(n):
        top, bottom = make_caption()
        memeify_image(img, top=top, bottom=bottom)
    return n / (time.perf_counter() - t0)


if __name__ == "__main__":
    from deephumor_tpu.imaging import memeify_image

    rng = np.random.default_rng(0)
    random.seed(0)

    corpus_img = Image.fromarray(
        rng.integers(0, 255, (300, 400, 3), dtype=np.uint8), "RGB")
    corpus_vocab = ["WHEN", "YOU", "SEE", "THE", "MEME", "CAT", "DOG",
                    "WHY", "NOT", "LOL", "BUT", "THEN", "FIRST", "TIME",
                    "MONDAY", "CATS", "EVERY", "NOBODY", "LITERALLY", "ME"]

    def corpus_cap():
        k = random.randint(3, 8)
        return (" ".join(random.choices(corpus_vocab, k=k)),
                " ".join(random.choices(corpus_vocab, k=k)))

    def e2e_cap():
        n = random.randint(8, 18)
        return " ".join(f"w{random.randrange(29178)}" for _ in range(n)), ""

    varied_img = Image.new("RGB", (600, 450), (120, 140, 90))

    def varied_cap():
        k = random.randint(2, 6)
        return (" ".join(random.choices(corpus_vocab, k=k)),
                " ".join(random.choices(corpus_vocab, k=k)))

    print(f"corpus renders/s: {_measure(corpus_cap, corpus_img):.1f}")
    print(f"e2e    renders/s: {_measure(e2e_cap, corpus_img):.1f}")
    print(f"varied renders/s: {_measure(varied_cap, varied_img):.1f}")
