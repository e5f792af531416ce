"""End-to-end epoch throughput: can the host FEED the tuned train step?

VERDICT r3 #3: the device-only tuned step measures ~6.8k ex/s
(bench.py train_tuned, synthetic pre-staged batch), and the host legs
were benchmarked in isolation (materialize ~740k ex/s, image_rows
iteration ~2.3M ex/s — STATUS r2 s4), but nothing ever measured the
COMPOSED path: disk dataset -> BatchIterator fast path (C++ batch
tokenizer) + trunk-cache rows -> Trainer.run_epoch dispatching the
jitted step per batch. This benchmark builds a memes900k-shaped
synthetic dataset on disk at the bench config (V=29184 word vocab,
bs=256, bf16 + rectangular + rbg) and times real epochs end to end.

Reference counterpart: data/dataloaders.py:5-15 + trainer.py:61-66 (the
per-batch tokenize/pad/.to(device) host path this replaces).

Run:  python -m benchmarks.epoch_bench [n_captions]
      DH_EPOCH_SMOKE=1 python -m benchmarks.epoch_bench   # tiny CPU run
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

SMOKE = os.environ.get("DH_EPOCH_SMOKE") == "1"
if SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")


def build_dataset(root, n_captions, n_templates, n_words, seed=0):
    """memes900k-shaped files: templates.txt + images/ + captions TSV."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    with open(os.path.join(root, "templates.txt"), "w") as f:
        for i in range(n_templates):
            f.write(f"tmpl-{i}\tlink\thttp://x/t{i}.jpg\n")
            Image.fromarray(
                rng.integers(0, 255, (224, 224, 3), dtype=np.uint8),
                "RGB").save(os.path.join(root, "images", f"t{i}.jpg"))
    # caption lengths like memes900k (filtered <=31 tokens, mean low
    # teens); words drawn from the synthetic vocab
    with open(os.path.join(root, "captions_train.txt"), "w") as f:
        for i in range(n_captions):
            ln = int(rng.integers(6, 20))
            words = [f"w{int(w)}" for w in rng.integers(0, n_words, ln)]
            half = max(1, ln // 2)
            cap = " ".join(words[:half]) + " <sep> " + " ".join(words[half:])
            f.write(f"tmpl-{int(rng.integers(0, n_templates))}\t{i}\t{cap}\n")


def run(n_captions, n_templates=300, n_words=29_000, vocab_n=29184,
        hid=512, layers=6, heads=8, pf=2048, bs=256, epochs=3,
        smoke=False, synth_trunk=False):
    """Builds the on-disk dataset, runs ``epochs`` real epochs through
    BatchIterator + Trainer.run_epoch, returns the result dict.

    ``synth_trunk=True`` fills the trunk feature cache with random rows
    instead of running the frozen ResNet over every template — the
    trunk encode is one-time setup (~2 min for 300 real templates) and
    irrelevant to the epoch-loop rate this measures; used by bench.py.
    """
    import jax
    import jax.numpy as jnp

    from deephumor_tpu.data import Vocab, WordPunctTokenizer
    from deephumor_tpu.data.dataloaders import BatchIterator
    from deephumor_tpu.data.datasets import MemeDataset
    from deephumor_tpu.experiments.trainer import Trainer
    from deephumor_tpu.models import CaptioningTransformer

    root = tempfile.mkdtemp(prefix="dh_epoch_")
    try:
        t0 = time.perf_counter()
        build_dataset(root, n_captions, n_templates, n_words)
        t_build = time.perf_counter() - t0

        vocab = Vocab([f"w{i}" for i in range(vocab_n - 6)])
        tok = WordPunctTokenizer()
        t0 = time.perf_counter()
        ds = MemeDataset(root, vocab, tok, split="train",
                         num_classes=n_templates)
        t_ds = time.perf_counter() - t0

        model = CaptioningTransformer(
            num_tokens=vocab_n, hid_dim=hid, n_layers=layers,
            n_heads=heads, pf_dim=pf, max_len=50)
        trainer = Trainer(model, "epoch_bench", log_dir="/tmp/dh_epoch_logs",
                          donate=False,
                          compute_dtype=None if smoke else "bfloat16",
                          rectangular=not smoke,
                          rng_impl=None if smoke else "rbg")
        state = trainer.init_state(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        if synth_trunk:
            feat_rng = np.random.default_rng(7)
            keys = list(ds.images.keys())
            trainer._trunk_cache = jnp.asarray(feat_rng.normal(
                size=(len(keys), 7, 7, 2048)).astype(np.float32))
            trainer._train_step = trainer._eval_step = None
            rows_map = {k: i for i, k in enumerate(keys)}
        else:
            rows_map = trainer.build_trunk_cache(state["params"], ds)
        t_trunk = time.perf_counter() - t0
        t0 = time.perf_counter()
        loader = BatchIterator(ds, bs, max_caption_len=32,
                               image_rows=rows_map, seed=0)
        t_mat = time.perf_counter() - t0  # materialize (C++ tokenizer)

        n_steps = len(ds) // bs
        n_ex = n_steps * bs
        # epoch 0 pays the step compile; report warm epochs
        rates = []
        for e in range(epochs):
            t0 = time.perf_counter()
            state, loss, pp = trainer.run_epoch(
                state, loader, jax.random.PRNGKey(e), phase="train",
                epoch=e)
            jax.block_until_ready(state["params"])
            dt = time.perf_counter() - t0
            rates.append(n_ex / dt)
            print(f"epoch {e}: {dt:.2f} s, {n_ex/dt:.1f} ex/s "
                  f"(loss {loss:.3f})")
        trainer.close()

        out = {
            "epoch_examples_s": round(max(rates[1:]) if len(rates) > 1
                                      else rates[0], 1),
            "epoch_examples_s_all": [round(r, 1) for r in rates],
            "n_examples_per_epoch": n_ex,
            "n_steps": n_steps,
            "batch_size": bs,
            "setup_s": {"dataset_parse": round(t_ds, 2),
                        "trunk_cache": round(t_trunk, 2),
                        "materialize": round(t_mat, 2),
                        "synthetic_files": round(t_build, 2)},
        }
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    if SMOKE:
        out = run(600, n_templates=4, n_words=500, vocab_n=512, hid=64,
                  layers=2, heads=4, pf=128, bs=64, epochs=2, smoke=True)
    else:
        n_captions = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
        out = run(n_captions)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
