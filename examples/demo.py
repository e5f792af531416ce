"""Interactive-demo equivalent of the reference's ``deephumor_demo.ipynb``.

Walks ALL FOUR architectures (reference notebook cells 13-49): build or
load each model, generate captions for a template image at the notebook's
generation settings, and render the final meme with the packaged font.

Two modes:

  - with checkpoints (the notebook flow — download the 8 published .pth
    files, e.g. via scripts/verify_checkpoints.py, and convert):

        python examples/demo.py --ckpt-dir /tmp/dh_ckpts \
            --vocab-word vocab_words.txt --vocab-char vocab_chars.txt \
            --image cat.jpg --out-dir memes_out

  - without anything (synthetic smoke demo — random weights, tiny vocab;
    shows the full surface offline):

        python examples/demo.py --synthetic
"""

import argparse
import os

# notebook generation defaults (cells 35, 42-49)
WORD_GEN = dict(max_len=32, beam_size=10, top_k=70, temperature=1.0)
CHAR_GEN = dict(max_len=128, beam_size=7, top_k=50, temperature=1.1)

# checkpoint file -> (model_type, tokenizer) — notebook cell 13
ARCHS = [
    ("LSTMDecoder{T}.best.pth", "captioning_lstm"),
    ("LSTMDecoderWithLabels{T}.best.pth", "captioning_lstm_labels"),
    ("TransformerDecoderBase{T}.best.pth", "captioning_transformer_base"),
    ("TransformerDecoder{T}.best.pth", "captioning_transformer"),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--ckpt-dir")
    ap.add_argument("--vocab-word")
    ap.add_argument("--vocab-char")
    ap.add_argument("--image", help="template image (jpg/png)")
    ap.add_argument("--label", default="grumpy cat",
                    help="template label text (labels models)")
    ap.add_argument("--tokenizer", choices=["word", "char", "both"],
                    default="word")
    ap.add_argument("--out-dir", default="demo_out")
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from deephumor_tpu.data import Vocab, WordPunctTokenizer, CharTokenizer
    from deephumor_tpu.experiments.inference import (
        seq_to_text, split_caption, text_to_seq)
    from deephumor_tpu.imaging import memeify_image
    from deephumor_tpu.models import MODEL_REGISTRY
    from deephumor_tpu.ops.image_ops import preprocess_pil

    rng = np.random.default_rng(0)
    if args.image:
        pil = Image.open(args.image).convert("RGB")
    else:
        pil = Image.fromarray(
            rng.integers(0, 255, (300, 400, 3), dtype=np.uint8), "RGB")
    img = jnp.asarray(preprocess_pil(pil))[None]

    os.makedirs(args.out_dir, exist_ok=True)
    tokenizers = (["word", "char"] if args.tokenizer == "both"
                  else [args.tokenizer])

    for tok_kind in tokenizers:
        gen = WORD_GEN if tok_kind == "word" else CHAR_GEN
        suffix = "Words" if tok_kind == "word" else "Chars"
        tokenizer = (WordPunctTokenizer() if tok_kind == "word"
                     else CharTokenizer())

        if args.synthetic:
            vocab = Vocab([f"w{i}" for i in range(500)]
                          if tok_kind == "word"
                          else list("abcdefghijklmnopqrstuvwxyz '!?."))
        else:
            path = (args.vocab_word if tok_kind == "word"
                    else args.vocab_char)
            if not path:
                print(f"[{tok_kind}] no vocab given — skipped")
                continue
            vocab = Vocab.load(path)

        for fname_t, model_type in ARCHS:
            fname = fname_t.format(T=suffix)
            cls = MODEL_REGISTRY[model_type]
            if args.synthetic:
                model = cls(num_tokens=len(vocab), hid_dim=64,
                            n_layers=2, n_heads=4, pf_dim=128,
                            max_len=gen["max_len"] + 2) \
                    if "transformer" in model_type else \
                    cls(num_tokens=len(vocab), emb_dim=32,
                        hidden_size=64, num_layers=2)
                params = model.init(jax.random.PRNGKey(hash(fname) % 2**31))
            else:
                path = os.path.join(args.ckpt_dir or ".", fname)
                if not os.path.exists(path):
                    print(f"[{fname}] not found — skipped")
                    continue
                if path.endswith(".pth"):
                    model, params = cls.from_torch(path)
                else:
                    model, params = cls.from_pretrained(path)

            kwargs = dict(gen)
            kwargs["top_k"] = min(kwargs["top_k"], len(vocab))
            kwargs["beam_size"] = min(kwargs["beam_size"], kwargs["top_k"])
            if model.with_labels:
                ids = text_to_seq(args.label, vocab, tokenizer)  # [1, L]
                out = model.generate(
                    params, img, labels=jnp.asarray(ids),
                    key=jax.random.PRNGKey(1), **kwargs)
            else:
                out = model.generate(params, img,
                                     key=jax.random.PRNGKey(1), **kwargs)
            text = seq_to_text(
                np.asarray(out["chosen"])[0], vocab,
                delimiter=" " if tok_kind == "word" else "")
            top, bottom = split_caption(text, num_blocks=2)
            meme = memeify_image(pil, top=top, bottom=bottom)
            dest = os.path.join(args.out_dir,
                                fname.replace(".pth", "") + ".png")
            meme.save(dest)
            print(f"[{fname}] {text!r}\n  -> {dest}")


if __name__ == "__main__":
    main()
