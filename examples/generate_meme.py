"""Generate a meme from an image — the CLI equivalent of the reference's
Colab demo (deephumor_demo.ipynb cell 35 ``get_a_meme``).

Usage:
    python examples/generate_meme.py \
        --checkpoint model.npz --vocab vocab.txt --image template.jpg \
        --out meme.png [--torch-checkpoint model.pth --model-type ...] \
        [--caption "starting text"] [--mode word|char] \
        [--beam-size 10] [--top-k 70] [--temperature 1.0]
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser("deephumor-tpu meme generator")
    parser.add_argument("--image", required=True)
    parser.add_argument("--vocab", required=True)
    parser.add_argument("--out", default="meme.png")
    parser.add_argument("--checkpoint", help="native .npz checkpoint")
    parser.add_argument("--torch-checkpoint", help="reference .pth checkpoint")
    parser.add_argument("--model-type", default="captioning_transformer",
                        choices=["captioning_lstm", "captioning_lstm_labels",
                                 "captioning_transformer_base",
                                 "captioning_transformer"])
    parser.add_argument("--label", help="template label text (labels model)")
    parser.add_argument("--caption", help="beginning of the caption")
    parser.add_argument("--mode", default="word", choices=["word", "char"])
    parser.add_argument("--max-len", type=int, default=None)
    parser.add_argument("--beam-size", type=int, default=10)
    parser.add_argument("--top-k", type=int, default=70)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--greedy", action="store_true")
    parser.add_argument("--font", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from deephumor_tpu.data import (
        CharTokenizer,
        Vocab,
        WordPunctTokenizer,
    )
    from deephumor_tpu.experiments import seq_to_text, split_caption, text_to_seq
    from deephumor_tpu.imaging import memeify_image
    from deephumor_tpu.models import MODEL_REGISTRY
    from deephumor_tpu.ops import preprocess_pil

    model_cls = MODEL_REGISTRY[args.model_type]
    if args.torch_checkpoint:
        model, params = model_cls.from_torch(args.torch_checkpoint)
    elif args.checkpoint:
        model, params = model_cls.from_pretrained(args.checkpoint)
    else:
        raise SystemExit("pass --checkpoint or --torch-checkpoint")

    vocab = Vocab.load(args.vocab)
    tokenizer = WordPunctTokenizer() if args.mode == "word" else CharTokenizer()
    delimiter = " " if args.mode == "word" else ""
    # demo defaults: word max_len=32, char max_len=128 (notebook cell 35)
    max_len = args.max_len or (32 if args.mode == "word" else 128)

    pil_img = Image.open(args.image).convert("RGB")
    x = jnp.asarray(preprocess_pil(pil_img))[None]

    caption = None
    if args.caption:
        caption = jnp.asarray(text_to_seq(args.caption, vocab, tokenizer))

    kwargs = dict(
        key=jax.random.PRNGKey(args.seed), caption=caption, max_len=max_len,
        beam_size=args.beam_size, top_k=args.top_k,
        temperature=args.temperature, greedy=args.greedy,
    )
    if args.model_type == "captioning_lstm_labels":
        if not args.label:
            raise SystemExit("--label is required for the labels model")
        labels = jnp.asarray(text_to_seq(args.label, vocab, tokenizer))
        result = model.generate(params, x, labels=labels, **kwargs)
    else:
        result = model.generate(params, x, **kwargs)

    text = seq_to_text(
        np.asarray(result["chosen"][0]), vocab, delimiter=delimiter
    )
    top, bottom = split_caption(text, num_blocks=2)
    print(f"caption: {text!r}")
    print(f"top: {top!r}  bottom: {bottom!r}")

    meme = memeify_image(pil_img, top=top, bottom=bottom,
                         font_path=args.font)
    meme.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
