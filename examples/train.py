"""Train a caption model on a memes900k-format dataset.

The reference had no training CLI (training lived in an external Colab
notebook); this is the framework-native equivalent.

Usage:
    python examples/train.py --data-dir memes900k --model captioning_lstm \
        --mode word [--num-classes 200] [--epochs 10] [--batch-size 256] \
        [--min-df 5] [--log-dir logs] [--resume ckpt_prefix] [--mesh]
"""

import argparse


def main():
    parser = argparse.ArgumentParser("deephumor-tpu trainer")
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--model", default="captioning_lstm",
                        choices=["captioning_lstm", "captioning_lstm_labels",
                                 "captioning_transformer_base",
                                 "captioning_transformer"])
    parser.add_argument("--mode", default="word", choices=["word", "char"])
    parser.add_argument("--num-classes", type=int, default=300)
    parser.add_argument("--min-df", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--max-caption-len", type=int, default=None)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--clip-norm", type=float, default=3.0)
    parser.add_argument("--log-dir", default="./logs")
    parser.add_argument("--title", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", help="checkpoint prefix to resume from")
    parser.add_argument("--mesh", action="store_true",
                        help="data-parallel training over all devices")
    args = parser.parse_args()

    import os

    import jax

    from deephumor_tpu.data import (
        CharTokenizer,
        WordPunctTokenizer,
        build_vocab_from_file,
    )
    from deephumor_tpu.data.dataloaders import BatchIterator
    from deephumor_tpu.data.datasets import MemeDataset
    from deephumor_tpu.experiments import Trainer
    from deephumor_tpu.models import MODEL_REGISTRY

    tokenizer = WordPunctTokenizer() if args.mode == "word" else CharTokenizer()
    max_caption_len = args.max_caption_len or (
        32 if args.mode == "word" else 128
    )

    vocab = build_vocab_from_file(
        os.path.join(args.data_dir, "captions_train.txt"), tokenizer,
        min_df=args.min_df,
    )
    print(f"vocab: {len(vocab)} tokens")
    vocab.save(os.path.join(args.data_dir, f"vocab_{args.mode}.txt"))

    datasets = {
        split: MemeDataset(args.data_dir, vocab, tokenizer, split=split,
                           num_classes=args.num_classes)
        for split in ("train", "val")
    }
    loaders = {
        split: BatchIterator(ds, args.batch_size,
                             max_caption_len=max_caption_len,
                             seed=args.seed)
        for split, ds in datasets.items()
    }
    print({s: f"{len(ds)} captions" for s, ds in datasets.items()})

    model = MODEL_REGISTRY[args.model](num_tokens=len(vocab))
    trainer = Trainer(
        model, args.title or f"{args.model}-{args.mode}",
        log_dir=args.log_dir, learning_rate=args.learning_rate,
        clip_norm=args.clip_norm, donate=True,
    )

    mesh = None
    if args.mesh:
        from deephumor_tpu.parallel import make_mesh, replicate

        mesh = make_mesh(model=1)
        print(f"mesh: {dict(mesh.shape)}")

    if args.resume:
        state = trainer.restore_checkpoint(args.resume)
        print(f"resumed from {args.resume} at step {int(state['step'])}")
    else:
        state = trainer.init_state(jax.random.PRNGKey(args.seed))
    if mesh is not None:
        from deephumor_tpu.parallel import replicate

        state = {
            "params": replicate(state["params"], mesh),
            "opt_state": replicate(state["opt_state"], mesh),
            "step": state["step"],
        }

    state, history = trainer.train(
        state, loaders, n_epochs=args.epochs,
        rng=jax.random.PRNGKey(args.seed + 1), mesh=mesh,
    )
    trainer.close()
    print(f"artifacts in {trainer.experiment_dir}")


if __name__ == "__main__":
    main()
