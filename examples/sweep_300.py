"""The BASELINE.json config-5 product path at full scale: a 300-template
sweep — encode every template once, generate N captions per template with
batched beam search, render memes on a host thread pool.

With --synthetic it runs without a dataset (random templates + random
weights) and prints throughput, which is how the serving numbers in
STATUS.md were produced.

Usage:
    python examples/sweep_300.py --synthetic --captions-per-template 10
    python examples/sweep_300.py --data-dir memes900k --checkpoint m.npz \
        --vocab vocab.txt --out-dir memes_out
"""

import argparse
import time


def main():
    parser = argparse.ArgumentParser("300-template meme sweep")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--data-dir")
    parser.add_argument("--checkpoint")
    parser.add_argument("--vocab")
    parser.add_argument("--out-dir")
    parser.add_argument("--num-templates", type=int, default=300)
    parser.add_argument("--captions-per-template", type=int, default=10)
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--max-len", type=int, default=32)
    parser.add_argument("--top-k", type=int, default=64)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--render", action="store_true",
                        help="also render PNG memes (synthetic mode)")
    parser.add_argument("--render-procs", type=int, default=0,
                        help="render in N spawn processes instead of "
                             "threads (threads overlap with the device "
                             "but FreeType holds the GIL — processes "
                             "scale rendering across host cores)")
    args = parser.parse_args()

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from deephumor_tpu.data import Vocab
    from deephumor_tpu.pipeline import MemeGenerationPipeline
    from deephumor_tpu.models import MODEL_REGISTRY, CaptioningTransformer

    rng = np.random.default_rng(0)

    if args.synthetic:
        words = [f"w{i}" for i in range(2000)]
        vocab = Vocab(words)
        model = CaptioningTransformer(
            num_tokens=len(vocab), hid_dim=512, n_layers=6, n_heads=8,
            pf_dim=2048, max_len=args.max_len + 2,
            compute_dtype="bfloat16",
        )
        params = model.init(jax.random.PRNGKey(0))
        templates = {
            f"tmpl{i}": rng.normal(size=(224, 224, 3)).astype(np.float32)
            for i in range(args.num_templates)
        }
        pils = {
            tid: Image.fromarray(
                rng.integers(0, 255, (300, 400, 3), dtype=np.uint8), "RGB"
            )
            for tid in templates
        } if args.render else {}
    else:
        if not (args.data_dir and args.checkpoint and args.vocab):
            raise SystemExit("need --data-dir, --checkpoint, --vocab")
        from deephumor_tpu.data.datasets import MemeDataset

        vocab = Vocab.load(args.vocab)
        model, params = MODEL_REGISTRY["captioning_transformer"].from_pretrained(
            args.checkpoint
        )
        ds = MemeDataset(args.data_dir, vocab,
                         num_classes=args.num_templates, split="train")
        templates = ds.images
        pils = {
            tid: Image.open(ds.templates[tid]) for tid in templates
        }

    pipe = MemeGenerationPipeline(
        model, params, vocab,
        render_processes=args.render_procs)

    t0 = time.perf_counter()
    ids = list(templates)
    pipe.add_templates(
        ids, np.stack([templates[t] for t in ids]),
        pil_images=[pils[t] for t in ids] if pils else None,
    )
    t_encode = time.perf_counter() - t0
    print(f"encoded {len(ids)} templates in {t_encode:.2f}s")

    # generate captions-per-template for every template, batched
    work = [tid for tid in ids for _ in range(args.captions_per_template)]
    total = len(work)
    outputs = []
    t0 = time.perf_counter()
    t_first = None
    gen = dict(max_len=args.max_len, beam_size=args.beam_size,
               top_k=args.top_k, sampler="pallas")
    if pils:
        # rendering of each batch overlaps the next batch's generation
        outputs = pipe.generate_memes_batched(
            work, batch_size=args.batch, key=jax.random.PRNGKey(1), **gen
        )
        t_first = time.perf_counter() - t0
    else:
        for start in range(0, total, args.batch):
            chunk = work[start : start + args.batch]
            key = jax.random.fold_in(jax.random.PRNGKey(1), start)
            outputs += [
                (tid, text, None)
                for tid, text in zip(
                    chunk,
                    pipe.generate_captions(chunk, key=key,
                                           pad_to=args.batch, **gen),
                )
            ]
            if t_first is None:
                t_first = time.perf_counter() - t0
    dt = time.perf_counter() - t0
    print(
        f"{total} captions over {len(ids)} templates in {dt:.2f}s "
        f"-> {total / dt:.0f} captions/s"
        + (" (incl. rendering)" if pils else "")
    )
    steady = total - min(args.batch, total)
    if steady > 0 and dt - t_first > 0.5:
        # the first call carries the one-off jit compile of the decode
        # loop; the steady-state rate is what a serving deployment sees
        print(
            f"  first call (incl. compile) {t_first:.2f}s; steady state "
            f"{steady / (dt - t_first):.0f} captions/s"
        )
    for tid, text, _ in outputs[:3]:
        print(f"  {tid}: {text[:70]!r}")

    if args.out_dir and pils:
        import os

        os.makedirs(args.out_dir, exist_ok=True)
        for i, (tid, _, img) in enumerate(outputs[: len(ids)]):
            if img is not None:
                img.save(os.path.join(args.out_dir, f"{tid}_{i}.png"))
        print(f"wrote renders to {args.out_dir}")


if __name__ == "__main__":
    main()
