"""Trace the jitted train step on hardware and aggregate op self-times.

The train-step wall analysis (STATUS round 3): the bf16 step at the word
config (V=29184, bs=256) is dominated by the f32 loss softmax over
[8448, 29184] logits plus LN-backward glue and layout copies from the
pad-to-common-length quirk. This script produces the op-family breakdown
that justifies (or kills) the fused linear+cross-entropy lever: a loss
that never materializes the [N, V] logits in HBM.

Run: python -m benchmarks.train_profile [outdir] [bf16|f32|tuned] [bs]
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.word_profile import aggregate as aggregate_trace

VOCAB, HID, LAYERS, HEADS, PF = 29184, 512, 6, 8, 2048
SEQ = 33
N_TEMPLATES = 300


def main():
    args = sys.argv[1:]
    outdir = args[0] if args else "/tmp/train_profile"
    mode = args[1] if len(args) > 1 else "bf16"
    cdt = None if mode == "f32" else "bfloat16"
    tuned = mode == "tuned"  # bf16 + rectangular + hardware-RNG dropout
    bs = int(args[2]) if len(args) > 2 else 256
    os.makedirs(outdir, exist_ok=True)

    from deephumor_tpu.experiments.trainer import Trainer
    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=50)
    trainer = Trainer(model, experiment_title="profile",
                      log_dir="/tmp/dh_profile_logs", donate=False,
                      compute_dtype=cdt, rectangular=tuned,
                      rng_impl="rbg" if tuned else None)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    trainer._trunk_cache = jnp.asarray(
        rng.normal(size=(N_TEMPLATES, 7, 7, 2048)).astype(np.float32))
    trainer._build_steps()
    step = trainer._train_step

    batch = {
        "captions": jnp.asarray(
            rng.integers(6, VOCAB, size=(bs, SEQ)), jnp.int32),
        "image_rows": jnp.asarray(
            rng.integers(0, N_TEMPLATES, size=(bs,)), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key)
    np.asarray(m["loss"])

    ITERS = 10
    import time
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"mode={mode} bs={bs}: {dt*1e3:.2f} ms/step "
          f"-> {bs/dt:.0f} examples/s")

    with jax.profiler.trace(outdir):
        for i in range(ITERS):
            state, m = step(state, batch, jax.random.fold_in(key, 100 + i))
        np.asarray(m["loss"])
    aggregate_trace(outdir, steps=ITERS, top=40)

    if os.environ.get("DH_DUMP_HLO") == "1":
        # map hot trace names (fusion.N) back to what they compute
        txt = step.lower(state, batch, key).compile().as_text()
        path = os.path.join(outdir, "train_step.hlo.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"compiled HLO -> {path}")


if __name__ == "__main__":
    main()
