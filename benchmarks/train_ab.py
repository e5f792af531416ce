"""A/B the train-step levers exposed by the round-3 trace.

benchmarks/train_profile.py showed the 68 ms bf16 step (bs=256, V=29184)
is: ~33% wasted on the pad-to-common-length quirk's 49-position compute
(only 33 carry loss), ~12.5 ms of layout copies, ~3.1 ms materializing
f32 logp for the CE, and threefry dropout RNG fused into (and
rematerialized in the backward of) every big FFN dot, dragging them to
~36 TFLOP/s.

Levers measured here:
  rect    — rectangular=True decoder shapes (T+1 positions, not 49)
  rbg     — jax.random rbg keys for the step rng (hardware RNG for the
            dropout masks instead of threefry)
  both

Run: python -m benchmarks.train_ab [bs]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from deephumor_tpu.experiments.trainer import Trainer
from deephumor_tpu.models import CaptioningTransformer
from deephumor_tpu.models import caption_models

VOCAB, HID, LAYERS, HEADS, PF = 29184, 512, 6, 8, 2048
SEQ = 33
N_TEMPLATES = 300


def build_step(cdt, rectangular):
    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=50)
    trainer = Trainer(model, experiment_title="ab", log_dir="/tmp/dh_ab",
                      donate=False, compute_dtype=cdt)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    trainer._trunk_cache = jnp.asarray(
        rng.normal(size=(N_TEMPLATES, 7, 7, 2048)).astype(np.float32))

    if rectangular:
        orig = CaptioningTransformer.forward

        def fwd(self, *a, **k):
            k.setdefault("rectangular", True)
            return orig(self, *a, **k)

        CaptioningTransformer.forward = fwd
    try:
        trainer._build_steps()
    finally:
        if rectangular:
            CaptioningTransformer.forward = orig
    return trainer._train_step, state


def run(step, state, bs, key):
    rng = np.random.default_rng(0)
    batch = {
        "captions": jnp.asarray(
            rng.integers(6, VOCAB, size=(bs, SEQ)), jnp.int32),
        "image_rows": jnp.asarray(
            rng.integers(0, N_TEMPLATES, size=(bs,)), jnp.int32),
    }
    state, m = step(state, batch, key)
    np.asarray(m["loss"])
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    loss = float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / iters
    return dt, loss


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    for name, rect, rbg in (
        ("base", False, False),
        ("rect", True, False),
        ("rbg", False, True),
        ("rect+rbg", True, True),
    ):
        step, state = build_step("bfloat16", rect)
        key = (jax.random.key(1, impl="rbg") if rbg
               else jax.random.PRNGKey(1))
        dt, loss = run(step, state, bs, key)
        print(f"{name:9s}: {dt*1e3:8.2f} ms/step -> {bs/dt:7.0f} ex/s "
              f"(loss {loss:.4f})")


if __name__ == "__main__":
    main()
