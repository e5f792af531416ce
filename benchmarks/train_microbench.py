"""Training-throughput microbenchmark: trunk-cached CaptioningTransformer.

Measures the jitted train step (forward+backward+optax update) on synthetic
batches at the word-model config, sweeping batch size, with the trunk
feature cache (the serving-style amortization shipped in round 2).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from deephumor_tpu.models import CaptioningTransformer
from deephumor_tpu.experiments.trainer import Trainer

VOCAB, HID, LAYERS, HEADS, PF = 8192, 512, 6, 8, 2048
SEQ = 33  # captions incl. EOS (word config filters to <=31 tokens + eos)
N_TEMPLATES = 300


def main():
    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=49 + 1,  # pad-to-common-length quirk needs >= 49 (encoder grid)
    )
    import sys
    cdt = sys.argv[1] if len(sys.argv) > 1 else None
    trainer = Trainer(model, experiment_title="bench", log_dir="/tmp/dhlogs",
                      donate=False, compute_dtype=cdt)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    # synthetic trunk cache (300 templates x 7x7x2048 NHWC trunk features)
    trainer._trunk_cache = jnp.asarray(
        rng.normal(size=(N_TEMPLATES, 7, 7, 2048)).astype(np.float32))
    trainer._build_steps()
    step = trainer._train_step

    for bs in (32, 64, 128, 256, 512):
        batch = {
            "captions": jnp.asarray(
                rng.integers(6, VOCAB, size=(bs, SEQ)), jnp.int32),
            "image_rows": jnp.asarray(
                rng.integers(0, N_TEMPLATES, size=(bs,)), jnp.int32),
        }
        key = jax.random.PRNGKey(1)
        st = jax.tree.map(lambda x: x, state)
        st, m = step(st, batch, key)
        np.asarray(m["loss"])
        iters = 30
        t0 = time.perf_counter()
        for i in range(iters):
            st, m = step(st, batch, jax.random.fold_in(key, i))
        np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"bs={bs:4d}: {dt*1e3:8.2f} ms/step -> {bs/dt:7.0f} examples/s")


if __name__ == "__main__":
    main()
