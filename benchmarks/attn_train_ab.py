"""A/B: head-native vs transposed-layout MHA in the TRAIN fwd+bwd path.

TRAIN_PERF lever (a) isolated: grad of a masked-CE-like loss through
the 6-layer cross-attention decoder stack at the tuned word shapes
(bs=256, bf16, rectangular T=33 x T_enc=49) — no ResNet, no classifier
Adam, so compiles are fast and the ~0.6-2 ms/step attention-relayout
delta is a visible fraction. Device op time comes from a trace, immune
to the tunnel's per-dispatch latency.

Run (each arm is a fresh process — the layout flag is read at import;
the transposed/legacy form is the DEFAULT since the full-step A/B):

    python -m benchmarks.attn_train_ab                   # legacy arm
    DH_MHA_LEGACY=0 python -m benchmarks.attn_train_ab   # head-native arm
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

VOCAB, HID, LAYERS, HEADS, PF = 29184, 512, 6, 8, 2048
BS, T = 256, 32


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/attn_ab"
    os.makedirs(outdir, exist_ok=True)

    from deephumor_tpu.models import transformer as tfm

    arm = "legacy" if tfm._MHA_LEGACY else "native"
    params = tfm.transformer_decoder_init(
        jax.random.PRNGKey(0), num_tokens=VOCAB, hid_dim=HID,
        n_layers=LAYERS, pf_dim=PF, max_len=50)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(6, VOCAB, size=(BS, T)), jnp.int32)
    enc_out = jnp.asarray(
        rng.normal(size=(BS, 49, HID)).astype(np.float32), jnp.bfloat16)
    start = jnp.asarray(
        rng.normal(size=(BS, HID)).astype(np.float32), jnp.bfloat16)

    def loss_fn(p, key):
        logits = tfm.transformer_decoder_forward(
            p, tokens, enc_out, start, HEADS, dropout=0.1, train=True,
            rng=key, rectangular=True)
        # cheap scalar consuming every logit (keeps the bwd honest
        # without the classifier-Adam graph)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    step = jax.jit(jax.grad(loss_fn))
    key = jax.random.PRNGKey(1)
    g = step(params, key)
    jax.block_until_ready(g)

    n = 10
    with jax.profiler.trace(outdir):
        for i in range(n):
            g = step(params, jax.random.fold_in(key, i))
        jax.block_until_ready(g)

    from benchmarks.word_profile import aggregate

    totals, device_total = aggregate(outdir, n)
    copies = sum(v for k, v in totals.items()
                 if k.startswith(("copy", "transpose", "bitcast")))
    print(json.dumps({
        "arm": arm,
        "device_us_per_step": round(device_total / n, 1),
        "copies_us_per_step": round(copies / n, 1),
    }))


if __name__ == "__main__":
    main()
