"""Benchmark: meme-caption generation throughput on the serving path.

Headline metric (BASELINE.md north star): generated captions/sec at
beam=5, len=32. Baseline target is 10,000/s aggregate on v5e-8, i.e.
1,250/s per chip — ``vs_baseline`` reports value / 1250 measured on the
single available chip.

Serving design being measured: per-template ResNet features are encoded
once and cached (300 templates, amortized to ~0), and the decoder runs the
whole beam-search token loop inside one jitted lax.scan over KV caches,
batched over (memes x beams). The reference has no published numbers and
re-runs a full O(L^2) forward per token per meme on GPU
(transformers.py:547-573).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# flagship serving config: word-level CaptioningTransformer
VOCAB = 8192
HID, LAYERS, HEADS, PF = 512, 6, 8, 2048
BEAM = 5
MAX_LEN = 32
BATCH = 896  # memes per call (post flat-dot-kernel sweet spot; 224-2240 swept)
PER_CHIP_TARGET = 10_000 / 8  # BASELINE.json north star / v5e-8 chips


def _finish(out):
    """Forces completion with a host transfer — under the remote (axon)
    platform ``block_until_ready`` returns before the remote execution has
    actually finished, so wall-clock timing must fetch data."""
    return np.asarray(out["chosen"])


def main():
    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=MAX_LEN + 2, compute_dtype="bfloat16",
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key)

    # cached per-template features (the encode cost is amortized across
    # thousands of captions per template and excluded from the hot loop)
    rng = np.random.default_rng(0)
    start_emb = jnp.asarray(rng.normal(size=(BATCH, HID)).astype(np.float32))
    spatial = jnp.asarray(
        rng.normal(size=(BATCH, 49, HID)).astype(np.float32)
    )

    def run(k):
        return model.generate_from_emb(
            params, (start_emb, spatial), key=k, max_len=MAX_LEN,
            beam_size=BEAM, top_k=64, temperature=1.0, sampler="pallas",
        )

    # compile + settle
    _finish(run(jax.random.PRNGKey(1)))

    # throughput
    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = run(jax.random.PRNGKey(2 + i))
    _finish(out)
    dt = time.perf_counter() - t0
    captions_per_sec = BATCH * n_iters / dt

    # per-meme latency (single meme, beam=5), amortized over a jitted
    # loop of 20 independent generations: a per-call measurement would be
    # dominated by the ~25 ms dispatch+fetch overhead of the remote
    # tunnel (see benchmarks/attn_microbench.py), not device time
    se1, sp1 = start_emb[:1], spatial[:1]

    def run1(k):
        return model.generate_from_emb(
            params, (se1, sp1), key=k, max_len=MAX_LEN, beam_size=BEAM,
            top_k=64, temperature=1.0, sampler="pallas",
        )

    @jax.jit
    def lat_loop(k0):
        def body(i, acc):
            out = run1(jax.random.fold_in(k0, i))
            return acc + out["chosen"][0, 0]
        return jax.lax.fori_loop(0, 20, body, jnp.int32(0))

    np.asarray(lat_loop(jax.random.PRNGKey(90)))
    t0 = time.perf_counter()
    np.asarray(lat_loop(jax.random.PRNGKey(91)))
    p50_ms = (time.perf_counter() - t0) / 20 * 1000

    print(
        json.dumps(
            {
                "metric": "captions/sec/chip (beam=5, len=32)",
                "value": round(captions_per_sec, 1),
                "unit": "captions/s",
                "vs_baseline": round(captions_per_sec / PER_CHIP_TARGET, 3),
                "p50_per_meme_ms": round(p50_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
